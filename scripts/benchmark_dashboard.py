#!/usr/bin/env python
"""CLI wrapper for the benchmark-comparison dashboard — the reference's
visualize_benchmark_comparison.py script role (red/green %-change table of
master-vs-branch metric groups; /root/reference/gtsfm/evaluation/
visualize_benchmark_comparison.py:391).

Usage:
    python scripts/benchmark_dashboard.py \
        --master door=/runs/master/door/metrics skydio=/runs/master/skydio/metrics \
        --branch door=/runs/branch/door/metrics skydio=/runs/branch/skydio/metrics \
        --output dashboard.html
"""

from gtsfm_tpu.evaluation.dashboard import main

if __name__ == "__main__":
    main()
