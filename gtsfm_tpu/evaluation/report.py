"""Self-contained HTML metrics report.

Parity: /root/reference/gtsfm/evaluation/metrics_report.py:400 (plotly
histograms/box plots, cross-run comparison tables). Plotly is not in this
image, so distributions render as matplotlib histograms embedded as base64
PNG — same single-file deliverable.
"""

from __future__ import annotations

import base64
import html
import io
from typing import Optional, Sequence

import numpy as np

from gtsfm_tpu.evaluation.metrics import MetricsGroup

_CSS = """
body { font-family: -apple-system, Segoe UI, sans-serif; margin: 2em; }
h2 { border-bottom: 2px solid #444; padding-bottom: 4px; }
table { border-collapse: collapse; margin: 0.6em 0 1.4em; }
td, th { border: 1px solid #bbb; padding: 4px 10px; text-align: right; }
th { background: #f0f0f0; }
.metric-name { text-align: left; font-weight: 600; }
img.hist { border: 1px solid #ddd; margin: 4px; }
.better { background: #d8f5d8; } .worse { background: #f5d8d8; }
"""


def _hist_png(data: np.ndarray, title: str) -> str:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(3.6, 2.4), dpi=80)
    d = data[np.isfinite(data)]
    if d.size:
        ax.hist(d, bins=min(40, max(8, int(np.sqrt(d.size)))), color="#4878b0")
    ax.set_title(title, fontsize=8)
    ax.tick_params(labelsize=7)
    fig.tight_layout()
    buf = io.BytesIO()
    fig.savefig(buf, format="png")
    plt.close(fig)
    return base64.b64encode(buf.getvalue()).decode()


def generate_html_report(
    groups: Sequence[MetricsGroup],
    output_path: str,
    compare_groups: Optional[Sequence[MetricsGroup]] = None,
    compare_label: str = "baseline",
) -> None:
    """Write a single-file HTML report; optionally diff against a second
    run's metric groups (red/green cells like the CI dashboard,
    visualize_benchmark_comparison.py)."""
    cmp_lookup = {}
    if compare_groups:
        for g in compare_groups:
            cmp_lookup[g.name] = g.to_dict()[g.name]

    parts = [f"<html><head><style>{_CSS}</style></head><body>"]
    parts.append("<h1>gtsfm_tpu metrics report</h1>")
    for g in groups:
        parts.append(f"<h2>{html.escape(g.name)}</h2>")
        d = g.to_dict()[g.name]
        rows, hists = [], []
        for name, v in d.items():
            if isinstance(v, dict) and "full_data" in v:
                s = v["summary"]
                if isinstance(s, dict) and "median" in s:
                    rows.append(
                        f"<tr><td class=metric-name>{html.escape(name)}</td>"
                        f"<td>{s['count']}</td><td>{s['min']:.4g}</td>"
                        f"<td>{s['median']:.4g}</td><td>{s['mean']:.4g}</td>"
                        f"<td>{s['max']:.4g}</td></tr>"
                    )
                    hists.append(
                        f'<img class=hist src="data:image/png;base64,'
                        f'{_hist_png(np.asarray(v["full_data"], np.float64), name)}">'
                    )
            else:
                cmp_html = ""
                if g.name in cmp_lookup and name in cmp_lookup[g.name]:
                    other = cmp_lookup[g.name][name]
                    if isinstance(other, (int, float)) and isinstance(v, (int, float)):
                        better = v >= other
                        cls = "better" if better else "worse"
                        cmp_html = f'<td class={cls}>{other:.4g} ({compare_label})</td>'
                val = f"{v:.5g}" if isinstance(v, (int, float)) else html.escape(str(v))
                rows.append(
                    f"<tr><td class=metric-name>{html.escape(name)}</td>"
                    f"<td colspan=4>{val}</td>{cmp_html}</tr>"
                )
        if rows:
            parts.append(
                "<table><tr><th>metric</th><th>count</th><th>min</th>"
                "<th>median</th><th>mean</th><th>max</th></tr>"
                + "".join(rows) + "</table>"
            )
        parts.extend(hists)
    parts.append("</body></html>")
    with open(output_path, "w") as f:
        f.write("".join(parts))
