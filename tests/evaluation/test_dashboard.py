"""Benchmark-comparison dashboard (visualize_benchmark_comparison parity)."""

import json
import os

from gtsfm_tpu.evaluation.dashboard import (
    _cell_color,
    _lower_is_better,
    generate_comparison_html,
    load_run_metrics,
    save_comparison_dashboard,
)
from gtsfm_tpu.evaluation.metrics import Metric, MetricsGroup


def _write_run(root, rot_median, n_tracks, runtime):
    mdir = os.path.join(root, "results", "metrics")
    g = MetricsGroup("ba_pose_metrics")
    g.add(Metric("rotation_error_deg", [rot_median - 0.1, rot_median, rot_median + 0.1]))
    g.add(Metric("num_tracks", n_tracks))
    g.save_json(mdir)
    g2 = MetricsGroup("runtimes")
    g2.add(Metric("total_runtime_sec", runtime))
    g2.save_json(mdir)
    return root


def test_load_run_metrics(tmp_path):
    run = _write_run(str(tmp_path / "a"), 1.0, 500, 60.0)
    m = load_run_metrics(run)
    assert m["ba_pose_metrics"]["rotation_error_deg.median"] == 1.0
    assert m["ba_pose_metrics"]["num_tracks"] == 500
    assert m["runtimes"]["total_runtime_sec"] == 60.0


def test_direction_aware_coloring():
    assert _lower_is_better("rotation_error_deg.median")
    assert _lower_is_better("total_runtime_sec")
    assert not _lower_is_better("num_tracks")
    # error decreased 10% -> green-ish (g channel dominant)
    c = _cell_color(-10.0, lower_better=True)
    r, g, b = [int(x) for x in c[4:-1].split(",")]
    assert g > r
    # error increased 10% -> red-ish
    c = _cell_color(10.0, lower_better=True)
    r, g, b = [int(x) for x in c[4:-1].split(",")]
    assert r > g


def test_dashboard_end_to_end(tmp_path):
    master = _write_run(str(tmp_path / "master"), 1.0, 500, 60.0)
    branch = _write_run(str(tmp_path / "branch"), 0.8, 550, 50.0)
    html = generate_comparison_html({"door": master}, {"door": branch})
    assert "ba_pose_metrics" in html and "runtimes" in html
    assert "door" in html
    assert "-20.0%" in html  # rotation error median 1.0 -> 0.8
    assert "+10.0%" in html  # num_tracks 500 -> 550

    out = str(tmp_path / "dash.html")
    save_comparison_dashboard({"door": master}, {"door": branch}, out)
    assert os.path.getsize(out) > 500


def test_dashboard_cli(tmp_path, capsys):
    from gtsfm_tpu.evaluation.dashboard import main

    master = _write_run(str(tmp_path / "m"), 1.0, 500, 60.0)
    branch = _write_run(str(tmp_path / "b"), 1.2, 400, 90.0)
    out = str(tmp_path / "cli.html")
    main(["--master", f"door={master}", "--branch", f"door={branch}", "--output", out])
    assert os.path.exists(out)


def test_intrinsics_error_metrics():
    import jax.numpy as jnp
    import numpy as np

    from gtsfm_tpu.evaluation.metrics import intrinsics_error_metrics
    from gtsfm_tpu.geometry import Cal3Bundler

    gt = Cal3Bundler.create(jnp.array([500.0, 600.0]), jnp.array([0.01, 0.0]),
                            jnp.array([0.001, 0.0]), jnp.zeros(2), jnp.zeros(2))
    est = Cal3Bundler.create(jnp.array([505.0, 594.0]), jnp.array([0.02, 0.0]),
                             jnp.array([0.001, 0.0]), jnp.zeros(2), jnp.zeros(2))
    g = intrinsics_error_metrics(est, gt)
    d = g.to_dict()["intrinsics_metrics"]
    assert d["focal_length_error_px"]["summary"]["max"] == 6.0
    assert abs(d["focal_length_error_pct"]["summary"]["max"] - 1.0) < 1e-6
    assert abs(d["k1_error"]["summary"]["max"] - 0.01) < 1e-9


def test_precision_recall_from_errors():
    from gtsfm_tpu.evaluation.metrics import precision_recall_from_errors

    # accepted: 3 correct (err<=5), 1 wrong; rejected: 1 would-be-correct
    p, r = precision_recall_from_errors([1, 2, 3, 10], [4, 20], 5.0)
    assert abs(p - 3 / 4) < 1e-9
    assert abs(r - 3 / 4) < 1e-9


def test_compare_by_cluster(tmp_path):
    """Per-cluster COLMAP comparison discovers and aligns each cluster
    export independently (compare_colmap_outputs_by_cluster parity)."""
    import jax.numpy as jnp
    import numpy as np

    from gtsfm_tpu.evaluation.compare import compare_colmap_dirs_by_cluster
    from gtsfm_tpu.io import colmap as colmap_io
    from tests.common.test_sfm_data import make_synthetic_scene

    scene = make_synthetic_scene(n_cams=5, n_tracks=40)
    ref_dir = str(tmp_path / "ref")
    colmap_io.write_scene(scene, ref_dir)
    for c in ("cluster_0", "cluster_1"):
        colmap_io.write_scene(scene, str(tmp_path / "est" / c / "ba_output"))
    groups = compare_colmap_dirs_by_cluster(str(tmp_path / "est"), ref_dir)
    assert len(groups) == 2
    for g in groups:
        d = g.to_dict()[g.name]
        assert d["num_matched_cameras"] == 5
        assert d["rotation_error_deg"]["summary"]["max"] < 1e-3
