import os

import numpy as np

from gtsfm_tpu.evaluation.compare import compare_reconstructions
from gtsfm_tpu.evaluation.metrics import Metric, MetricsGroup
from gtsfm_tpu.evaluation.report import generate_html_report
from gtsfm_tpu.retriever.bridge import find_bridge_pairs
from gtsfm_tpu.ui.registry import ProcessGraphGenerator, RegistryMeta


def test_registry_collects_processes():
    names = set(RegistryMeta.REGISTRY)
    assert {"RetrieverProcess", "TwoViewEstimatorProcess", "BundleAdjustmentProcess",
            "RotationAveragingProcess", "MVSProcess", "SplatProcess"} <= names


def test_process_graph_dot(tmp_path):
    gen = ProcessGraphGenerator()
    dot = gen.to_dot()
    assert dot.startswith("digraph")
    assert '"BundleAdjustment"' in dot and '"Global Rotations"' in dot
    p = tmp_path / "graph.dot"
    gen.save_graph(str(p))
    assert p.exists()


def test_html_report(tmp_path):
    g = MetricsGroup("demo", [Metric("scalar_x", 3.5), Metric("dist_y", np.random.default_rng(0).normal(size=50))])
    base = MetricsGroup("demo", [Metric("scalar_x", 2.0)])
    out = tmp_path / "report.html"
    generate_html_report([g], str(out), compare_groups=[base])
    content = out.read_text()
    assert "scalar_x" in content and "dist_y" in content
    assert "data:image/png;base64" in content
    assert "baseline" in content


def test_compare_reconstructions():
    from gtsfm_tpu.geometry.sim3 import Sim3
    from gtsfm_tpu.geometry import so3
    import jax, jax.numpy as jnp
    from tests.common.test_sfm_data import make_synthetic_scene

    ref = make_synthetic_scene(n_cams=6, n_tracks=30)
    S = Sim3(R=so3.random(jax.random.PRNGKey(1)), t=jnp.asarray([1.0, 0, 0]), s=jnp.asarray(2.0))
    est = ref.transform(S)
    g = compare_reconstructions(est, ref)
    d = g.to_dict()["reconstruction_comparison"]
    assert d["num_matched_cameras"] == 6
    assert d["rotation_error_deg"]["summary"]["max"] < 0.1
    assert d["translation_error"]["summary"]["max"] < 0.01


def test_bridge_reconnection():
    # two components {0,1,2} and {3,4}; similarity says (2,3) is the bridge
    pairs = np.array([[0, 1], [1, 2], [3, 4]], np.int32)
    sim = np.zeros((5, 5), np.float32)
    sim[2, 3] = sim[3, 2] = 0.9
    sim[0, 4] = sim[4, 0] = 0.5
    bridges = find_bridge_pairs(5, pairs, sim, max_bridges_per_component_pair=1)
    assert bridges.tolist() == [[2, 3]]


def test_bridge_no_op_when_connected():
    pairs = np.array([[0, 1], [1, 2]], np.int32)
    sim = np.ones((3, 3), np.float32)
    assert len(find_bridge_pairs(3, pairs, sim)) == 0
