import numpy as np

from gtsfm_tpu.common.telemetry import TelemetryDB
from gtsfm_tpu.frontend.reports import TwoViewEstimationReport
from gtsfm_tpu.io import colmap as colmap_io
from gtsfm_tpu.products.scene_tree import SceneTree
from tests.common.test_sfm_data import make_synthetic_scene


def test_scene_tree_roundtrip(tmp_path):
    root = tmp_path / "results"
    a = make_synthetic_scene(n_cams=3, n_tracks=10)
    b = make_synthetic_scene(n_cams=4, n_tracks=12)
    colmap_io.write_scene(a, str(root / "C_1"))
    colmap_io.write_scene(b, str(root / "C_1" / "C_1_1"))
    tree = SceneTree.read(str(root))
    assert tree.num_nodes() == 2
    scenes = tree.all_scenes()
    assert {s.number_images() for s in scenes} == {3, 4}
    counts = tree.map_postorder(lambda n, ch: (1 if n.scene else 0) + sum(ch))
    assert counts == 2


def test_telemetry_roundtrip(tmp_path):
    db = TelemetryDB(path=str(tmp_path / "t.sqlite"), run_id="test_run")
    reports = [
        TwoViewEstimationReport(0, 1, 100, 80, 0.8, True, 0.5, 1.0),
        TwoViewEstimationReport(1, 2, 50, 10, 0.2, False, None, None),
    ]
    db.log_two_view_results(reports)
    db.log_stage("frontend", 1.25)
    db.log_metadata(dataset="door", n_images=12)
    rows = db.query("SELECT i1, i2, valid FROM two_view_results ORDER BY i1")
    assert rows == [(0, 1, 1), (1, 2, 0)]
    assert db.query("SELECT stage, seconds FROM stage_timings")[0][0] == "frontend"
    # picklable (DaskDBModuleBase parity)
    import pickle

    db2 = pickle.loads(pickle.dumps(db))
    assert db2.run_id == "test_run"


def test_track_classification():
    from gtsfm_tpu.utils.tracks import classify_tracks_by_gt
    from tests.bundle.test_triangulation import _scene_track_arrays

    data = make_synthetic_scene(n_cams=5, n_tracks=12)
    cam_idx, uv, mask = _scene_track_arrays(data)
    uv_bad = np.asarray(uv).copy()
    uv_bad[0, 2] += 50.0  # corrupt one observation of track 0
    correct, errs = classify_tracks_by_gt(
        data.poses, data.cal, np.asarray(cam_idx), uv_bad, np.asarray(mask)
    )
    assert not correct[0]
    assert correct[1:].all()
