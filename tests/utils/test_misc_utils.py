import os

import jax
import jax.numpy as jnp
import numpy as np

from gtsfm_tpu.utils.ellipsoid import align_scene_to_axes, get_alignment_transform
from gtsfm_tpu.utils.logger import StageTimer, get_logger
from tests.common.test_sfm_data import make_synthetic_scene


def test_ellipsoid_alignment_centers_and_axes():
    rng = np.random.default_rng(0)
    # elongated cloud along an arbitrary direction
    base = rng.normal(size=(500, 3)) * np.array([5.0, 1.0, 0.3])
    from scipy.spatial.transform import Rotation as SR

    R = SR.random(random_state=1).as_matrix()
    pts = base @ R.T + np.array([10.0, -4.0, 2.0])
    sim = get_alignment_transform(pts)
    out = np.asarray(sim.transform(jnp.asarray(pts, jnp.float32)))
    np.testing.assert_allclose(out.mean(axis=0), 0, atol=0.2)
    var = out.var(axis=0)
    assert var[0] > var[1] > var[2]  # principal axis on x


def test_align_scene_to_axes_preserves_reprojection():
    data = make_synthetic_scene()
    aligned = align_scene_to_axes(data)
    err = np.asarray(aligned.reprojection_errors())
    m = np.asarray(aligned.meas_mask)
    assert np.all(err[m] < 0.05)


def test_stage_timer_and_logger():
    t = StageTimer()
    with t.time("stage_a"):
        sum(range(1000))
    with t.time("stage_a"):
        pass
    metrics = t.as_metrics()
    assert metrics[0].name == "stage_a_sec" and metrics[0].scalar >= 0
    log = get_logger("test")
    log.info("hello")  # no crash, tagged formatter


def test_viewer_and_viz(tmp_path):
    from gtsfm_tpu.visualization.viewer import export_scene_html, scan_results_and_build_index
    from gtsfm_tpu.visualization.viz import plot_scene_3d
    from gtsfm_tpu.io import colmap as colmap_io

    data = make_synthetic_scene()
    html = tmp_path / "scene.html"
    export_scene_html(data, str(html))
    content = html.read_text()
    assert "const points" in content and "cameras" in content

    png = tmp_path / "scene.png"
    plot_scene_3d(data, str(png))
    assert png.stat().st_size > 1000

    # results-scan index
    colmap_io.write_scene(data, str(tmp_path / "results" / "ba_output"))
    scenes = scan_results_and_build_index(str(tmp_path / "results"), str(tmp_path / "index.html"))
    assert len(scenes) == 1
    assert (tmp_path / "index.html").exists()

    # CLI entry point (view_scene.py / Flask app parity)
    from gtsfm_tpu.visualization import viewer as viewer_cli

    assert viewer_cli.main([str(tmp_path / "results" / "ba_output")]) == 0
    assert (tmp_path / "results" / "ba_output" / "viewer.html").exists()
    assert viewer_cli.main(["--scan", str(tmp_path / "results")]) == 0


def test_results_browser_served_over_http(tmp_path):
    """The served results browser (reference: Flask visualization/app.py)
    scans COLMAP scenes + splat artifacts and serves them over HTTP."""
    import threading
    import urllib.request

    from gtsfm_tpu.io import colmap as colmap_io
    from gtsfm_tpu.visualization import viewer

    data = make_synthetic_scene()
    colmap_io.write_scene(data, str(tmp_path / "results" / "ba_output"))
    # a fake fly-through GIF next to the scene gets linked from the index
    (tmp_path / "results" / "splat_flythrough.gif").write_bytes(b"GIF89a")

    import functools
    import http.server

    index = tmp_path / "results" / "index.html"
    viewer.scan_results_and_build_index(str(tmp_path / "results"), str(index))
    handler = functools.partial(
        http.server.SimpleHTTPRequestHandler, directory=str(tmp_path / "results")
    )
    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        page = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/index.html", timeout=10
        ).read().decode()
        assert "ba_output" in page and "fly-through" in page
        scene_href = page.split('href="')[1].split('"')[0]
        scene = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/{scene_href}", timeout=10
        ).read().decode()
        assert "const points" in scene
    finally:
        httpd.shutdown()


def test_synthetic_correspondences_end_to_end():
    """Synthetic front-end drives the MVO back-end (noise-free)."""
    from gtsfm_tpu.frontend.synthetic import SyntheticCorrespondenceGenerator, SyntheticOptions
    from gtsfm_tpu.scene.mvo import MVOOptions, MultiViewOptimizer
    from gtsfm_tpu.geometry import so3
    from gtsfm_tpu.geometry.sim3 import align_poses_sim3

    scene = make_synthetic_scene(n_cams=6, n_tracks=10)
    pairs = np.array([(i, j) for i in range(6) for j in range(i + 1, 6)], np.int32)
    gen = SyntheticCorrespondenceGenerator(SyntheticOptions(num_points=200, seed=1))
    out = gen.generate(
        scene.poses, scene.cal, pairs, [(640, 480)] * 6,
        surface_points=np.random.default_rng(2).uniform(-1, 1, (200, 3)).astype(np.float32),
    )
    assert out["valid"].all()
    mvo = MultiViewOptimizer(MVOOptions())
    data, metrics = mvo.run(
        num_images=6, pairs=pairs,
        i2Ri1=out["i2Ri1"], i2Ui1=out["i2Ui1"], pair_valid=out["valid"],
        num_inliers=out["num_inliers"], corr_i1=out["corr_i1"],
        corr_i2=out["corr_i2"], corr_mask=out["corr_mask"],
        keypoints_xy=out["keypoints_xy"], cal=scene.cal,
    )
    assert not metrics.get("failed"), metrics
    est_mask = np.asarray(data.pose_mask)
    sim = align_poses_sim3(data.poses, scene.poses, mask=jnp.asarray(est_mask))
    aligned = sim.transform_pose(data.poses)
    r_err = np.asarray(so3.relative_angle_deg(aligned.R, scene.poses.R))[est_mask]
    assert r_err.max() < 0.5, r_err


def test_geometry_comparisons():
    from gtsfm_tpu.utils.geometry_comparisons import (
        compare_global_poses,
        compare_rotations,
        compute_relative_rotation_angle,
        compute_relative_unit_translation_angle,
    )
    from gtsfm_tpu.geometry import SE3, so3
    from gtsfm_tpu.geometry.sim3 import Sim3

    R1 = np.asarray(so3.expmap(jnp.asarray([0.1, 0, 0])))
    R2 = np.asarray(so3.expmap(jnp.asarray([0.2, 0, 0])))
    assert abs(compute_relative_rotation_angle(R1, R2) - np.degrees(0.1)) < 1e-3
    assert compute_relative_unit_translation_angle(np.array([1, 0, 0.0]), np.array([-1, 0, 0.0])) < 1e-6

    data = make_synthetic_scene(n_cams=5)
    S = Sim3(R=np.asarray(so3.expmap(jnp.asarray([0, 0.3, 0]))), t=jnp.asarray([1.0, 0, 0]), s=jnp.asarray(2.0))
    moved = S.transform_pose(data.poses)
    assert compare_global_poses(moved, data.poses)
    assert compare_rotations(np.asarray(moved.R), np.asarray(data.poses.R))


def test_frustum_overlap():
    from gtsfm_tpu.utils.overlap_frustums import frustum_overlap_fraction
    from gtsfm_tpu.geometry import SE3, Cal3_S2

    cal = Cal3_S2.create(100.0, 100.0, 0.0, 64.0, 48.0)
    a = SE3.identity()
    # identical cameras -> full overlap
    assert frustum_overlap_fraction(a, cal, a, cal, 128, 96) > 0.95
    # opposite-facing camera -> ~no overlap
    import jax.numpy as jnp2
    from gtsfm_tpu.geometry import so3 as so3m

    b = SE3(R=np.asarray(so3m.expmap(jnp2.asarray([0.0, np.pi, 0.0]))), t=jnp2.zeros(3))
    assert frustum_overlap_fraction(a, cal, b, cal, 128, 96) < 0.05
