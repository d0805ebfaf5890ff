"""BAL problem IO + the runner's BA-only tool mode (GtsfmData.read_bal
parity, /root/reference/gtsfm/common/gtsfm_data.py:190)."""

import numpy as np


def _write_bal(path, rng, n_cam=4, n_pts=60, noise=0.5):
    """Synthesize a consistent BAL problem (cameras look down -z per the
    BAL convention: p = -P/P.z)."""
    import jax.numpy as jnp

    from gtsfm_tpu.geometry import so3

    pts = rng.uniform(-1, 1, (n_pts, 3)).astype(np.float64)
    pts[:, 2] -= 6.0  # in front of -z-looking cameras at origin-ish
    lines = []
    obs = []
    cams = []
    for i in range(n_cam):
        w = rng.normal(0, 0.05, 3)
        t = np.array([0.3 * i, 0.0, 0.5 * rng.normal()])
        f, k1, k2 = 800.0 + 10 * i, -1e-7, 1e-13
        R = np.asarray(so3.expmap(jnp.asarray(w, jnp.float32)))
        cams.append((w, t, f, k1, k2))
        for j in range(n_pts):
            P = R @ pts[j] + t
            if P[2] >= -0.1:
                continue
            p = -P[:2] / P[2]
            r2 = p @ p
            dist = 1.0 + k1 * r2 + k2 * r2 * r2
            uv = f * dist * p + rng.normal(0, noise, 2)
            obs.append((i, j, uv[0], uv[1]))
    lines.append(f"{n_cam} {n_pts} {len(obs)}")
    for i, j, u, v in obs:
        lines.append(f"{i} {j} {u:.10g} {v:.10g}")
    for w, t, f, k1, k2 in cams:
        for val in (*w, *t, f, k1, k2):
            lines.append(f"{val:.12g}")
    for j in range(n_pts):
        for val in pts[j]:
            lines.append(f"{val:.12g}")
    with open(path, "w") as fh:
        fh.write("\n".join(lines))
    return len(obs)


def test_read_bal_reprojection_consistency(tmp_path):
    """The +z-convention conversion must preserve reprojection errors: a
    noise-free BAL problem reprojects to ~0 px through our camera model."""
    import jax

    from gtsfm_tpu.geometry import PinholeCamera
    from gtsfm_tpu.io.bal import read_bal

    rng = np.random.default_rng(0)
    path = str(tmp_path / "problem.txt")
    n_obs = _write_bal(path, rng, noise=0.0)
    data = read_bal(path)
    assert data.number_images() == 4
    assert data.number_measurements() == n_obs

    import jax.numpy as jnp

    mc = np.asarray(data.meas_cam)
    mt = np.asarray(data.meas_track)
    cam = PinholeCamera(
        pose=jax.tree.map(lambda a: a[jnp.asarray(mc)], data.poses),
        cal=jax.tree.map(lambda a: a[jnp.asarray(mc)], data.cal),
    )
    uv, depth = cam.project(data.points[jnp.asarray(mt)])
    err = np.linalg.norm(np.asarray(uv) - np.asarray(data.meas_uv), axis=-1)
    assert float(np.asarray(depth).min()) > 0
    assert err.max() < 1e-2, err.max()


def test_runner_bal_mode(tmp_path, capsys):
    from gtsfm_tpu.runner import main

    rng = np.random.default_rng(1)
    path = str(tmp_path / "problem.txt")
    _write_bal(path, rng, noise=1.0)
    rc = main(["--bal", path, "--output_root", str(tmp_path / "out")])
    assert rc == 0
    out = capsys.readouterr().out
    assert "BAL problem: 4 cameras" in out
    assert "BA: cost" in out
    import os

    assert os.path.exists(tmp_path / "out" / "bal_output" / "cameras.txt")
