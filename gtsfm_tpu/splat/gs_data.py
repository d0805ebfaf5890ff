"""3D Gaussian splat containers + IO.

Parity: /root/reference/gtsfm/splat/gs_data.py (splat containers, 248 LoC)
and the PLY export in splat/rendering.py.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class GSData:
    """Padded gaussian set (G slots, alive mask).

    means:      f32[G, 3]
    log_scales: f32[G, 3]   (exp -> per-axis std dev)
    quats:      f32[G, 4]   (w, x, y, z; normalized on use)
    opacity_logit: f32[G]   (sigmoid -> alpha)
    colors:     f32[G, 3]   (RGB in [0, 1] via sigmoid at render)
    alive:      bool[G]
    """

    means: jnp.ndarray
    log_scales: jnp.ndarray
    quats: jnp.ndarray
    opacity_logit: jnp.ndarray
    colors: jnp.ndarray
    alive: jnp.ndarray

    @property
    def max_gaussians(self) -> int:
        return self.means.shape[0]

    def num_alive(self) -> int:
        return int(jnp.sum(self.alive))

    @classmethod
    def from_points(
        cls,
        points: np.ndarray,
        colors: np.ndarray | None = None,
        max_gaussians: int | None = None,
        init_opacity: float = 0.5,
    ) -> "GSData":
        """Init from a sparse SfM point cloud (splatfacto-style): scale from
        mean nearest-neighbor distance, isotropic, given colors."""
        n = len(points)
        G = max_gaussians or max(n, 1)
        assert G >= n
        pts = np.zeros((G, 3), np.float32)
        pts[:n] = points
        if n > 1:
            sub = points[np.random.default_rng(0).permutation(n)[: min(n, 2000)]]
            d2 = ((sub[:, None] - sub[None, :]) ** 2).sum(-1)
            np.fill_diagonal(d2, np.inf)
            nn = np.sqrt(np.min(d2, axis=1))
            scale = float(np.clip(np.median(nn), 1e-4, 1e3))
        else:
            scale = 0.1
        log_scales = np.full((G, 3), np.log(scale), np.float32)
        quats = np.zeros((G, 4), np.float32)
        quats[:, 0] = 1.0
        op = np.full(G, np.log(init_opacity / (1 - init_opacity)), np.float32)
        cols = np.full((G, 3), 0.0, np.float32)
        if colors is not None:
            c = np.asarray(colors, np.float32)
            if c.ndim == 1:
                c = np.stack([c] * 3, -1)
            c = np.clip(c, 1e-3, 1 - 1e-3)
            cols[:n] = np.log(c / (1 - c))  # logit-space
        alive = np.zeros(G, bool)
        alive[:n] = True
        return cls(
            means=jnp.asarray(pts),
            log_scales=jnp.asarray(log_scales),
            quats=jnp.asarray(quats),
            opacity_logit=jnp.asarray(op),
            colors=jnp.asarray(cols),
            alive=jnp.asarray(alive),
        )


def export_ply(gs: GSData, path: str) -> None:
    """Write splats as a 3DGS-convention PLY (x y z + f_dc + opacity +
    scale + rot), compatible with common splat viewers."""
    alive = np.asarray(gs.alive)
    means = np.asarray(gs.means)[alive]
    scales = np.asarray(gs.log_scales)[alive]
    quats = np.asarray(gs.quats)[alive]
    ops = np.asarray(gs.opacity_logit)[alive]
    cols = np.asarray(gs.colors)[alive]
    n = len(means)
    props = (
        ["x", "y", "z"]
        + [f"f_dc_{i}" for i in range(3)]
        + ["opacity"]
        + [f"scale_{i}" for i in range(3)]
        + [f"rot_{i}" for i in range(4)]
    )
    with open(path, "wb") as f:
        header = (
            "ply\nformat binary_little_endian 1.0\n"
            f"element vertex {n}\n"
            + "".join(f"property float {p}\n" for p in props)
            + "end_header\n"
        )
        f.write(header.encode())
        # SH DC from sigmoid color: c = 0.5 + C0 * f_dc  =>  f_dc = (c-0.5)/C0
        C0 = 0.28209479177387814
        rgb = 1.0 / (1.0 + np.exp(-cols))
        f_dc = (rgb - 0.5) / C0
        data = np.concatenate(
            [means, f_dc, ops[:, None], scales, quats], axis=1
        ).astype("<f4")
        f.write(data.tobytes())


def load_ply(path: str) -> GSData:
    """Read back a PLY written by export_ply."""
    with open(path, "rb") as f:
        line = b""
        n = 0
        props = []
        while True:
            line = f.readline()
            if line.startswith(b"element vertex"):
                n = int(line.split()[-1])
            elif line.startswith(b"property"):
                props.append(line.split()[-1].decode())
            elif line.startswith(b"end_header"):
                break
        data = np.frombuffer(f.read(n * len(props) * 4), dtype="<f4").reshape(n, len(props))
    C0 = 0.28209479177387814
    rgb = np.clip(0.5 + C0 * data[:, 3:6], 1e-3, 1 - 1e-3)
    return GSData(
        means=jnp.asarray(data[:, 0:3]),
        log_scales=jnp.asarray(data[:, 7:10]),
        quats=jnp.asarray(data[:, 10:14]),
        opacity_logit=jnp.asarray(data[:, 6]),
        colors=jnp.asarray(np.log(rgb / (1 - rgb))),
        alive=jnp.ones(n, bool),
    )
