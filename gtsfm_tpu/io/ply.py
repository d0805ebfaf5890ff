"""PLY point-cloud IO (parity: /root/reference/gtsfm/utils/io.py PLY IO)."""

from __future__ import annotations

import numpy as np


def write_ply(path: str, points: np.ndarray, colors: np.ndarray | None = None) -> None:
    """points (N, 3) f32; colors (N,) gray [0,1] or (N, 3) rgb [0,1]."""
    n = len(points)
    has_color = colors is not None
    with open(path, "wb") as f:
        header = (
            "ply\nformat binary_little_endian 1.0\n"
            f"element vertex {n}\n"
            "property float x\nproperty float y\nproperty float z\n"
        )
        if has_color:
            header += "property uchar red\nproperty uchar green\nproperty uchar blue\n"
        header += "end_header\n"
        f.write(header.encode())
        pts = np.asarray(points, "<f4")
        if has_color:
            c = np.asarray(colors)
            if c.ndim == 1:
                c = np.stack([c] * 3, -1)
            rgb = (np.clip(c, 0, 1) * 255).astype(np.uint8)
            rec = np.zeros(n, dtype=[("xyz", "<f4", 3), ("rgb", "u1", 3)])
            rec["xyz"] = pts
            rec["rgb"] = rgb
            f.write(rec.tobytes())
        else:
            f.write(pts.tobytes())


def read_ply(path: str):
    """-> (points (N, 3), colors (N, 3) float [0,1] or None)."""
    with open(path, "rb") as f:
        n = 0
        props = []
        while True:
            line = f.readline().strip()
            if line.startswith(b"element vertex"):
                n = int(line.split()[-1])
            elif line.startswith(b"property"):
                props.append((line.split()[1].decode(), line.split()[2].decode()))
            elif line == b"end_header":
                break
        has_color = any(p[1] == "red" for p in props)
        if has_color:
            rec = np.frombuffer(f.read(n * 15), dtype=[("xyz", "<f4", 3), ("rgb", "u1", 3)])
            return rec["xyz"].copy(), rec["rgb"].astype(np.float32) / 255.0
        pts = np.frombuffer(f.read(n * 12), dtype="<f4").reshape(n, 3)
        return pts.copy(), None
