"""Feed-forward reconstruction model (VGGT-class) in Flax.

Parity: /root/reference/gtsfm/frontend/vggt.py (1,304 LoC: run_VGGT
predicts cameras + depth from an image batch, conversion to GtsfmData,
optional BA) and cluster_optimizer/cluster_vggt.py.

Architecture (compact VGGT shape): patch-embedded frames -> L blocks of
alternating FRAME attention (tokens within one image) and GLOBAL attention
(all tokens across the batch) -> a camera token per frame decoded to an
SE3 pose + focal, and a DPT-lite head decoding per-patch depth. All
attention is batched MXU matmuls. The module runs with random init for
pipeline-shape tests; trained checkpoints load via `params=`. The
classical DoGSift->RANSAC->MVO path remains the weight-free production
route (the reference similarly treats VGGT as an alternative cluster
optimizer).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class FeedforwardOptions(NamedTuple):
    patch_size: int = 16
    dim: int = 256
    depth: int = 6  # pairs of (frame, global) attention
    num_heads: int = 4
    # FastVGGT-class acceleration (parity: cluster_fast_vggt.py): merge
    # global-attention keys/values by mean-pooling groups of this many
    # tokens, turning the O((BT)^2) global step into O(BT * BT/s). 1 = the
    # full VGGT-class global attention.
    global_kv_stride: int = 1
    # tracking-head feature width (vggt.py tracking head parity)
    track_dim: int = 64


class _MHA(nn.Module):
    dim: int
    heads: int

    @nn.compact
    def __call__(self, x):  # (..., T, D) attention over axis -2
        h, d = self.heads, self.dim
        dh = d // h
        qkv = nn.Dense(3 * d, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split_heads(a):
            return a.reshape(a.shape[:-1] + (h, dh))

        q, k, v = map(split_heads, (q, k, v))
        att = jnp.einsum("...qhd,...khd->...hqk", q, k) / jnp.sqrt(dh)
        att = jax.nn.softmax(att, axis=-1)
        out = jnp.einsum("...hqk,...khd->...qhd", att, v)
        out = out.reshape(out.shape[:-2] + (d,))
        return nn.Dense(d, name="proj")(out)


class _Block(nn.Module):
    dim: int
    heads: int

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm()(x)
        x = x + _MHA(self.dim, self.heads, name="attn")(y)
        y = nn.LayerNorm()(x)
        x = x + nn.Sequential([nn.Dense(4 * self.dim), nn.gelu, nn.Dense(self.dim)])(y)
        return x


class _CrossMHA(nn.Module):
    """Queries from x, keys/values from a (pooled) context y."""

    dim: int
    heads: int

    @nn.compact
    def __call__(self, x, y):
        h, d = self.heads, self.dim
        dh = d // h
        q = nn.Dense(d, name="q")(x)
        kv = nn.Dense(2 * d, name="kv")(y)
        k, v = jnp.split(kv, 2, axis=-1)

        def split_heads(a):
            return a.reshape(a.shape[:-1] + (h, dh))

        q, k, v = map(split_heads, (q, k, v))
        att = jnp.einsum("...qhd,...khd->...hqk", q, k) / jnp.sqrt(dh)
        att = jax.nn.softmax(att, axis=-1)
        out = jnp.einsum("...hqk,...khd->...qhd", att, v)
        return nn.Dense(d, name="proj")(out.reshape(out.shape[:-2] + (d,)))


class _FastGlobalBlock(nn.Module):
    """Token-merged global attention (FastVGGT-style): all tokens attend to
    a stride-pooled summary of all tokens, cutting the quadratic cost."""

    dim: int
    heads: int
    stride: int

    @nn.compact
    def __call__(self, x):  # (1, N, D)
        N = x.shape[-2]
        s = self.stride
        pad = (-N) % s
        xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        pooled = xp.reshape(x.shape[0], (N + pad) // s, s, self.dim).mean(axis=-2)
        y = nn.LayerNorm()(x)
        yc = nn.LayerNorm()(pooled)
        x = x + _CrossMHA(self.dim, self.heads, name="attn")(y, yc)
        y = nn.LayerNorm()(x)
        x = x + nn.Sequential([nn.Dense(4 * self.dim), nn.gelu, nn.Dense(self.dim)])(y)
        return x


class FeedforwardNet(nn.Module):
    opts: FeedforwardOptions

    @nn.compact
    def __call__(self, images):  # (B, H, W) grayscale in [0,1]
        o = self.opts
        B, H, W = images.shape
        P = o.patch_size
        hp, wp = H // P, W // P
        x = images[..., None]
        # patch embed
        tokens = nn.Conv(o.dim, (P, P), strides=(P, P), name="patch_embed")(x)
        tokens = tokens.reshape(B, hp * wp, o.dim)
        pos = self.param("pos_embed", nn.initializers.normal(0.02), (1, hp * wp, o.dim))
        tokens = tokens + pos
        cam_tok = self.param("camera_token", nn.initializers.normal(0.02), (1, 1, o.dim))
        frame_idx = self.param("frame_embed", nn.initializers.normal(0.02), (32, o.dim))
        tokens = jnp.concatenate([jnp.tile(cam_tok, (B, 1, 1)), tokens], axis=1)
        tokens = tokens + frame_idx[:B][:, None, :]

        T = tokens.shape[1]
        for i in range(o.depth):
            # frame attention: within each image independently
            tokens = _Block(o.dim, o.num_heads, name=f"frame_{i}")(tokens)
            # global attention: flatten all frames' tokens together
            flat = tokens.reshape(1, B * T, o.dim)
            if o.global_kv_stride > 1:
                flat = _FastGlobalBlock(
                    o.dim, o.num_heads, o.global_kv_stride, name=f"global_{i}"
                )(flat)
            else:
                flat = _Block(o.dim, o.num_heads, name=f"global_{i}")(flat)
            tokens = flat.reshape(B, T, o.dim)

        cam_feat = tokens[:, 0]  # (B, D)
        # pose head: 3 rotation tangent + 3 translation + focal ratio
        pose_out = nn.Dense(7, name="pose_head")(cam_feat)
        patch_feat = tokens[:, 1:]
        # DPT-lite depth head: per-patch log-depth (+ upsample outside)
        depth_out = nn.Dense(P * P, name="depth_head")(patch_feat)  # (B, hp*wp, P*P)
        depth = depth_out.reshape(B, hp, wp, P, P).transpose(0, 1, 3, 2, 4).reshape(B, H, W)
        conf = nn.Dense(1, name="conf_head")(patch_feat)[..., 0].reshape(B, hp, wp)
        # tracking head: per-patch unit features for cross-frame correlation
        # (the role of the reference's vggt tracking head, vggt.py:1009)
        tfeat = nn.Dense(o.track_dim, name="track_head")(patch_feat)
        tfeat = tfeat / jnp.maximum(jnp.linalg.norm(tfeat, axis=-1, keepdims=True), 1e-12)
        track_feat = tfeat.reshape(B, hp, wp, o.track_dim)
        return pose_out, jnp.exp(depth), jax.nn.sigmoid(conf), track_feat


class FeedforwardReconstruction:
    """run(images, cal) -> (poses SE3 [B], depth (B, H, W), conf) — the
    run_VGGT-equivalent inference entry."""

    def __init__(self, options: FeedforwardOptions = FeedforwardOptions(), params=None,
                 example_hw=(64, 64)):
        from gtsfm_tpu.geometry import SE3, so3

        self.options = options
        self.net = FeedforwardNet(options)
        if params is None:
            params = self.net.init(
                jax.random.PRNGKey(0), jnp.zeros((2,) + tuple(example_hw))
            )["params"]
        self.params = params
        self._fwd = jax.jit(lambda p, x: self.net.apply({"params": p}, x))

    def run(self, images: jnp.ndarray):
        from gtsfm_tpu.geometry import SE3, so3

        pose_out, depth, conf, track_feat = self._fwd(self.params, images)
        R = so3.expmap(pose_out[:, :3])
        t = pose_out[:, 3:6]
        poses = SE3(R=R, t=t)
        focal_ratio = jax.nn.softplus(pose_out[:, 6]) + 0.5
        self.last_track_feat = track_feat
        return poses, depth, conf, focal_ratio


def feedforward_to_sfm_data(
    poses, depth: np.ndarray, conf: np.ndarray, cal, conf_threshold: float = 0.5,
    stride: int = 8, max_tracks: int = 2000,
):
    """Convert feed-forward predictions to SfmData (parity:
    _convert_vggt_outputs_to_gtsfm_data, vggt.py:591): unproject confident
    depths to 3D 'tracks' of length 1 anchored in their source view.
    Downstream BA/merging treats them like any other scene."""
    import jax

    from gtsfm_tpu.common.sfm_data import SfmData
    from gtsfm_tpu.geometry import PinholeCamera

    B, H, W = depth.shape
    tracks = []
    for b in range(B):
        cam = PinholeCamera(
            pose=jax.tree.map(lambda a: a[b], poses),
            cal=jax.tree.map(lambda a: a[b], cal),
        )
        cgrid = conf[b]
        hp, wp = cgrid.shape
        for yy in range(0, H, stride):
            for xx in range(0, W, stride):
                if cgrid[min(yy * hp // H, hp - 1), min(xx * wp // W, wp - 1)] < conf_threshold:
                    continue
                uv = np.array([xx, yy], np.float32)
                X = np.asarray(cam.backproject(jnp.asarray(uv), jnp.asarray(depth[b, yy, xx])))
                tracks.append((X, [(b, uv), (b, uv)]))  # len-2 self-track
                if len(tracks) >= max_tracks:
                    break
            if len(tracks) >= max_tracks:
                break
        if len(tracks) >= max_tracks:
            break
    return SfmData.from_cameras_and_tracks(poses, cal, tracks, num_cameras=B)


# ---------------------------------------------------------------------------
# VGGT tracking head, frame ranking, BA-coverage track selection
# (parity: /root/reference/gtsfm/frontend/vggt.py — run_vggt_tracking :1177 /
# _run_vggt_head_tracking :1009, DINO frame ranking :934, BA-coverage track
# selection :387)
# ---------------------------------------------------------------------------


def rank_frames(track_feat: jnp.ndarray) -> jnp.ndarray:
    """Score each frame by its mean feature similarity to all other frames
    (the role of the reference's DINO-based frame ranking, vggt.py:934):
    the most 'central' frame is the best tracking query source.

    track_feat: (B, hp, wp, D) unit features -> scores (B,)."""
    B = track_feat.shape[0]
    mean_tok = jnp.mean(track_feat.reshape(B, -1, track_feat.shape[-1]), axis=1)
    mean_tok = mean_tok / jnp.maximum(
        jnp.linalg.norm(mean_tok, axis=-1, keepdims=True), 1e-12
    )
    sim = mean_tok @ mean_tok.T  # (B, B)
    return (jnp.sum(sim, axis=1) - 1.0) / jnp.maximum(B - 1, 1)


@jax.jit
def track_queries(track_feat: jnp.ndarray, query_feat: jnp.ndarray):
    """Correlation tracking of query features across all frames (the
    tracking-head role of _run_vggt_head_tracking, vggt.py:1009): per frame,
    the peak of the correlation map localizes each query, a 3x3 soft-argmax
    refines it to sub-patch precision, and the peak value is visibility.

    track_feat: (B, hp, wp, D) unit features; query_feat: (Q, D).
    Returns (xy (B, Q, 2) in PATCH coords, vis (B, Q) peak correlation)."""
    B, hp, wp, D = track_feat.shape
    corr = jnp.einsum("qd,bhwd->bqhw", query_feat, track_feat)  # (B, Q, hp, wp)
    flat = corr.reshape(B, -1, hp * wp)
    idx = jnp.argmax(flat, axis=-1)  # (B, Q)
    vis = jnp.max(flat, axis=-1)
    cy = idx // wp
    cx = idx % wp
    # 3x3 soft-argmax refinement around the peak (clamped at borders)
    offs = jnp.arange(-1, 2)
    ys = jnp.clip(cy[..., None] + offs, 0, hp - 1)  # (B, Q, 3)
    xs = jnp.clip(cx[..., None] + offs, 0, wp - 1)
    patch = corr[
        jnp.arange(B)[:, None, None, None],
        jnp.arange(corr.shape[1])[None, :, None, None],
        ys[..., :, None],
        xs[..., None, :],
    ]  # (B, Q, 3, 3)
    w = jax.nn.softmax(patch.reshape(B, -1, 9) * 10.0, axis=-1).reshape(B, -1, 3, 3)
    ref_y = jnp.sum(w * ys[..., :, None], axis=(-2, -1))
    ref_x = jnp.sum(w * xs[..., None, :], axis=(-2, -1))
    return jnp.stack([ref_x, ref_y], axis=-1), vis


def select_tracks_for_ba(
    vis: np.ndarray, valid: np.ndarray, per_camera: int = 12
) -> np.ndarray:
    """Greedy BA-coverage selection (vggt.py:387): pick tracks until every
    camera is observed by >= per_camera selected tracks (or the pool is
    exhausted), preferring tracks that cover the least-covered cameras.

    vis: (Q, B) visibility scores; valid: (Q, B) bool. Returns bool (Q,)."""
    Q, B = vis.shape
    coverage = np.zeros(B, np.int64)
    chosen = np.zeros(Q, bool)
    # order candidates by total quality, best first
    order = np.argsort(-(vis * valid).sum(axis=1))
    for q in order:
        need = valid[q] & (coverage < per_camera)
        if need.any():
            chosen[q] = True
            coverage += valid[q]
        if (coverage >= per_camera).all():
            break
    return chosen


def feedforward_tracks_to_sfm_data(
    poses,
    depth: np.ndarray,
    conf: np.ndarray,
    cal,
    track_feat,
    conf_threshold: float = 0.5,
    vis_threshold: float = 0.6,
    max_queries: int = 512,
    per_camera: int = 12,
    patch_size: int = 16,
):
    """Multi-view track construction from the tracking head (replaces the
    depth-only self-track fallback): rank frames, query confident patches
    of the best frame, track them across all frames, keep >= 2-view tracks,
    coverage-select for BA, and anchor each 3D point by unprojecting the
    reference-frame depth. Parity: run_vggt_tracking -> BA track pipeline
    (vggt.py:1177, :387)."""
    import jax

    from gtsfm_tpu.common.sfm_data import SfmData
    from gtsfm_tpu.geometry import PinholeCamera

    B, H, W = depth.shape
    tf = jnp.asarray(track_feat)
    _, hp, wp, _ = tf.shape
    ref = int(np.argmax(np.asarray(rank_frames(tf))))

    # queries: confident patches of the reference frame, best-first
    cgrid = np.asarray(conf[ref])[:hp, :wp]
    flat_conf = cgrid.reshape(-1)
    good = np.nonzero(flat_conf >= conf_threshold)[0]
    if len(good) == 0:
        good = np.argsort(-flat_conf)[: min(max_queries, flat_conf.size)]
    good = good[np.argsort(-flat_conf[good])][:max_queries]
    qy, qx = good // wp, good % wp
    qfeat = tf[ref, qy, qx]  # (Q, D)

    xy, vis = track_queries(tf, qfeat)  # (B, Q, 2) patch coords, (B, Q)
    xy = np.asarray(xy)
    vis = np.asarray(vis)
    Q = len(good)

    valid = vis.T >= vis_threshold  # (Q, B)
    # the reference frame observes its own queries by construction
    valid[:, ref] = True
    multi = valid.sum(axis=1) >= 2
    chosen = select_tracks_for_ba(vis.T * multi[:, None], valid & multi[:, None],
                                  per_camera=per_camera)

    s = patch_size
    tracks = []
    cam_ref = PinholeCamera(
        pose=jax.tree.map(lambda a: a[ref], poses),
        cal=jax.tree.map(lambda a: a[ref], cal),
    )
    for qi in np.nonzero(chosen)[0]:
        uv_ref = np.array([(qx[qi] + 0.5) * s, (qy[qi] + 0.5) * s], np.float32)
        iy, ix = min(int(uv_ref[1]), H - 1), min(int(uv_ref[0]), W - 1)
        X = np.asarray(
            cam_ref.backproject(jnp.asarray(uv_ref), jnp.asarray(depth[ref, iy, ix]))
        )
        obs = []
        for b in range(B):
            if not valid[qi, b]:
                continue
            uv = (xy[b, qi] + 0.5) * s
            if b == ref:
                uv = uv_ref
            if 0 <= uv[0] < W and 0 <= uv[1] < H:
                obs.append((b, uv.astype(np.float32)))
        if len(obs) >= 2:
            tracks.append((X, obs))
    if not tracks:
        return None
    return SfmData.from_cameras_and_tracks(poses, cal, tracks, num_cameras=B)
