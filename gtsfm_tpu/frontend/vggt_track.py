"""Exact VGGT track head (facebookresearch/vggt layout) in JAX.

Parity: /root/reference/gtsfm/frontend/vggt.py:1008-1177
(_run_vggt_head_tracking: model.track_head(aggregated_tokens_list,
images, ps_idx, query_points) -> (track_list, vis_scores, conf_scores))
over the public VGGT-1B track head — a CoTracker/VGGSfM-style iterative
tracker:

  feature_extractor  the VGGT DPT head in feature_only mode (fused
                     pyramid -> output_conv1 -> bilinear resize to
                     (H, W)/2, 128 channels)
  tracker            BaseTrackerPredictor: per-query features sampled
                     from frame 0, a 7-level correlation pyramid
                     (avg-pool halving; dot-product correlation maps,
                     bilinear 9x9 patch sampling), and 4 refinement
                     iterations of an EfficientUpdateFormer (time
                     attention over frames, space attention through 64
                     learned virtual-track tokens) predicting coordinate
                     deltas + feature updates; sigmoid visibility and
                     confidence heads on the final track features.

State-dict naming follows the public model
(track_head.feature_extractor.* / track_head.tracker.corr_mlp.* /
track_head.tracker.updateformer.{input_transform, flow_head,
virual_tracks [sic — the public checkpoint carries the typo],
time_blocks.N, space_virtual_blocks.N, space_point2virtual_blocks.N,
space_virtual2point_blocks.N}.*), with nn.MultiheadAttention in_proj /
out_proj weights. Dims are read from tensor shapes; the converter is
verified layer-for-layer against a reduced-dim torch mirror in
tests/frontend/test_vggt_track_exact.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gtsfm_tpu.frontend.global_descriptors.megaloc import _layer_norm
from gtsfm_tpu.frontend.vggt import VGGTOptions, dpt_head_forward


class TrackOptions(NamedTuple):
    latent_dim: int = 128  # track-feature channels (DPT features)
    stride: int = 2  # feature maps are at (H, W) / stride
    corr_levels: int = 7
    corr_radius: int = 4
    hidden_size: int = 384
    iters: int = 4
    depth: int = 6  # time blocks; space blocks interleave 1:1
    num_heads: int = 8
    num_virtual_tracks: int = 64
    max_scale: int = 518
    predict_conf: bool = True


# ---------------------------------------------------------------------------
# sampling primitives (cotracker bilinear_sampler semantics)
# ---------------------------------------------------------------------------


def _bilinear_sample(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                     padding: str) -> jnp.ndarray:
    """grid_sample(align_corners=True) on one (H, W, C) map at pixel
    coords x, y (any broadcastable shape). padding: "zeros" | "border" —
    per-tap semantics exactly as torch.nn.functional.grid_sample."""
    H, W, C = img.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    def tap(xi, yi):
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        v = img[yc, xc]  # (..., C)
        if padding == "zeros":
            ok = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
            v = v * ok[..., None].astype(v.dtype)
        return v

    v00 = tap(x0, y0)
    v01 = tap(x0 + 1, y0)
    v10 = tap(x0, y0 + 1)
    v11 = tap(x0 + 1, y0 + 1)
    wxe = wx[..., None]
    wye = wy[..., None]
    return (
        v00 * (1 - wxe) * (1 - wye)
        + v01 * wxe * (1 - wye)
        + v10 * (1 - wxe) * wye
        + v11 * wxe * wye
    )


def sample_features4d(fmap: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """(H, W, C) map, (N, 2) xy coords -> (N, C) border-padded bilinear
    features (vggsfm utils.sample_features4d)."""
    return _bilinear_sample(fmap, coords[:, 0], coords[:, 1], "border")


def get_2d_embedding(xy: jnp.ndarray, C: int) -> jnp.ndarray:
    """CoTracker's 2D sincos flow embedding (cat_coords=False): for each
    of x and y, C channels interleaving sin/cos of coord * k * (1000/C)
    for k = 0, 2, 4, ... -> (..., 2C)."""
    x = xy[..., 0:1]
    y = xy[..., 1:2]
    div = (jnp.arange(0, C, 2, dtype=jnp.float32) * (1000.0 / C))[None, :]
    while div.ndim < xy.ndim:
        div = div[None]

    def emb(v):
        ang = v * div  # (..., C/2)
        pe = jnp.stack([jnp.sin(ang), jnp.cos(ang)], axis=-1)
        return pe.reshape(pe.shape[:-2] + (C,))

    return jnp.concatenate([emb(x), emb(y)], axis=-1)


# ---------------------------------------------------------------------------
# correlation pyramid (vggsfm/vggt CorrBlock)
# ---------------------------------------------------------------------------


def _avg_pool2(x: jnp.ndarray) -> jnp.ndarray:
    """torch avg_pool2d(2, 2) on (S, H, W, C): floor halving."""
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )
    return s * 0.25


def build_fmap_pyramid(fmaps: jnp.ndarray, num_levels: int) -> list:
    """(S, H, W, C) -> list of num_levels maps, each half the previous."""
    pyr = [fmaps]
    for _ in range(num_levels - 1):
        pyr.append(_avg_pool2(pyr[-1]))
    return pyr


def corr_sample(pyramid: list, track_feats: jnp.ndarray, coords: jnp.ndarray,
                radius: int) -> jnp.ndarray:
    """Correlation features for every (frame, track) at every level.

    track_feats (S, N, C), coords (S, N, 2) in level-0 fmap units ->
    (S, N, L*(2r+1)^2): per level, the dot-product correlation map
    (targets . fmap / sqrt(C)) sampled on a (2r+1)^2 patch around
    coords / 2^level with zero padding. Patch offsets flatten in the
    public order: first axis added to x, second to y."""
    C = track_feats.shape[-1]
    r = radius
    d = jnp.arange(-r, r + 1, dtype=jnp.float32)
    # meshgrid(dy, dx, indexing="ij") stacked last: offset[u, v] applied
    # as (x + d[u], y + d[v]) — faithful to the public flatten order
    off_x = jnp.repeat(d, 2 * r + 1)  # (P,)
    off_y = jnp.tile(d, 2 * r + 1)
    outs = []
    for i, fm in enumerate(pyramid):
        # correlation map per (frame, track): (S, N, H, W)
        cm = jnp.einsum("snc,shwc->snhw", track_feats, fm) / jnp.sqrt(
            jnp.float32(C)
        )
        cl = coords / (2.0**i)
        x = cl[..., 0:1] + off_x[None, None, :]  # (S, N, P)
        y = cl[..., 1:2] + off_y[None, None, :]
        patch = jax.vmap(  # over frames
            jax.vmap(  # over tracks
                lambda m, xx, yy: _bilinear_sample(m[..., None], xx, yy, "zeros")[..., 0]
            )
        )(cm, x, y)  # (S, N, P)
        outs.append(patch)
    return jnp.concatenate(outs, axis=-1)


# ---------------------------------------------------------------------------
# EfficientUpdateFormer
# ---------------------------------------------------------------------------


def _mha(x_q: jnp.ndarray, x_kv: jnp.ndarray, p: dict, num_heads: int):
    """torch nn.MultiheadAttention(batch_first) forward on (..., N, E)."""
    E = x_q.shape[-1]
    w = p["in_proj_weight"]  # (3E, E) torch layout
    b = p["in_proj_bias"]
    q = x_q @ w[:E].T + b[:E]
    k = x_kv @ w[E : 2 * E].T + b[E : 2 * E]
    v = x_kv @ w[2 * E :].T + b[2 * E :]
    h = num_heads
    dh = E // h

    def split(t):
        return t.reshape(t.shape[:-1] + (h, dh))

    q, k, v = split(q), split(k), split(v)
    att = jnp.einsum("...nhd,...mhd->...hnm", q * dh**-0.5, k)
    att = jax.nn.softmax(att, axis=-1)
    y = jnp.einsum("...hnm,...mhd->...nhd", att, v)
    y = y.reshape(y.shape[:-2] + (E,))
    return y @ p["out_proj_weight"].T + p["out_proj_bias"]


def _gelu_tanh(x):
    return jax.nn.gelu(x, approximate=True)


def _block_mlp(x, p):
    return _gelu_tanh(x @ p["fc1_kernel"] + p["fc1_bias"]) @ p["fc2_kernel"] + p["fc2_bias"]


def _attn_block(x, p, num_heads: int):
    y = _layer_norm(x, p["norm1"], 1e-6)
    x = x + _mha(y, y, p["attn"], num_heads)
    return x + _block_mlp(_layer_norm(x, p["norm2"], 1e-6), p["mlp"])


def _cross_attn_block(x, context, p, num_heads: int):
    q = _layer_norm(x, p["norm1"], 1e-6)
    kv = _layer_norm(context, p["norm_context"], 1e-5)
    x = x + _mha(q, kv, p["cross_attn"], num_heads)
    return x + _block_mlp(_layer_norm(x, p["norm2"], 1e-6), p["mlp"])


def update_former_forward(params: dict, x: jnp.ndarray, o: TrackOptions):
    """x (N, S, input_dim) -> (N, S, latent + 2). Point tokens attend over
    time per track; space attention routes through num_virtual_tracks
    learned tokens (virtual2point cross -> virtual self -> point2virtual
    cross), interleaved 1:1 with the time blocks."""
    tokens = x @ params["input_transform"]["kernel"] + params["input_transform"]["bias"]
    init_tokens = tokens
    N, S, E = tokens.shape
    V = o.num_virtual_tracks
    virtual = jnp.broadcast_to(params["virual_tracks"][0, :, 0][:, None, :], (V, S, E))
    tokens = jnp.concatenate([tokens, virtual], axis=0)  # (N+V, S, E)
    n_time = len(params["time_blocks"])
    n_space = len(params["space_virtual_blocks"])
    j = 0
    for i in range(n_time):
        tokens = _attn_block(tokens, params["time_blocks"][i], o.num_heads)
        if n_space and j < n_space and (i % (n_time // n_space)) == 0:
            # space attention runs per frame: (S, N(+V), E)
            sp = tokens.transpose(1, 0, 2)
            point = sp[:, :N]
            virt = sp[:, N:]
            virt = _cross_attn_block(
                virt, point, params["space_virtual2point_blocks"][j], o.num_heads
            )
            virt = _attn_block(virt, params["space_virtual_blocks"][j], o.num_heads)
            point = _cross_attn_block(
                point, virt, params["space_point2virtual_blocks"][j], o.num_heads
            )
            tokens = jnp.concatenate([point, virt], axis=1).transpose(1, 0, 2)
            j += 1
    tokens = tokens[:N] + init_tokens
    return tokens @ params["flow_head"]["kernel"] + params["flow_head"]["bias"]


# ---------------------------------------------------------------------------
# BaseTrackerPredictor
# ---------------------------------------------------------------------------


def _group_norm1(x: jnp.ndarray, p: dict, eps: float = 1e-5) -> jnp.ndarray:
    """torch GroupNorm(1, C) on (..., C): normalize over the channel dim."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * p["scale"] + p["bias"]


def tracker_forward(params: dict, fmaps: jnp.ndarray, query_points: jnp.ndarray,
                    o: TrackOptions, iters: int | None = None):
    """fmaps (S, Hf, Wf, C) half-res feature maps; query_points (N, 2)
    pixel xy in frame 0. Returns (coord_preds list[(S, N, 2) pixels],
    vis (S, N), conf (S, N))."""
    if iters is None:
        iters = o.iters
    S = fmaps.shape[0]
    N = query_points.shape[0]
    fmaps = _layer_norm(fmaps, params["fmap_norm"], 1e-5)
    qp = query_points / float(o.stride)
    query_feat = sample_features4d(fmaps[0], qp)  # (N, C)
    coords = jnp.broadcast_to(qp[None], (S, N, 2))
    track_feats = jnp.broadcast_to(query_feat[None], (S, N, o.latent_dim))
    pyramid = build_fmap_pyramid(fmaps, o.corr_levels)

    coord_preds = []
    for _ in range(iters):
        coords = jax.lax.stop_gradient(coords)
        fcorrs = corr_sample(pyramid, track_feats, coords, o.corr_radius)
        # (S, N, P) -> per-track time sequences (N, S, ...)
        fcorrs_ = _block_mlp(fcorrs.transpose(1, 0, 2), params["corr_mlp"])
        flows = (coords - coords[0:1]).transpose(1, 0, 2)  # (N, S, 2)
        flows_emb = get_2d_embedding(flows, o.latent_dim // 2)
        flows_emb = jnp.concatenate(
            [flows_emb, flows / o.max_scale, flows / o.max_scale], axis=-1
        )
        track_feats_ = track_feats.transpose(1, 0, 2)
        x = jnp.concatenate([flows_emb, fcorrs_, track_feats_], axis=-1)
        delta = update_former_forward(params["updateformer"], x, o)  # (N, S, C+2)
        d_coord = delta[..., :2]
        d_feat = delta[..., 2:]
        upd = _group_norm1(d_feat, params["ffeat_norm"])
        upd = jax.nn.gelu(
            upd @ params["ffeat_updater"]["kernel"] + params["ffeat_updater"]["bias"],
            approximate=False,
        )
        track_feats = (track_feats_ + upd).transpose(1, 0, 2)
        coords = coords + d_coord.transpose(1, 0, 2)
        coord_preds.append(coords * o.stride)

    vis = jax.nn.sigmoid(
        (track_feats @ params["vis_predictor"]["kernel"]
         + params["vis_predictor"]["bias"])[..., 0]
    )
    if o.predict_conf:
        conf = jax.nn.sigmoid(
            (track_feats @ params["conf_predictor"]["kernel"]
             + params["conf_predictor"]["bias"])[..., 0]
        )
    else:
        conf = jnp.ones_like(vis)
    return coord_preds, vis, conf


def track_head_forward(params: dict, outputs: list, patch_start: int,
                       image_hw, query_points: jnp.ndarray,
                       vggt_opts: VGGTOptions, opts: TrackOptions,
                       iters: int | None = None):
    """The TrackHead forward: DPT feature extraction at half resolution,
    then the iterative tracker. outputs = aggregator layer list;
    query_points (N, 2) pixel xy in frame 0."""
    fmaps = dpt_head_forward(
        params["feature_extractor"], outputs, patch_start, image_hw,
        vggt_opts, activation="features", down_ratio=opts.stride,
    )  # (S, H/2, W/2, latent)
    return tracker_forward(params["tracker"], fmaps, query_points, opts, iters)


# ---------------------------------------------------------------------------
# init (random, for shape tests) + torch conversion
# ---------------------------------------------------------------------------


def init_track_params(key, o: TrackOptions, vggt_opts: VGGTOptions) -> dict:
    from gtsfm_tpu.frontend.vggt import init_params as _vggt_init

    ks = iter(jax.random.split(key, 1024))
    sd = 0.02

    def dense(cin, cout):
        return {
            "kernel": jax.random.normal(next(ks), (cin, cout)) * sd,
            "bias": jnp.zeros(cout),
        }

    def ln(c):
        return {"scale": jnp.ones(c), "bias": jnp.zeros(c)}

    def mlp(cin, hid, cout):
        return {
            "fc1_kernel": jax.random.normal(next(ks), (cin, hid)) * sd,
            "fc1_bias": jnp.zeros(hid),
            "fc2_kernel": jax.random.normal(next(ks), (hid, cout)) * sd,
            "fc2_bias": jnp.zeros(cout),
        }

    E = o.hidden_size

    def mha():
        return {
            "in_proj_weight": jax.random.normal(next(ks), (3 * E, E)) * sd,
            "in_proj_bias": jnp.zeros(3 * E),
            "out_proj_weight": jax.random.normal(next(ks), (E, E)) * sd,
            "out_proj_bias": jnp.zeros(E),
        }

    def attn_block():
        return {
            "norm1": ln(E), "attn": mha(), "norm2": ln(E),
            "mlp": mlp(E, 4 * E, E),
        }

    def cross_block():
        return {
            "norm1": ln(E), "norm_context": ln(E), "cross_attn": mha(),
            "norm2": ln(E), "mlp": mlp(E, 4 * E, E),
        }

    C = o.latent_dim
    corr_dim = o.corr_levels * (2 * o.corr_radius + 1) ** 2
    tdim = 3 * C + 4
    feature_extractor = _vggt_init(next(ks), vggt_opts)["depth_head"]
    F = vggt_opts.dpt_features
    feature_extractor["output_conv1"] = {
        "kernel": jax.random.normal(next(ks), (3, 3, F, C)) * sd,
        "bias": jnp.zeros(C),
    }
    del feature_extractor["output_conv2_0"]
    del feature_extractor["output_conv2_2"]
    return {
        "feature_extractor": feature_extractor,
        "tracker": {
            "fmap_norm": ln(C),
            "corr_mlp": mlp(corr_dim, o.hidden_size, C),
            "updateformer": {
                "input_transform": dense(tdim, E),
                "flow_head": dense(E, C + 2),
                "virual_tracks": jax.random.normal(
                    next(ks), (1, o.num_virtual_tracks, 1, E)
                ),
                "time_blocks": [attn_block() for _ in range(o.depth)],
                "space_virtual_blocks": [attn_block() for _ in range(o.depth)],
                "space_point2virtual_blocks": [cross_block() for _ in range(o.depth)],
                "space_virtual2point_blocks": [cross_block() for _ in range(o.depth)],
            },
            "ffeat_norm": ln(C),
            "ffeat_updater": dense(C, C),
            "vis_predictor": dense(C, 1),
            "conf_predictor": dense(C, 1),
        },
    }


def track_options_from_params(params: dict) -> TrackOptions:
    """Recover TrackOptions from a converted track_head params tree (dims
    read from tensor shapes, same inference rules as the converter)."""
    tk = params["tracker"]
    C = tk["fmap_norm"]["scale"].shape[0]
    E = tk["updateformer"]["input_transform"]["kernel"].shape[1]
    corr_dim = tk["corr_mlp"]["fc1_kernel"].shape[0]
    for radius in (4, 3, 2, 1):
        if corr_dim % (2 * radius + 1) ** 2 == 0:
            break
    return TrackOptions(
        latent_dim=C, hidden_size=E,
        corr_levels=corr_dim // (2 * radius + 1) ** 2, corr_radius=radius,
        depth=len(tk["updateformer"]["time_blocks"]),
        num_heads=8 if E % 8 == 0 else 6,
        num_virtual_tracks=tk["updateformer"]["virual_tracks"].shape[1],
    )


def convert_torch_track_state_dict(sd: dict) -> tuple:
    """track_head.* entries of the public VGGT state_dict ->
    (params, TrackOptions). Dims read from tensor shapes."""

    def t(name):
        v = sd[name]
        return np.asarray(
            v.detach().cpu().numpy() if hasattr(v, "detach") else v, np.float32
        )

    tk = "track_head.tracker"
    C = t(f"{tk}.fmap_norm.weight").shape[0]
    E = t(f"{tk}.updateformer.input_transform.weight").shape[0]
    corr_dim = t(f"{tk}.corr_mlp.fc1.weight").shape[1]
    V = t(f"{tk}.updateformer.virual_tracks").shape[1]
    tb_prefix = f"{tk}.updateformer.time_blocks."
    depth = max(
        int(k[len(tb_prefix):].split(".")[0]) for k in sd if k.startswith(tb_prefix)
    ) + 1
    heads_guess = 8 if E % 8 == 0 else 6
    # corr_dim = levels * (2*radius+1)^2; the public head uses radius 4 —
    # prefer the largest radius that divides corr_dim exactly
    for radius in (4, 3, 2, 1):
        if corr_dim % (2 * radius + 1) ** 2 == 0:
            break
    levels = corr_dim // (2 * radius + 1) ** 2
    opts = TrackOptions(
        latent_dim=C, hidden_size=E, corr_levels=levels, corr_radius=radius,
        depth=depth, num_heads=heads_guess, num_virtual_tracks=V,
    )

    def lin(name):
        return {
            "kernel": jnp.asarray(t(f"{name}.weight").T),
            "bias": jnp.asarray(t(f"{name}.bias")),
        }

    def ln(name):
        return {
            "scale": jnp.asarray(t(f"{name}.weight")),
            "bias": jnp.asarray(t(f"{name}.bias")),
        }

    def mlp(name):
        return {
            "fc1_kernel": jnp.asarray(t(f"{name}.fc1.weight").T),
            "fc1_bias": jnp.asarray(t(f"{name}.fc1.bias")),
            "fc2_kernel": jnp.asarray(t(f"{name}.fc2.weight").T),
            "fc2_bias": jnp.asarray(t(f"{name}.fc2.bias")),
        }

    def mha(name):
        return {
            "in_proj_weight": jnp.asarray(t(f"{name}.in_proj_weight")),
            "in_proj_bias": jnp.asarray(t(f"{name}.in_proj_bias")),
            "out_proj_weight": jnp.asarray(t(f"{name}.out_proj.weight")),
            "out_proj_bias": jnp.asarray(t(f"{name}.out_proj.bias")),
        }

    def attn_block(name):
        return {
            "norm1": ln(f"{name}.norm1"), "attn": mha(f"{name}.attn"),
            "norm2": ln(f"{name}.norm2"), "mlp": mlp(f"{name}.mlp"),
        }

    def cross_block(name):
        return {
            "norm1": ln(f"{name}.norm1"),
            "norm_context": ln(f"{name}.norm_context"),
            "cross_attn": mha(f"{name}.cross_attn"),
            "norm2": ln(f"{name}.norm2"), "mlp": mlp(f"{name}.mlp"),
        }

    from gtsfm_tpu.frontend.vggt import convert_torch_state_dict  # noqa: F401

    # feature extractor: the shared DPT converter minus output_conv2
    def conv(name, bias=True):
        p = {"kernel": jnp.asarray(t(f"{name}.weight").transpose(2, 3, 1, 0))}
        if bias:
            p["bias"] = jnp.asarray(t(f"{name}.bias"))
        return p

    def convT(name):
        w = t(f"{name}.weight")[:, :, ::-1, ::-1]
        return {
            "kernel": jnp.asarray(w.transpose(2, 3, 0, 1).copy()),
            "bias": jnp.asarray(t(f"{name}.bias")),
        }

    head = "track_head.feature_extractor"
    feature_extractor = {
        "norm": ln(f"{head}.norm"),
        "projects": [conv(f"{head}.projects.{i}") for i in range(4)],
        "resize": [convT(f"{head}.resize_layers.0"),
                   convT(f"{head}.resize_layers.1"), None,
                   conv(f"{head}.resize_layers.3")],
        "scratch": {
            **{f"layer{i + 1}_rn": conv(f"{head}.scratch.layer{i + 1}_rn", bias=False)
               for i in range(4)},
            **{
                f"refinenet{i}": {
                    "resConfUnit1": {
                        "conv1": conv(f"{head}.scratch.refinenet{i}.resConfUnit1.conv1"),
                        "conv2": conv(f"{head}.scratch.refinenet{i}.resConfUnit1.conv2"),
                    },
                    "resConfUnit2": {
                        "conv1": conv(f"{head}.scratch.refinenet{i}.resConfUnit2.conv1"),
                        "conv2": conv(f"{head}.scratch.refinenet{i}.resConfUnit2.conv2"),
                    },
                    "out_conv": conv(f"{head}.scratch.refinenet{i}.out_conv"),
                }
                for i in range(1, 5)
            },
        },
        "output_conv1": conv(f"{head}.scratch.output_conv1"),
    }

    uf = f"{tk}.updateformer"
    params = {
        "feature_extractor": feature_extractor,
        "tracker": {
            "fmap_norm": ln(f"{tk}.fmap_norm"),
            "corr_mlp": mlp(f"{tk}.corr_mlp"),
            "updateformer": {
                "input_transform": lin(f"{uf}.input_transform"),
                "flow_head": lin(f"{uf}.flow_head"),
                "virual_tracks": jnp.asarray(t(f"{uf}.virual_tracks")),
                "time_blocks": [
                    attn_block(f"{uf}.time_blocks.{i}") for i in range(depth)
                ],
                "space_virtual_blocks": [
                    attn_block(f"{uf}.space_virtual_blocks.{i}")
                    for i in range(depth)
                ],
                "space_point2virtual_blocks": [
                    cross_block(f"{uf}.space_point2virtual_blocks.{i}")
                    for i in range(depth)
                ],
                "space_virtual2point_blocks": [
                    cross_block(f"{uf}.space_virtual2point_blocks.{i}")
                    for i in range(depth)
                ],
            },
            "ffeat_norm": ln(f"{tk}.ffeat_norm"),
            "ffeat_updater": lin(f"{tk}.ffeat_updater.0"),
            "vis_predictor": lin(f"{tk}.vis_predictor.0"),
            "conf_predictor": lin(f"{tk}.conf_predictor.0")
            if f"{tk}.conf_predictor.0.weight" in sd
            else {"kernel": jnp.zeros((C, 1)), "bias": jnp.zeros(1)},
        },
    }
    return params, opts
