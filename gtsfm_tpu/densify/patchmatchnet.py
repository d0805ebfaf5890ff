"""PatchmatchNet learned multi-view stereo in JAX — exact public layout.

Parity: /root/reference/gtsfm/densify/mvs_patchmatchnet.py:57 running
/root/reference/thirdparty/patchmatchnet (Wang et al., CVPR 2021). This is
a faithful inference port of the public architecture:

- FeatureNet: 10-conv FPN -> stage_1 (1/2, 16ch) / stage_2 (1/4, 32ch) /
  stage_3 (1/8, 64ch) features;
- three Patchmatch stages (coarse->fine): inverse-depth random
  initialization (stage 3) / local perturbation, learned adaptive
  PROPAGATION (depth hypotheses gathered at CNN-predicted offsets),
  learned adaptive EVALUATION (group-wise correlation of
  homography-warped source features, pixel-wise view weights, adaptive
  spatial cost aggregation with feature+depth weights), soft-argmin
  depth regression;
- image-guided Refinement to full resolution + photometric confidence.

Everything is (H, W, C) arrays and pure functions over a converted
parameter pytree (eval-mode BatchNorm folded into scale/shift affines);
the per-view forward is one jit. The two grid-sample conventions of the
original (align_corners=True zero-padding for warping; the
normalize-by-(size-1) / align_corners=False border-padded combination for
the adaptive offsets) are reproduced exactly.

load_torch_weights() converts the official model_000007.ckpt one-to-one
(verified against the reference torch implementation in
tests/densify/test_patchmatchnet_exact.py).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

# stage configs: index 0 -> patchmatch_1 (finest), 2 -> patchmatch_3
INTERVAL_SCALE = (0.005, 0.0125, 0.025)
PROP_RANGE = (6, 4, 2)
PM_ITERATIONS = (1, 2, 2)
NUM_SAMPLE = (8, 8, 16)
PROP_NEIGHBORS = (0, 8, 16)
EVAL_NEIGHBORS = (9, 9, 9)
NUM_FEATURES = (8, 16, 32, 64)
GROUPS = (4, 8, 8)
RANDOM_INIT_SAMPLES = 48


# ---------------------------------------------------------------------------
# primitive layers (params are dicts produced by the converter)
# ---------------------------------------------------------------------------


def _conv2d(p, x, stride=1, dilation=1):
    """x (H, W, Cin) -> (H', W', Cout); p["w"] HWIO [+ p["b"]] — torch
    Conv2d 'same-style' explicit padding."""
    kh, kw = p["w"].shape[0], p["w"].shape[1]
    pad_h = dilation * (kh - 1) // 2
    pad_w = dilation * (kw - 1) // 2
    y = jax.lax.conv_general_dilated(
        x[None], p["w"], (stride, stride),
        padding=((pad_h, pad_h), (pad_w, pad_w)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[0]
    if "b" in p:
        y = y + p["b"]
    return y


def _cbr(p, x, stride=1, dilation=1):
    """ConvBnReLU with folded eval-mode BN."""
    return jax.nn.relu(_conv2d(p, x, stride, dilation) * p["scale"] + p["shift"])


def _mlp1x1(p_list, x, final_p):
    """ConvBnReLU3D(k=1) stack + final 1x1 conv — pointwise, so any shape
    (..., C) works as a dense chain."""
    for p in p_list:
        x = jax.nn.relu((x @ p["w"] ) * p["scale"] + p["shift"])
    return x @ final_p["w"] + final_p["b"]


def _bilinear_border(img, xs, ys):
    """Bilinear sample img (H, W, C) at pixel coords (border clamp)."""
    H, W = img.shape[0], img.shape[1]
    xs = jnp.clip(xs, 0.0, W - 1.0)
    ys = jnp.clip(ys, 0.0, H - 1.0)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, W - 2)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, H - 2)
    fx = xs - x0
    fy = ys - y0
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    fx = fx[..., None]
    fy = fy[..., None]
    return (
        v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy + v11 * fx * fy
    )


def _bilinear_zeros(img, xs, ys):
    """Bilinear sample with zero padding outside (align_corners=True
    warping convention: coords are direct pixel positions)."""
    H, W = img.shape[0], img.shape[1]
    inb = (xs >= 0) & (xs <= W - 1) & (ys >= 0) & (ys <= H - 1)
    out = _bilinear_border(img, xs, ys)
    return out * inb[..., None]


def _offset_sample(img, grid_x, grid_y):
    """The original's offset-grid convention: pixel coords normalized by
    (size-1)/2 but sampled with align_corners=False -> effective sample
    position x*W/(W-1) - 0.5, border padding."""
    H, W = img.shape[0], img.shape[1]
    xs = grid_x * W / (W - 1) - 0.5
    ys = grid_y * H / (H - 1) - 0.5
    return _bilinear_border(img, xs, ys)


def _resize_bilinear2x(x):
    H, W, C = x.shape
    return jax.image.resize(x, (2 * H, 2 * W, C), method="linear")


def _resize_nearest2x(x):
    H, W = x.shape[0], x.shape[1]
    return jnp.repeat(jnp.repeat(x, 2, axis=0), 2, axis=1)


# ---------------------------------------------------------------------------
# feature extraction
# ---------------------------------------------------------------------------


def feature_net(p, img):
    """img (H, W, 3) -> {1: (H/2, W/2, 16), 2: (H/4, W/4, 32),
    3: (H/8, W/8, 64)}."""
    c1 = _cbr(p["conv1"], _cbr(p["conv0"], img))
    c4 = _cbr(p["conv4"], _cbr(p["conv3"], _cbr(p["conv2"], c1, stride=2)))
    c7 = _cbr(p["conv7"], _cbr(p["conv6"], _cbr(p["conv5"], c4, stride=2)))
    c10 = _cbr(p["conv10"], _cbr(p["conv9"], _cbr(p["conv8"], c7, stride=2)))
    f3 = _conv2d(p["output1"], c10)
    intra = _resize_bilinear2x(c10) + _conv2d(p["inner1"], c7)
    f2 = _conv2d(p["output2"], intra)
    intra = _resize_bilinear2x(intra) + _conv2d(p["inner2"], c4)
    f1 = _conv2d(p["output3"], intra)
    return {1: f1, 2: f2, 3: f3}


# ---------------------------------------------------------------------------
# patchmatch pieces
# ---------------------------------------------------------------------------


def _warp_src(src_feat, src_proj, ref_proj, depth_sample):
    """differentiable_warping (module.py): src_feat (Hs, Ws, C),
    depth_sample (D, H, W) -> warped (D, H, W, C)."""
    H, W = depth_sample.shape[1], depth_sample.shape[2]
    proj = src_proj @ jnp.linalg.inv(ref_proj)
    rot, trans = proj[:3, :3], proj[:3, 3]
    y, x = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                        jnp.arange(W, dtype=jnp.float32), indexing="ij")
    xyz = jnp.stack([x, y, jnp.ones_like(x)])  # (3, H, W)
    rot_xyz = jnp.einsum("ij,jhw->ihw", rot, xyz)  # (3, H, W)
    p = rot_xyz[:, None] * depth_sample[None] + trans[:, None, None, None]
    neg = p[2] <= 1e-3
    px = jnp.where(neg, jnp.float32(W), p[0])
    py = jnp.where(neg, jnp.float32(H), p[1])
    pz = jnp.where(neg, 1.0, p[2])
    xs = px / pz  # (D, H, W) pixel coords (align_corners=True convention)
    ys = py / pz
    return _bilinear_zeros(src_feat, xs, ys)  # (D, H, W, C)


def _offset_grids(offset, base_offsets, H, W):
    """offset (H, W, 2*Nn) CNN output + static base offsets -> absolute
    pixel coordinate grids (Nn, H, W) x/y in the normalize-by-(size-1)
    convention (pre-unnormalization)."""
    y, x = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                        jnp.arange(W, dtype=jnp.float32), indexing="ij")
    gx, gy = [], []
    for i, (oy, ox) in enumerate(base_offsets):
        gx.append(x + ox + offset[:, :, 2 * i])
        gy.append(y + oy + offset[:, :, 2 * i + 1])
    return jnp.stack(gx), jnp.stack(gy)  # (Nn, H, W) each


def _base_offsets_prop(neighbors, dilation):
    if neighbors == 4:
        out = [[-dilation, 0], [0, -dilation], [0, dilation], [dilation, 0]]
    elif neighbors in (8, 16):
        out = [
            [-dilation, -dilation], [-dilation, 0], [-dilation, dilation],
            [0, -dilation], [0, dilation],
            [dilation, -dilation], [dilation, 0], [dilation, dilation],
        ]
        if neighbors == 16:
            out = out + [[2 * oy, 2 * ox] for oy, ox in out]
    else:
        raise NotImplementedError(neighbors)
    return out


def _base_offsets_eval(neighbors, dilation):
    d = dilation - 1
    out = [
        [-d, -d], [-d, 0], [-d, d], [0, -d], [0, 0], [0, d],
        [d, -d], [d, 0], [d, d],
    ]
    if neighbors == 17:
        out = out + [[2 * oy, 2 * ox] for oy, ox in out if (oy, ox) != (0, 0)]
    return out


def _depth_init_random(key, dmin, dmax, H, W):
    inv_min, inv_max = 1.0 / dmin, 1.0 / dmax
    D = RANDOM_INIT_SAMPLES
    u = jax.random.uniform(key, (D, H, W)) + jnp.arange(D, dtype=jnp.float32)[:, None, None]
    inv = inv_max + u / D * (inv_min - inv_max)
    return 1.0 / inv


def _depth_perturb(depth, dmin, dmax, num_sample, interval_scale):
    """local inverse-depth perturbation around the current depth (1,H,W)."""
    inv_min, inv_max = 1.0 / dmin, 1.0 / dmax
    off = jnp.arange(-(num_sample // 2), num_sample // 2, dtype=jnp.float32)
    inv_int = (inv_min - inv_max) * interval_scale
    inv = 1.0 / depth + inv_int * off[:, None, None]
    inv = jnp.clip(inv, inv_max, inv_min)
    return 1.0 / inv


def _propagate(depth_sample, gx, gy):
    """gather the middle hypothesis at learned neighbor positions and
    append; sort over the hypothesis axis (Propagation)."""
    D = depth_sample.shape[0]
    mid = depth_sample[D // 2][:, :, None]  # (H, W, 1)
    nb = jax.vmap(lambda ax, ay: _offset_sample(mid, ax, ay)[..., 0])(gx, gy)
    return jnp.sort(jnp.concatenate([depth_sample, nb], axis=0), axis=0)


def _depth_weight(depth_sample, dmin, dmax, gx, gy, interval_scale):
    """depth-difference weights of the adaptive aggregation (patchmatch.py:
    depth_weight), (D, Nn, H, W)."""
    inv_min, inv_max = 1.0 / dmin, 1.0 / dmax
    x = (1.0 / depth_sample - inv_max) / (inv_min - inv_max)  # (D, H, W)
    xc = jnp.transpose(x, (1, 2, 0))  # (H, W, D)
    samp = jax.vmap(lambda ax, ay: _offset_sample(xc, ax, ay))(gx, gy)  # (Nn,H,W,D)
    samp = jnp.transpose(samp, (3, 0, 1, 2))  # (D, Nn, H, W)
    d = jnp.abs(samp - x[:, None]) / interval_scale
    d = jnp.clip(d, 0.0, 4.0)
    return jax.lax.stop_gradient(jax.nn.sigmoid((-d + 2.0) * 2.0))


def _feature_weight(p, ref_feat, gx, gy, G):
    """FeatureWeightNet: similarity of sampled-neighbor features with the
    center feature -> sigmoid weights (Nn, H, W)."""
    C = ref_feat.shape[-1]
    samp = jax.vmap(lambda ax, ay: _offset_sample(ref_feat, ax, ay))(gx, gy)
    # group-wise mean correlation: (Nn, H, W, G)
    Hh, Ww = ref_feat.shape[0], ref_feat.shape[1]
    s = samp.reshape(samp.shape[0], Hh, Ww, G, C // G)
    r = ref_feat.reshape(Hh, Ww, G, C // G)
    sim = jnp.mean(s * r[None], axis=-1)  # (Nn, H, W, G)
    out = _mlp1x1([p["conv0"], p["conv1"]], sim, p["similarity"])  # (Nn,H,W,1)
    return jax.nn.sigmoid(out[..., 0])


def _similarity_net(p, sim, gx, gy, weight):
    """SimilarityNet: 1x1x1 conv chain over (D, H, W, G) then adaptive
    spatial aggregation with the given weights (D, Nn, H, W)."""
    c = _mlp1x1([p["conv0"], p["conv1"]], sim, p["similarity"])[..., 0]  # (D,H,W)
    cc = jnp.transpose(c, (1, 2, 0))  # (H, W, D)
    samp = jax.vmap(lambda ax, ay: _offset_sample(cc, ax, ay))(gx, gy)  # (Nn,H,W,D)
    samp = jnp.transpose(samp, (3, 0, 1, 2))  # (D, Nn, H, W)
    return jnp.sum(samp * weight, axis=1)  # (D, H, W)


def _pixelwise_net(p, sim):
    """PixelwiseNet: (D, H, W, G) -> view weight (H, W)."""
    out = _mlp1x1([p["conv0"], p["conv1"]], sim, p["conv2"])[..., 0]  # (D,H,W)
    return jnp.max(jax.nn.sigmoid(out), axis=0)


def _evaluate(p, stage_idx, ref_feat, src_feats, ref_proj, src_projs,
              depth_sample, gx, gy, weight, view_weights):
    """Evaluation: group-wise correlation of warped features, view-weighted
    aggregation, SimilarityNet scoring, soft-argmin depth."""
    G = GROUPS[stage_idx]
    C = ref_feat.shape[-1]
    H, W = ref_feat.shape[0], ref_feat.shape[1]
    D = depth_sample.shape[0]
    r = ref_feat.reshape(H, W, G, C // G)

    sim_sum = jnp.zeros((D, H, W, G))
    w_sum = jnp.zeros((1, H, W, 1))
    new_view_weights = []
    for v in range(src_feats.shape[0]):
        warped = _warp_src(src_feats[v], src_projs[v], ref_proj, depth_sample)
        s = warped.reshape(D, H, W, G, C // G)
        sim = jnp.mean(s * r[None], axis=-1)  # (D, H, W, G)
        if view_weights is None:
            vw = _pixelwise_net(p["pixel_wise_net"], sim)  # (H, W)
            new_view_weights.append(vw)
        else:
            vw = view_weights[v]
        sim_sum = sim_sum + sim * vw[None, :, :, None]
        w_sum = w_sum + vw[None, :, :, None]
    sim = sim_sum / w_sum
    score = _similarity_net(p["similarity_net"], sim, gx, gy, weight)
    score = jax.nn.softmax(score, axis=0)  # (D, H, W)
    vw_out = jnp.stack(new_view_weights) if view_weights is None else view_weights
    return score, vw_out


def _regress_depth(depth_sample, score, stage_idx, last_iter):
    D = depth_sample.shape[0]
    if stage_idx == 0 and last_iter:
        # stage 1 final: inverse-depth index regression
        idx = jnp.sum(jnp.arange(D, dtype=jnp.float32)[:, None, None] * score, axis=0)
        inv_min = 1.0 / depth_sample[-1]
        inv_max = 1.0 / depth_sample[0]
        inv = inv_max + idx / (D - 1) * (inv_min - inv_max)
        return 1.0 / inv
    return jnp.sum(depth_sample * score, axis=0)


def _patchmatch_stage(p, stage_idx, ref_feat, src_feats, ref_proj, src_projs,
                      dmin, dmax, depth, view_weights, key):
    """One PatchMatch module (stage_idx 0..2 = patchmatch_{1..3})."""
    H, W = ref_feat.shape[0], ref_feat.shape[1]
    iters = PM_ITERATIONS[stage_idx]
    dilation = PROP_RANGE[stage_idx]
    nn_prop = PROP_NEIGHBORS[stage_idx]
    nn_eval = EVAL_NEIGHBORS[stage_idx]
    interval = INTERVAL_SCALE[stage_idx]
    num_sample = NUM_SAMPLE[stage_idx]
    random_init = stage_idx == 2

    if nn_prop > 0 and not (stage_idx == 0 and iters == 1):
        off = _conv2d(p["propa_conv"], ref_feat, dilation=dilation)
        pgx, pgy = _offset_grids(off, _base_offsets_prop(nn_prop, dilation), H, W)
    else:
        pgx = pgy = None
    off = _conv2d(p["eval_conv"], ref_feat, dilation=dilation)
    egx, egy = _offset_grids(off, _base_offsets_eval(nn_eval, dilation), H, W)
    feat_w = _feature_weight(p["feature_weight_net"], jax.lax.stop_gradient(ref_feat),
                             egx, egy, GROUPS[stage_idx])  # (Nn, H, W)

    score = None
    for it in range(1, iters + 1):
        if it == 1 and random_init:
            depth_sample = _depth_init_random(key, dmin, dmax, H, W)
        else:
            depth_sample = _depth_perturb(depth, dmin, dmax, num_sample, interval)
            if pgx is not None and not (stage_idx == 0 and it == iters):
                depth_sample = _propagate(depth_sample, pgx, pgy)
        dw = _depth_weight(depth_sample, dmin, dmax, egx, egy, interval)
        w = dw * feat_w[None]
        w = w / jnp.sum(w, axis=1, keepdims=True)  # (D, Nn, H, W)
        score, view_weights = _evaluate(
            p, stage_idx, ref_feat, src_feats, ref_proj, src_projs,
            depth_sample, egx, egy, w, view_weights,
        )
        depth = _regress_depth(depth_sample, score, stage_idx, it == iters)[None]
    return depth, score, view_weights


def _refinement(p, img, depth, dmin, dmax):
    """Depth refinement to full resolution (net.py Refinement)."""
    dn = (depth - dmin) / (dmax - dmin)  # (1, H, W) normalized
    conv0 = _cbr(p["conv0"], img)
    d_in = jnp.transpose(dn, (1, 2, 0))  # (H, W, 1)
    c = _cbr(p["conv2"], _cbr(p["conv1"], d_in))
    # ConvTranspose2d(8, 8, k=3, stride=2, padding=1, output_padding=1)
    dec = jax.lax.conv_transpose(
        c[None], p["deconv"]["w"], (2, 2), padding=((1, 2), (1, 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[0]
    dec = jax.nn.relu(dec * p["bn"]["scale"] + p["bn"]["shift"])
    cat = jnp.concatenate([dec, conv0], axis=-1)
    res = _conv2d(p["res"], _cbr(p["conv3"], cat))  # (H, W, 1)
    up = _resize_nearest2x(d_in)
    out = up + res
    return (out[..., 0] * (dmax - dmin) + dmin)  # (H, W)


class PatchmatchNetOutputs(NamedTuple):
    depth: jnp.ndarray  # (H, W) refined
    confidence: jnp.ndarray  # (H, W) photometric confidence


@partial(jax.jit, static_argnames=())
def patchmatchnet_forward(params, imgs, projs_1, projs_2, projs_3,
                          dmin, dmax, key) -> PatchmatchNetOutputs:
    """imgs: (V, H, W, 3) normalized RGB (view 0 = reference); projs_k:
    (V, 4, 4) K_stage @ world->cam at stage k resolution; dmin/dmax:
    scalar depth range; key: PRNG for the stage-3 random initialization."""
    feats = jax.vmap(lambda im: feature_net(params["feature"], im))(imgs)
    depth = None
    view_weights = None
    score1 = None
    for stage_idx in (2, 1, 0):
        projs = (projs_1, projs_2, projs_3)[stage_idx]
        ref_feat = feats[stage_idx + 1][0]
        src_feats = feats[stage_idx + 1][1:]
        depth, score, view_weights = _patchmatch_stage(
            params[f"patchmatch_{stage_idx + 1}"], stage_idx,
            ref_feat, src_feats, projs[0], projs[1:],
            dmin, dmax, depth, view_weights, key,
        )
        if stage_idx == 0:
            score1 = score
        else:
            depth = _resize_nearest2x(depth[0].reshape(*depth.shape[1:], 1))[..., 0][None]
            view_weights = jax.vmap(
                lambda vw: _resize_nearest2x(vw[..., None])[..., 0]
            )(view_weights)
    refined = _refinement(params["refinement"], imgs[0], depth, dmin, dmax)

    # photometric confidence: sum of the 4 probabilities around the argmax
    D = score1.shape[0]
    padded = jnp.concatenate(
        [jnp.zeros((1,) + score1.shape[1:]), score1,
         jnp.zeros((2,) + score1.shape[1:])], axis=0
    )
    sum4 = padded[:-3] + padded[1:-2] + padded[2:-1] + padded[3:]
    idx = jnp.clip(
        jnp.sum(jnp.arange(D, dtype=jnp.float32)[:, None, None] * score1, 0),
        0, D - 1,
    ).astype(jnp.int32)
    conf = jnp.take_along_axis(sum4, idx[None], axis=0)[0]
    conf = _resize_nearest2x(conf[..., None])[..., 0]
    return PatchmatchNetOutputs(depth=refined, confidence=conf)


# ---------------------------------------------------------------------------
# torch checkpoint conversion
# ---------------------------------------------------------------------------


def _to_np(v):
    return v.detach().cpu().numpy().astype(np.float32) if hasattr(v, "detach") else np.asarray(v, np.float32)


def convert_torch_state_dict(sd) -> dict:
    """Official PatchmatchNet state_dict (model_000007.ckpt["model"] or a
    raw state_dict, optionally with 'module.' prefixes) -> param pytree."""
    sd = { (k[7:] if k.startswith("module.") else k): v for k, v in sd.items() }

    def conv(prefix, bias=True, transposed=False):
        w = _to_np(sd[f"{prefix}.weight"])
        if transposed:  # torch ConvTranspose2d (in, out, kh, kw) -> HWIO
            w = w.transpose(2, 3, 0, 1)
        else:  # torch (out, in, kh, kw) -> HWIO
            w = w.transpose(2, 3, 1, 0)
        out = {"w": jnp.asarray(w)}
        if bias and f"{prefix}.bias" in sd:
            out["b"] = jnp.asarray(_to_np(sd[f"{prefix}.bias"]))
        return out

    def bn_affine(prefix, eps=1e-5):
        w = _to_np(sd[f"{prefix}.weight"])
        b = _to_np(sd[f"{prefix}.bias"])
        mean = _to_np(sd[f"{prefix}.running_mean"])
        var = _to_np(sd[f"{prefix}.running_var"])
        scale = w / np.sqrt(var + eps)
        return jnp.asarray(scale), jnp.asarray(b - mean * scale)

    def cbr(prefix):
        out = conv(f"{prefix}.conv", bias=False)
        out["scale"], out["shift"] = bn_affine(f"{prefix}.bn")
        return out

    def cbr3d_1x1(prefix):
        # Conv3d k=1 (out, in, 1, 1, 1) -> dense (in, out)
        w = _to_np(sd[f"{prefix}.conv.weight"])[:, :, 0, 0, 0]
        scale, shift = bn_affine(f"{prefix}.bn")
        return {"w": jnp.asarray(w.T), "scale": scale, "shift": shift}

    def conv3d_1x1(prefix):
        w = _to_np(sd[f"{prefix}.weight"])[:, :, 0, 0, 0]
        return {
            "w": jnp.asarray(w.T),
            "b": jnp.asarray(_to_np(sd[f"{prefix}.bias"])),
        }

    feature = {f"conv{i}": cbr(f"feature.conv{i}") for i in range(11)}
    feature["output1"] = conv("feature.output1", bias=False)
    feature["output2"] = conv("feature.output2", bias=False)
    feature["output3"] = conv("feature.output3", bias=False)
    feature["inner1"] = conv("feature.inner1")
    feature["inner2"] = conv("feature.inner2")

    params = {"feature": feature}
    for s in (1, 2, 3):
        q = f"patchmatch_{s}"
        stage_idx = s - 1
        pp = {
            "eval_conv": conv(f"{q}.eval_conv"),
            "feature_weight_net": {
                "conv0": cbr3d_1x1(f"{q}.feature_weight_net.conv0"),
                "conv1": cbr3d_1x1(f"{q}.feature_weight_net.conv1"),
                "similarity": conv3d_1x1(f"{q}.feature_weight_net.similarity"),
            },
            "similarity_net": {
                "conv0": cbr3d_1x1(f"{q}.evaluation.similarity_net.conv0"),
                "conv1": cbr3d_1x1(f"{q}.evaluation.similarity_net.conv1"),
                "similarity": conv3d_1x1(f"{q}.evaluation.similarity_net.similarity"),
            },
        }
        if PROP_NEIGHBORS[stage_idx] > 0 and not (
            stage_idx == 0 and PM_ITERATIONS[stage_idx] == 1
        ):
            pp["propa_conv"] = conv(f"{q}.propa_conv")
        if s == 3:
            pp["pixel_wise_net"] = {
                "conv0": cbr3d_1x1(f"{q}.evaluation.pixel_wise_net.conv0"),
                "conv1": cbr3d_1x1(f"{q}.evaluation.pixel_wise_net.conv1"),
                "conv2": conv3d_1x1(f"{q}.evaluation.pixel_wise_net.conv2"),
            }
        params[q] = pp

    params["refinement"] = {
        "conv0": cbr("upsample_net.conv0"),
        "conv1": cbr("upsample_net.conv1"),
        "conv2": cbr("upsample_net.conv2"),
        "conv3": cbr("upsample_net.conv3"),
        "deconv": conv("upsample_net.deconv", bias=False, transposed=True),
        "res": conv("upsample_net.res"),
        "bn": dict(zip(("scale", "shift"), bn_affine("upsample_net.bn"))),
    }
    return params


def load_torch_weights(path: str) -> dict:
    from gtsfm_tpu.utils.torch_io import load_torch_checkpoint

    ckpt = load_torch_checkpoint(path)
    sd = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    return convert_torch_state_dict(sd)


# ---------------------------------------------------------------------------
# MVS back-end wrapper (MVSPatchmatchNet parity)
# ---------------------------------------------------------------------------


class PatchmatchNetMVS:
    """Dense reconstruction with the learned PatchmatchNet depth estimator.

    Same contract as densify.mvs.PlaneSweepMVS: run(data, images) ->
    (points (P, 3), colors (P,), metrics). Reuses the triangulation-angle
    source selection and consistency fusion; per-view depth comes from the
    network (random-init weights unless params are provided — pass a tree
    from load_torch_weights(model_000007.ckpt) for the published model).
    Parity: /root/reference/gtsfm/densify/mvs_patchmatchnet.py:57 +
    patchmatchnet_data.py:179-240 (stage intrinsics pyramid).
    """

    def __init__(self, options=None, params=None, seed: int = 0):
        from gtsfm_tpu.densify.mvs import MVSOptions

        self.options = options or MVSOptions()
        self.seed = seed
        if params is None:
            params = _random_init_params(jax.random.PRNGKey(0))
        self.params = params

    def run(self, data, images: np.ndarray):
        from gtsfm_tpu.densify.mvs import fuse_depth_maps

        depths, confs = self.compute_depths(data, images)
        return fuse_depth_maps(depths, confs, data, images, self.options)

    def compute_depths(self, data, images: np.ndarray):
        from gtsfm_tpu.densify.mvs import (
            _depth_range_per_view,
            select_source_views,
        )

        opts = self.options
        n = data.max_cameras
        pose_mask = np.asarray(data.pose_mask)
        src_sel = select_source_views(data, opts)
        dranges = _depth_range_per_view(data, opts.depth_margin)
        Ks = np.asarray(data.cal.K())
        Rs = np.asarray(data.poses.R)
        ts = np.asarray(data.poses.t)
        cTw_R = Rs.transpose(0, 2, 1)
        cTw_t = -np.einsum("nij,nj->ni", cTw_R, ts)
        H0, W0 = images.shape[1], images.shape[2]
        # PatchmatchNet needs dims divisible by 8
        H8, W8 = (H0 // 8) * 8, (W0 // 8) * 8

        def projs_for(view_ids, stage):
            scale = 1.0 / (2**stage)
            mats = []
            for v in view_ids:
                K = Ks[v].copy()
                K[:2, :] *= scale
                E = np.eye(4, dtype=np.float32)
                E[:3, :3] = cTw_R[v]
                E[:3, 3] = cTw_t[v]
                P = E.copy()
                P[:3, :4] = K @ E[:3, :4]
                mats.append(P)
            return jnp.asarray(np.stack(mats), jnp.float32)

        depths, confs = {}, {}
        key = jax.random.PRNGKey(self.seed)
        for i in range(n):
            if not pose_mask[i] or np.isnan(dranges[i, 0]):
                continue
            srcs = [s for s in src_sel[i] if pose_mask[s] and s != i][: opts.num_source_views]
            if len(srcs) < 1:
                continue
            srcs = (srcs + srcs)[: opts.num_source_views]
            ids = [i] + list(srcs)
            gray = images[np.asarray(ids)][:, :H8, :W8].astype(np.float32)
            rgb = jnp.asarray(np.repeat(gray[..., None], 3, axis=-1))
            out = patchmatchnet_forward(
                self.params, rgb,
                projs_for(ids, 1), projs_for(ids, 2), projs_for(ids, 3),
                jnp.float32(dranges[i, 0]), jnp.float32(dranges[i, 1]), key,
            )
            d = np.zeros((H0, W0), np.float32)
            c = np.zeros((H0, W0), np.float32)
            d[:H8, :W8] = np.asarray(out.depth)
            c[:H8, :W8] = np.asarray(out.confidence)
            depths[i] = d
            confs[i] = c
        return depths, confs


def _random_init_params(key):
    """A learned MVS without trained weights produces garbage depth, so
    default construction requires real parameters."""
    raise RuntimeError(
        "PatchmatchNetMVS requires converted weights: run "
        "scripts/fetch_and_verify_weights.py (model_000007.ckpt) and pass "
        "params=load_torch_weights(path)"
    )
