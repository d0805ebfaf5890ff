"""MASt3R-class two-view feed-forward correspondence generator in JAX.

Parity: /root/reference/gtsfm/frontend/correspondence_generator/
mast3r_correspondence_generator.py:49-330 (AsymmetricMASt3R from
thirdparty/mast3r, symmetric inference + fast reciprocal-NN matching).
Architecture follows the published CroCo-v2 / MASt3R layout so the public
checkpoint (MASt3R_ViTLarge_BaseDecoder_512_catmlpdpt_metric.pth) converts
via load_torch_weights():

  encoder   ViT-Large: 16x16 patch embed -> 1024-d, 24 blocks, 16 heads,
            RoPE100 2D rotary position (no learned pos embed), LN eps 1e-6
  decoder   asymmetric: decoder_embed Linear(1024 -> 768); two 12-block
            768-d / 12-head decoders (dec_blocks for view 1, dec_blocks2
            for view 2), each block = RoPE self-attn + RoPE cross-attn to
            the other view + MLP (CroCo DecoderBlock)
  desc head head_local_features MLP on cat(encoder tokens, final decoder
            tokens) -> (local_feat_dim + 1) * 16^2 per token, pixel-shuffled
            to per-pixel 24-d descriptors + desc_conf
            (mast3r catmlp_dpt_head.Cat_MLP_LocalFeatures_DPT_Pts3d)

The reference's correspondence path consumes ONLY desc/desc_conf — the
DPT pts3d branch of the checkpoint head is ignored for matching
(mast3r_correspondence_generator.py:316-321 discards X/C), so it is not
re-implemented here; the converter skips those weights.

Matching re-designs mast3r's fast_reciprocal_NNs (sparse_ga) as a
fixed-iteration, jit-compiled reciprocal-NN walk on the MXU: start from a
subsampled pixel grid in each view, alternate argmax descriptor-NN hops
A->B->A a fixed number of rounds, keep fixed points (mutual NNs), run
symmetrically from both views and both decoders, and merge duplicates.

Zero-egress image: no checkpoint is bundled; random init runs for shape /
pipeline tests, and tests/frontend/test_mast3r_exact.py verifies the
converter layer-for-layer against a reduced-dim torch reference with the
exact state_dict naming.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

PATCH = 16


class MASt3ROptions(NamedTuple):
    enc_dim: int = 1024
    enc_depth: int = 24
    enc_heads: int = 16
    dec_dim: int = 768
    dec_depth: int = 12
    dec_heads: int = 12
    mlp_ratio: int = 4
    local_feat_dim: int = 24
    rope_base: float = 100.0
    # matching
    subsample: int = 8
    nn_iterations: int = 6
    max_correspondences: int = 1024
    conf_threshold: float = 0.0
    # inference resolution (long edge, like the reference's 512 pipeline)
    long_edge: int = 512


# ---------------------------------------------------------------------------
# RoPE2D (croco RoPE100: per-axis GPT-NeoX rotary on each half of head dim)
# ---------------------------------------------------------------------------


def _rope_cos_sin(pos: jnp.ndarray, dim_half: int, base: float):
    """pos: (N,) int positions -> cos/sin (N, dim_half) duplicated-freq."""
    freqs = 1.0 / (base ** (jnp.arange(0, dim_half, 2, dtype=jnp.float32) / dim_half))
    ang = pos[:, None].astype(jnp.float32) * freqs[None, :]  # (N, dim_half/2)
    ang = jnp.concatenate([ang, ang], axis=-1)
    return jnp.cos(ang), jnp.sin(ang)


def _rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope2d(tokens: jnp.ndarray, positions: jnp.ndarray, base: float):
    """tokens: (B, H, N, D), D even, split into (y, x) halves; positions:
    (N, 2) integer (y, x). Croco pos_embed.RoPE2D."""
    D = tokens.shape[-1]
    dh = D // 2
    ty, tx = tokens[..., :dh], tokens[..., dh:]
    cy, sy = _rope_cos_sin(positions[:, 0], dh, base)
    cx, sx = _rope_cos_sin(positions[:, 1], dh, base)
    ty = ty * cy + _rotate_half(ty) * sy
    tx = tx * cx + _rotate_half(tx) * sx
    return jnp.concatenate([ty, tx], axis=-1)


# ---------------------------------------------------------------------------
# transformer pieces
# ---------------------------------------------------------------------------


def _ln(x, p, eps=1e-6):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _heads(x, n):
    B, N, D = x.shape
    return x.reshape(B, N, n, D // n).transpose(0, 2, 1, 3)  # (B, H, N, d)


def _merge(x):
    B, H, N, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, N, H * d)


def _self_attn(x, pos, p, num_heads, base):
    B, N, D = x.shape
    qkv = x @ p["qkv_kernel"] + p["qkv_bias"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q, k, v = _heads(q, num_heads), _heads(k, num_heads), _heads(v, num_heads)
    q = apply_rope2d(q, pos, base)
    k = apply_rope2d(k, pos, base)
    att = jax.nn.softmax(q @ k.transpose(0, 1, 3, 2) * (q.shape[-1] ** -0.5), axis=-1)
    return _merge(att @ v) @ p["proj_kernel"] + p["proj_bias"]


def _cross_attn(x, y, xpos, ypos, p, num_heads, base):
    q = _heads(x @ p["q_kernel"] + p["q_bias"], num_heads)
    k = _heads(y @ p["k_kernel"] + p["k_bias"], num_heads)
    v = _heads(y @ p["v_kernel"] + p["v_bias"], num_heads)
    q = apply_rope2d(q, xpos, base)
    k = apply_rope2d(k, ypos, base)
    att = jax.nn.softmax(q @ k.transpose(0, 1, 3, 2) * (q.shape[-1] ** -0.5), axis=-1)
    return _merge(att @ v) @ p["proj_kernel"] + p["proj_bias"]


def _mlp(x, p):
    y = jax.nn.gelu(x @ p["fc1_kernel"] + p["fc1_bias"], approximate=False)
    return y @ p["fc2_kernel"] + p["fc2_bias"]


def _enc_block(x, pos, p, num_heads, base):
    x = x + _self_attn(_ln(x, p["norm1"]), pos, p["attn"], num_heads, base)
    return x + _mlp(_ln(x, p["norm2"]), p["mlp"])


def _dec_block(x, y, xpos, ypos, p, num_heads, base):
    """CroCo DecoderBlock: self-attn, cross-attn to normed memory, MLP."""
    x = x + _self_attn(_ln(x, p["norm1"]), xpos, p["attn"], num_heads, base)
    y_ = _ln(y, p["norm_y"])
    x = x + _cross_attn(_ln(x, p["norm2"]), y_, xpos, ypos, p["cross_attn"], num_heads, base)
    return x + _mlp(_ln(x, p["norm3"]), p["mlp"])


def _grid_positions(gh: int, gw: int) -> jnp.ndarray:
    yy, xx = jnp.meshgrid(jnp.arange(gh), jnp.arange(gw), indexing="ij")
    return jnp.stack([yy.reshape(-1), xx.reshape(-1)], axis=-1)  # (N, 2)


def encode(params, images, opts: MASt3ROptions):
    """images: (B, H, W, 3) in [-1, 1] (the reference normalizes with
    mean=std=0.5). Returns (tokens (B, N, D), pos (N, 2))."""
    B, H, W, _ = images.shape
    gh, gw = H // PATCH, W // PATCH
    x = jax.lax.conv_general_dilated(
        images, params["patch_kernel"], (PATCH, PATCH), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["patch_bias"]
    x = x.reshape(B, gh * gw, -1)
    pos = _grid_positions(gh, gw)
    for blk in params["enc_blocks"]:
        x = _enc_block(x, pos, blk, opts.enc_heads, opts.rope_base)
    return _ln(x, params["enc_norm"]), pos


def decode(params, f1, f2, pos1, pos2, opts: MASt3ROptions):
    """Asymmetric decoding: view-1 tokens through dec_blocks cross-attending
    view 2, and vice versa through dec_blocks2. Returns final (normed)
    decoder tokens for both views."""
    x1 = f1 @ params["decoder_embed_kernel"] + params["decoder_embed_bias"]
    x2 = f2 @ params["decoder_embed_kernel"] + params["decoder_embed_bias"]
    for b1, b2 in zip(params["dec_blocks"], params["dec_blocks2"]):
        x1n = _dec_block(x1, x2, pos1, pos2, b1, opts.dec_heads, opts.rope_base)
        x2n = _dec_block(x2, x1, pos2, pos1, b2, opts.dec_heads, opts.rope_base)
        x1, x2 = x1n, x2n
    return _ln(x1, params["dec_norm"]), _ln(x2, params["dec_norm"])


def local_features(params, enc_tokens, dec_tokens, gh: int, gw: int, opts: MASt3ROptions):
    """head_local_features: MLP on cat(enc, dec) tokens -> per-pixel 24-d
    descriptors (L2-normalized) + desc_conf (expm1+1 softplus-like, as in
    mast3r postprocess). Returns (desc (B, H, W, D), conf (B, H, W))."""
    B = enc_tokens.shape[0]
    x = jnp.concatenate([enc_tokens, dec_tokens], axis=-1)
    p = params["head_local_features"]
    y = _mlp(x, p)  # (B, N, (D+1)*patch^2)
    D1 = opts.local_feat_dim + 1
    # torch pixel_shuffle on (B, S, D1*p^2) reshaped to (B, D1, H//p, W//p, ...)
    y = y.reshape(B, gh, gw, D1, PATCH, PATCH)
    y = y.transpose(0, 1, 4, 2, 5, 3).reshape(B, gh * PATCH, gw * PATCH, D1)
    desc = y[..., : opts.local_feat_dim]
    desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-8)
    conf = 1.0 + jnp.expm1(jax.nn.relu(y[..., -1]))  # reg_dense_conf exp mode
    return desc, conf


@partial(jax.jit, static_argnames=("opts",))
def symmetric_inference(params, img1, img2, opts: MASt3ROptions):
    """Both views through the shared encoder, both decoder directions
    (1->2 via dec_blocks/dec_blocks2 and 2->1), -> 4 dense descriptor maps
    (desc11, desc21, desc22, desc12) + confidences, matching the reference's
    symmetric_inference (mast3r_correspondence_generator.py:181-222)."""
    B, H, W, _ = img1.shape
    gh, gw = H // PATCH, W // PATCH
    f1, pos1 = encode(params, img1, opts)
    f2, pos2 = encode(params, img2, opts)
    d11, d21 = decode(params, f1, f2, pos1, pos2, opts)
    d22, d12 = decode(params, f2, f1, pos2, pos1, opts)
    desc11, conf11 = local_features(params, f1, d11, gh, gw, opts)
    desc21, conf21 = local_features(params, f2, d21, gh, gw, opts)
    desc22, conf22 = local_features(params, f2, d22, gh, gw, opts)
    desc12, conf12 = local_features(params, f1, d12, gh, gw, opts)
    return (desc11, desc21, desc22, desc12), (conf11, conf21, conf22, conf12)


# ---------------------------------------------------------------------------
# fast reciprocal NN matching (jit, fixed iterations)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("subsample", "iterations"))
def reciprocal_nn(descA: jnp.ndarray, descB: jnp.ndarray, subsample: int, iterations: int):
    """mast3r sparse_ga.fast_reciprocal_NNs re-designed for the MXU: seed a
    subsampled grid of A-pixels, alternate dense-dot argmax hops A->B->A for
    a fixed iteration count, and keep converged (mutual) pairs.

    descA/descB: (H, W, D) unit descriptors. Returns (idxA, idxB, valid)
    flat indices of mutual NNs, one slot per seed."""
    H, W, D = descA.shape
    fa = descA.reshape(-1, D)
    fb = descB.reshape(-1, D)
    ys = jnp.arange(subsample // 2, H, subsample)
    xs = jnp.arange(subsample // 2, W, subsample)
    seed = (ys[:, None] * W + xs[None, :]).reshape(-1)

    def hop(idx_a):
        sb = jnp.argmax(fa[idx_a] @ fb.T, axis=-1)
        sa = jnp.argmax(fb[sb] @ fa.T, axis=-1)
        return sa, sb

    def body(carry, _):
        idx_a, _, _ = carry
        sa, sb = hop(idx_a)
        converged = sa == idx_a
        return (sa, sb, converged), None

    sa0, sb0 = hop(seed)
    (idx_a, idx_b, converged), _ = jax.lax.scan(
        body, (sa0, sb0, sa0 == seed), None, length=iterations - 1
    )
    return idx_a, idx_b, converged


def _merge_pairs(idx1, idx2, conf, max_out: int):
    """Host-side dedup of (idx1, idx2) pairs, keep highest-confidence first
    (mast3r merge_corres role)."""
    key = idx1.astype(np.int64) * (2**31) + idx2.astype(np.int64)
    order = np.argsort(-conf, kind="stable")
    key, idx1, idx2, conf = key[order], idx1[order], idx2[order], conf[order]
    _, first = np.unique(key, return_index=True)
    first = np.sort(first)[:max_out]
    return idx1[first], idx2[first], conf[first]


# ---------------------------------------------------------------------------
# parameters
# ---------------------------------------------------------------------------


def init_params(key, opts: MASt3ROptions) -> dict:
    De, Dd = opts.enc_dim, opts.dec_dim

    def dense(k, i, o, scale=None):
        s = scale if scale is not None else 1.0 / np.sqrt(i)
        return jax.random.normal(k, (i, o)) * s, jnp.zeros(o)

    def ln(d):
        return {"scale": jnp.ones(d), "bias": jnp.zeros(d)}

    def attn_p(k, d):
        k1, k2 = jax.random.split(k)
        qkv_k, qkv_b = dense(k1, d, 3 * d)
        pr_k, pr_b = dense(k2, d, d)
        return {"qkv_kernel": qkv_k, "qkv_bias": qkv_b, "proj_kernel": pr_k, "proj_bias": pr_b}

    def cross_p(k, d):
        k1, k2, k3, k4 = jax.random.split(k, 4)
        q_k, q_b = dense(k1, d, d)
        k_k, k_b = dense(k2, d, d)
        v_k, v_b = dense(k3, d, d)
        pr_k, pr_b = dense(k4, d, d)
        return {
            "q_kernel": q_k, "q_bias": q_b, "k_kernel": k_k, "k_bias": k_b,
            "v_kernel": v_k, "v_bias": v_b, "proj_kernel": pr_k, "proj_bias": pr_b,
        }

    def mlp_p(k, d, ratio):
        k1, k2 = jax.random.split(k)
        a_k, a_b = dense(k1, d, ratio * d)
        b_k, b_b = dense(k2, ratio * d, d)
        return {"fc1_kernel": a_k, "fc1_bias": a_b, "fc2_kernel": b_k, "fc2_bias": b_b}

    n_keys = 4 + 2 * opts.enc_depth + 6 * opts.dec_depth + 3
    keys = iter(jax.random.split(key, n_keys))
    params = {
        "patch_kernel": jax.random.normal(next(keys), (PATCH, PATCH, 3, De)) * 0.02,
        "patch_bias": jnp.zeros(De),
        "enc_blocks": [
            {"norm1": ln(De), "attn": attn_p(next(keys), De), "norm2": ln(De),
             "mlp": mlp_p(next(keys), De, opts.mlp_ratio)}
            for _ in range(opts.enc_depth)
        ],
        "enc_norm": ln(De),
    }
    de_k, de_b = dense(next(keys), De, Dd)
    params["decoder_embed_kernel"] = de_k
    params["decoder_embed_bias"] = de_b
    for name in ("dec_blocks", "dec_blocks2"):
        params[name] = [
            {"norm1": ln(Dd), "attn": attn_p(next(keys), Dd), "norm2": ln(Dd),
             "cross_attn": cross_p(next(keys), Dd), "norm_y": ln(Dd),
             "norm3": ln(Dd), "mlp": mlp_p(next(keys), Dd, opts.mlp_ratio)}
            for _ in range(opts.dec_depth)
        ]
    params["dec_norm"] = ln(Dd)
    out_d = (opts.local_feat_dim + 1) * PATCH * PATCH
    cat_d = De + Dd
    k1, k2 = jax.random.split(next(keys))
    a_k, a_b = dense(k1, cat_d, 4 * cat_d)
    b_k, b_b = dense(k2, 4 * cat_d, out_d)
    params["head_local_features"] = {
        "fc1_kernel": a_k, "fc1_bias": a_b, "fc2_kernel": b_k, "fc2_bias": b_b,
    }
    return params


def load_torch_weights(path: str, opts: Optional[MASt3ROptions] = None):
    """Convert the public AsymmetricMASt3R checkpoint. Keys: patch_embed.
    proj, enc_blocks.N.*, enc_norm, decoder_embed, dec_blocks.N.* /
    dec_blocks2.N.* (croco DecoderBlock: norm1/attn, norm2/cross_attn,
    norm3/mlp, norm_y), dec_norm, downstream_head1.head_local_features.
    proj.{0,2} (Mlp fc1/fc2). DPT pts3d weights are skipped (unused by the
    correspondence path). Dims are read from tensor shapes."""
    from gtsfm_tpu.utils.torch_io import load_torch_checkpoint

    ckpt = load_torch_checkpoint(path)
    sd = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: np.asarray(v) for k, v in sd.items()}

    def t(n):
        return jnp.asarray(sd[n])

    def lin(n):
        return jnp.asarray(sd[n + ".weight"].T), jnp.asarray(sd[n + ".bias"])

    def ln(n):
        return {"scale": t(n + ".weight"), "bias": t(n + ".bias")}

    patch_w = sd["patch_embed.proj.weight"]  # (De, 3, 16, 16)
    De = patch_w.shape[0]
    Dd = sd["decoder_embed.weight"].shape[0]
    n_enc = len({k.split(".")[1] for k in sd if k.startswith("enc_blocks.")})
    n_dec = len({k.split(".")[1] for k in sd if k.startswith("dec_blocks.")})

    params = {
        "patch_kernel": jnp.asarray(patch_w.transpose(2, 3, 1, 0)),
        "patch_bias": t("patch_embed.proj.bias"),
        "enc_blocks": [],
        "enc_norm": ln("enc_norm"),
        "dec_blocks": [],
        "dec_blocks2": [],
        "dec_norm": ln("dec_norm"),
    }
    for i in range(n_enc):
        b = f"enc_blocks.{i}."
        qkv_k, qkv_b = lin(b + "attn.qkv")
        pr_k, pr_b = lin(b + "attn.proj")
        fc1_k, fc1_b = lin(b + "mlp.fc1")
        fc2_k, fc2_b = lin(b + "mlp.fc2")
        params["enc_blocks"].append(
            {"norm1": ln(b + "norm1"),
             "attn": {"qkv_kernel": qkv_k, "qkv_bias": qkv_b,
                      "proj_kernel": pr_k, "proj_bias": pr_b},
             "norm2": ln(b + "norm2"),
             "mlp": {"fc1_kernel": fc1_k, "fc1_bias": fc1_b,
                     "fc2_kernel": fc2_k, "fc2_bias": fc2_b}}
        )
    de_k, de_b = lin("decoder_embed")
    params["decoder_embed_kernel"] = de_k
    params["decoder_embed_bias"] = de_b
    for name in ("dec_blocks", "dec_blocks2"):
        for i in range(n_dec):
            b = f"{name}.{i}."
            qkv_k, qkv_b = lin(b + "attn.qkv")
            pr_k, pr_b = lin(b + "attn.proj")
            q_k, q_b = lin(b + "cross_attn.projq")
            k_k, k_b = lin(b + "cross_attn.projk")
            v_k, v_b = lin(b + "cross_attn.projv")
            cpr_k, cpr_b = lin(b + "cross_attn.proj")
            fc1_k, fc1_b = lin(b + "mlp.fc1")
            fc2_k, fc2_b = lin(b + "mlp.fc2")
            params[name].append(
                {"norm1": ln(b + "norm1"),
                 "attn": {"qkv_kernel": qkv_k, "qkv_bias": qkv_b,
                          "proj_kernel": pr_k, "proj_bias": pr_b},
                 "norm2": ln(b + "norm2"),
                 "cross_attn": {"q_kernel": q_k, "q_bias": q_b,
                                "k_kernel": k_k, "k_bias": k_b,
                                "v_kernel": v_k, "v_bias": v_b,
                                "proj_kernel": cpr_k, "proj_bias": cpr_b},
                 "norm_y": ln(b + "norm_y"),
                 "norm3": ln(b + "norm3"),
                 "mlp": {"fc1_kernel": fc1_k, "fc1_bias": fc1_b,
                         "fc2_kernel": fc2_k, "fc2_bias": fc2_b}}
            )
    fc1_k, fc1_b = lin("downstream_head1.head_local_features.proj.0")
    fc2_k, fc2_b = lin("downstream_head1.head_local_features.proj.2")
    params["head_local_features"] = {
        "fc1_kernel": fc1_k, "fc1_bias": fc1_b, "fc2_kernel": fc2_k, "fc2_bias": fc2_b,
    }
    if opts is None:
        opts = MASt3ROptions()
    local_feat_dim = fc2_b.shape[0] // (PATCH * PATCH) - 1
    # infer head counts for the published dims (ViT-L 1024/16, base dec
    # 768/12); for other (e.g. reduced test) dims keep the caller's opts
    enc_heads = De // 64 if De % 64 == 0 else opts.enc_heads
    dec_heads = Dd // 64 if Dd % 64 == 0 else opts.dec_heads
    opts = opts._replace(
        enc_dim=De, dec_dim=Dd, enc_depth=n_enc, dec_depth=n_dec,
        enc_heads=enc_heads, dec_heads=dec_heads,
        local_feat_dim=local_feat_dim,
    )
    return params, opts


# ---------------------------------------------------------------------------
# correspondence generator component
# ---------------------------------------------------------------------------


class Mast3rCorrespondenceGenerator:
    """Direct (image) correspondence generator: generate(images, pairs) ->
    {(i1, i2): (uv1, uv2)} in original pixel coordinates, pluggable into the
    KeypointAggregator path like the dense LoFTR-class matcher."""

    def __init__(
        self,
        options: MASt3ROptions = MASt3ROptions(),
        weights_path: Optional[str] = None,
        params: Optional[dict] = None,
    ):
        if weights_path is not None and params is None:
            params, options = load_torch_weights(weights_path, options)
        if params is None:
            params = init_params(jax.random.PRNGKey(0), options)
        self.options = options
        self.params = params

    def _preprocess(self, image: np.ndarray):
        """image (H, W) [0,1] or (H, W, 3) -> model input + (scale, crop)
        mapping model pixels back to original coordinates (reference
        preprocess_image: long edge -> 512, center-crop to /16)."""
        if image.ndim == 2:
            image = np.repeat(image[..., None], 3, axis=-1)
        H0, W0 = image.shape[:2]
        s = self.options.long_edge / max(H0, W0)
        H = max(PATCH, int(round(H0 * s / PATCH)) * PATCH)
        W = max(PATCH, int(round(W0 * s / PATCH)) * PATCH)
        xj = jax.image.resize(jnp.asarray(image), (H, W, 3), method="bilinear")
        xj = xj * 2.0 - 1.0  # Normalize((0.5,)*3, (0.5,)*3)
        return xj, (W0 / W, H0 / H)

    def generate(self, images, pairs) -> dict:
        """images: list/array of (H, W[,3]) float arrays; pairs: (P, 2)."""
        opts = self.options
        out = {}
        prep = {}
        for i in set(int(i) for ij in pairs for i in ij):
            prep[i] = self._preprocess(np.asarray(images[i]))
        for i1, i2 in np.asarray(pairs):
            i1, i2 = int(i1), int(i2)
            x1, (sx1, sy1) = prep[i1]
            x2, (sx2, sy2) = prep[i2]
            descs, confs = symmetric_inference(
                self.params, x1[None], x2[None], opts
            )
            d11, d21, d22, d12 = [d[0] for d in descs]
            c11, c21, c22, c12 = [c[0] for c in confs]
            H1, W1 = d11.shape[:2]
            H2, W2 = d22.shape[:2]
            idx1_all, idx2_all, conf_all = [], [], []
            for A, B, CA, CB in ((d11, d21, c11, c21), (d12, d22, c12, c22)):
                for a2b in (True, False):
                    if a2b:
                        ia, ib, ok = reciprocal_nn(A, B, opts.subsample, opts.nn_iterations)
                    else:
                        ib, ia, ok = reciprocal_nn(B, A, opts.subsample, opts.nn_iterations)
                    ia, ib, ok = np.asarray(ia), np.asarray(ib), np.asarray(ok)
                    q = np.sqrt(
                        np.asarray(CA).reshape(-1)[ia] * np.asarray(CB).reshape(-1)[ib]
                    )
                    keep = ok & (q > opts.conf_threshold)
                    idx1_all.append(ia[keep])
                    idx2_all.append(ib[keep])
                    conf_all.append(q[keep])
            if not idx1_all or sum(len(a) for a in idx1_all) == 0:
                out[(i1, i2)] = (np.zeros((0, 2), np.float32), np.zeros((0, 2), np.float32))
                continue
            idx1, idx2, _ = _merge_pairs(
                np.concatenate(idx1_all), np.concatenate(idx2_all),
                np.concatenate(conf_all), opts.max_correspondences,
            )
            uv1 = np.stack([(idx1 % W1 + 0.5) * sx1, (idx1 // W1 + 0.5) * sy1], -1)
            uv2 = np.stack([(idx2 % W2 + 0.5) * sx2, (idx2 // W2 + 0.5) * sy2], -1)
            out[(i1, i2)] = (uv1.astype(np.float32), uv2.astype(np.float32))
        return out
