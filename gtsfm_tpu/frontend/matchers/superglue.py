"""SuperGlue attention matcher in Flax — exact public-checkpoint layout.

Parity: /root/reference/gtsfm/frontend/matcher/superglue_matcher.py:30-110
(torch SuperGlue from thirdparty/SuperGluePretrainedNetwork). Faithful port
of the public architecture (Sarlin et al., CVPR 2020):

- KeypointEncoder: MLP([3, 32, 64, 128, 256, 256]) over [x, y, score],
  Conv1d(k=1) + BatchNorm1d + ReLU stacks (BN folded into affine pairs at
  conversion — exact in eval mode); output ADDED to the raw descriptors
- AttentionalGNN: 18 alternating self/cross AttentionalPropagation layers,
  each 4-head attention (separate q/k/v Conv1d projections + merge) and a
  residual MLP([512, 512, 256]) on concat[x, message]
- final_proj Conv1d + learned dustbin score alpha
- log-domain optimal transport (Sinkhorn) with dustbin row/column, 20
  iterations per the reference matcher config; mutual-max + threshold

All ops are batched MXU matmuls; padded keypoints are handled by masking
attention and the score matrix and using true counts as the OT marginals.
load_torch_weights() converts the official superglue_{indoor,outdoor}.pth
state_dict one-to-one (verified layer-for-layer against a torch
re-implementation in tests/frontend/test_superglue_exact.py).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class SuperGlueOptions(NamedTuple):
    dim: int = 256
    num_layers: int = 9  # self+cross pairs (18 propagation layers)
    num_heads: int = 4
    sinkhorn_iterations: int = 20  # reference matcher default
    match_threshold: float = 0.2
    encoder_layers: tuple = (32, 64, 128, 256)


class _ConvBNStack(nn.Module):
    """MLP of 1x1 convs with folded eval-mode BatchNorm (affine) + ReLU on
    all but the last layer. Operates on (K, C) tokens."""

    channels: tuple  # output channels per conv

    @nn.compact
    def __call__(self, x):
        n = len(self.channels)
        for i, c in enumerate(self.channels):
            x = nn.Dense(c, name=f"conv{i}")(x)
            if i < n - 1:
                scale = self.param(f"bn{i}_scale", nn.initializers.ones, (c,))
                shift = self.param(f"bn{i}_shift", nn.initializers.zeros, (c,))
                x = x * scale + shift
                x = nn.relu(x)
        return x


class KeypointEncoderSG(nn.Module):
    opts: SuperGlueOptions

    @nn.compact
    def __call__(self, kpts, scores):  # (K, 2), (K,)
        inp = jnp.concatenate([kpts, scores[:, None]], axis=-1)
        chans = tuple(self.opts.encoder_layers) + (self.opts.dim,)
        return _ConvBNStack(chans, name="encoder")(inp)


class _MHA(nn.Module):
    dim: int
    heads: int

    @nn.compact
    def __call__(self, x, source, src_mask=None):
        d, h = self.dim, self.heads
        dh = d // h
        q = nn.Dense(d, name="proj_q")(x)
        k = nn.Dense(d, name="proj_k")(source)
        v = nn.Dense(d, name="proj_v")(source)

        def heads_(t):  # (K, d) -> (h, K, dh); official splits channels as
            # (dh, h) — view(b, dim, heads, n) — so the head index is the
            # INNER stride of the channel axis
            return t.reshape(-1, dh, h).transpose(2, 0, 1)

        qh, kh, vh = heads_(q), heads_(k), heads_(v)
        s = jnp.einsum("hqd,hkd->hqk", qh, kh) / jnp.sqrt(jnp.float32(dh))
        if src_mask is not None:
            s = jnp.where(src_mask[None, None, :], s, -1e9)
        a = jax.nn.softmax(s, axis=-1)
        ctx = jnp.einsum("hqk,hkd->hqd", a, vh)
        merged = ctx.transpose(1, 2, 0).reshape(-1, d)  # (K, dh, h) -> (K, d)
        return nn.Dense(d, name="merge")(merged)


class AttentionalPropagationSG(nn.Module):
    dim: int
    heads: int

    @nn.compact
    def __call__(self, x, source, src_mask=None):
        message = _MHA(self.dim, self.heads, name="attn")(x, source, src_mask)
        h = jnp.concatenate([x, message], axis=-1)
        return _ConvBNStack((2 * self.dim, self.dim), name="mlp")(h)


def log_sinkhorn(Z, log_mu, log_nu, iters: int):
    """Log-domain Sinkhorn normalization (superglue.py:log_sinkhorn_iterations)."""

    def body(_, uv):
        u, v = uv
        u = log_mu - jax.nn.logsumexp(Z + v[None, :], axis=1)
        v = log_nu - jax.nn.logsumexp(Z + u[:, None], axis=0)
        return u, v

    u, v = jax.lax.fori_loop(
        0, iters, body, (jnp.zeros_like(log_mu), jnp.zeros_like(log_nu))
    )
    return Z + u[:, None] + v[None, :]


def log_optimal_transport(scores, alpha, iters: int, m_count=None, n_count=None,
                          row_mask=None, col_mask=None):
    """Dustbin-augmented entropic OT in log space (superglue.py:
    log_optimal_transport). m_count/n_count: true (unpadded) keypoint
    counts used as marginals; default = full sizes. row_mask/col_mask mark
    real (unpadded) slots: padded slots get ZERO marginal mass (-inf in
    log space) and their dustbin couplings are masked, so Sinkhorn on a
    padded problem reproduces the unpadded reference result exactly."""
    m, n = scores.shape
    ms = jnp.float32(m) if m_count is None else m_count.astype(jnp.float32)
    ns = jnp.float32(n) if n_count is None else n_count.astype(jnp.float32)
    neg = jnp.asarray(-1e9, scores.dtype)
    bins0 = jnp.full((m, 1), alpha, scores.dtype)
    bins1 = jnp.full((1, n), alpha, scores.dtype)
    if row_mask is not None:
        bins0 = jnp.where(row_mask[:, None], bins0, neg)
    if col_mask is not None:
        bins1 = jnp.where(col_mask[None, :], bins1, neg)
    alpha_c = jnp.full((1, 1), alpha, scores.dtype)
    couplings = jnp.concatenate(
        [
            jnp.concatenate([scores, bins0], axis=1),
            jnp.concatenate([bins1, alpha_c], axis=1),
        ],
        axis=0,
    )
    norm = -jnp.log(ms + ns)
    row_m = jnp.full((m,), norm)
    col_m = jnp.full((n,), norm)
    if row_mask is not None:
        row_m = jnp.where(row_mask, row_m, -jnp.inf)
    if col_mask is not None:
        col_m = jnp.where(col_mask, col_m, -jnp.inf)
    log_mu = jnp.concatenate([row_m, jnp.log(ns)[None] + norm])
    log_nu = jnp.concatenate([col_m, jnp.log(ms)[None] + norm])
    Z = log_sinkhorn(couplings, log_mu, log_nu, iters)
    return Z - norm


class SuperGlueNet(nn.Module):
    opts: SuperGlueOptions

    @nn.compact
    def __call__(self, desc0, desc1, kpts0, kpts1, scores0, scores1,
                 mask0=None, mask1=None):
        """desc: (K, 256); kpts: (K, 2) normalized; scores: (K,) detector
        confidences. Returns the (K0+1, K1+1) log-assignment matrix."""
        o = self.opts
        kenc = KeypointEncoderSG(o, name="kenc")
        x0 = desc0 + kenc(kpts0, scores0)
        x1 = desc1 + kenc(kpts1, scores1)
        for i in range(2 * o.num_layers):
            layer = AttentionalPropagationSG(o.dim, o.num_heads, name=f"gnn{i}")
            if i % 2 == 1:  # cross
                src0, src1, m0, m1 = x1, x0, mask1, mask0
            else:  # self
                src0, src1, m0, m1 = x0, x1, mask0, mask1
            x0 = x0 + layer(x0, src0, m0)
            x1 = x1 + layer(x1, src1, m1)
        proj = nn.Dense(o.dim, name="final_proj")
        md0, md1 = proj(x0), proj(x1)
        s = jnp.einsum("md,nd->mn", md0, md1) / jnp.sqrt(jnp.float32(o.dim))
        alpha = self.param("bin_score", nn.initializers.ones, ())
        if mask0 is not None:
            s = jnp.where(mask0[:, None] & mask1[None, :], s, -1e9)
            mc = jnp.sum(mask0.astype(jnp.int32))
            nc = jnp.sum(mask1.astype(jnp.int32))
        else:
            mc = nc = None
        return log_optimal_transport(
            s, alpha, o.sinkhorn_iterations, mc, nc,
            row_mask=mask0, col_mask=mask1,
        )


def normalize_keypoints_sg(coords: jnp.ndarray, image_size) -> jnp.ndarray:
    """Official SuperGlue normalization: center-shift, divide by
    0.7 * max(size) (superglue.py:normalize_keypoints)."""
    size = jnp.asarray(image_size, jnp.float32)  # (w, h)
    center = size / 2.0
    scaling = jnp.max(size) * 0.7
    return (coords - center[None, :]) / scaling


class SuperGlueMatcher:
    """Same contract as LightGlueMatcher / mutual_nn.match_descriptors:
    match(...) -> (match_idx (K0,), match_mask (K0,), scores (K0,))."""

    def __init__(self, options: SuperGlueOptions = SuperGlueOptions(),
                 params=None, kp_scores=None):
        self.options = options
        self.net = SuperGlueNet(options)
        if params is None:
            k = jax.random.PRNGKey(0)
            z = jnp.zeros((8, options.dim))
            params = self.net.init(
                k, z, z, jnp.zeros((8, 2)), jnp.zeros((8, 2)),
                jnp.zeros(8), jnp.zeros(8),
            )["params"]
        self.params = params
        self._fwd_batch = jax.jit(
            jax.vmap(
                lambda d0, d1, c0, c1, s0, s1, m0, m1: self.net.apply(
                    {"params": self.params}, d0, d1, c0, c1, s0, s1, m0, m1
                )
            )
        )

    def _postprocess(self, z, mask0, mask1):
        zi = z[:-1, :-1]
        neg = jnp.asarray(-1e9, zi.dtype)
        zi = jnp.where(mask0[:, None] & mask1[None, :], zi, neg)
        nn12 = jnp.argmax(zi, axis=1)
        nn21 = jnp.argmax(zi, axis=0)
        mutual = jnp.arange(zi.shape[0]) == nn21[nn12]
        score = jnp.exp(jnp.max(zi, axis=1))
        ok = mask0 & mutual & (score > self.options.match_threshold)
        return jnp.where(ok, nn12, -1).astype(jnp.int32), ok, score.astype(jnp.float32)

    def match_batch(self, desc0, desc1, coords0, coords1, mask0, mask1,
                    image_size, kp_scores0=None, kp_scores1=None):
        c0 = normalize_keypoints_sg(coords0, image_size)
        c1 = normalize_keypoints_sg(coords1, image_size)
        if kp_scores0 is None:
            kp_scores0 = mask0.astype(jnp.float32)
            kp_scores1 = mask1.astype(jnp.float32)
        z = self._fwd_batch(desc0, desc1, c0, c1, kp_scores0, kp_scores1, mask0, mask1)
        return jax.vmap(self._postprocess)(z, mask0, mask1)

    def match(self, desc0, desc1, coords0, coords1, mask0, mask1, image_size):
        out = self.match_batch(
            desc0[None], desc1[None], coords0[None], coords1[None],
            mask0[None], mask1[None], image_size,
        )
        return jax.tree.map(lambda a: a[0], out)


# ---------------------------------------------------------------------------
# torch checkpoint conversion
# ---------------------------------------------------------------------------

def convert_torch_state_dict(sd, opts: SuperGlueOptions = SuperGlueOptions()):
    """Official superglue_{indoor,outdoor}.pth state_dict -> Flax params.

    Conv1d(k=1) weights (out, in, 1) transpose to Dense kernels (in, out);
    eval-mode BatchNorm1d folds into (scale, shift) affine pairs."""

    def to_np(v):
        return np.asarray(v, np.float32) if not hasattr(v, "detach") else v.detach().cpu().numpy().astype(np.float32)

    def conv(prefix):
        w = to_np(sd[f"{prefix}.weight"])[:, :, 0]  # (out, in)
        return {
            "kernel": jnp.asarray(w.T),
            "bias": jnp.asarray(to_np(sd[f"{prefix}.bias"])),
        }

    def bn_affine(prefix, eps=1e-5):
        w = to_np(sd[f"{prefix}.weight"])
        b = to_np(sd[f"{prefix}.bias"])
        mean = to_np(sd[f"{prefix}.running_mean"])
        var = to_np(sd[f"{prefix}.running_var"])
        scale = w / np.sqrt(var + eps)
        return jnp.asarray(scale), jnp.asarray(b - mean * scale)

    def stack(prefix, n_convs):
        # Sequential indices: conv at 3*i, bn at 3*i+1 for all but last conv
        out = {}
        seq_idx = 0
        for i in range(n_convs):
            out[f"conv{i}"] = conv(f"{prefix}.{seq_idx}")
            if i < n_convs - 1:
                scale, shift = bn_affine(f"{prefix}.{seq_idx + 1}")
                out[f"bn{i}_scale"] = scale
                out[f"bn{i}_shift"] = shift
                seq_idx += 3
        return out

    params = {
        "kenc": {"encoder": stack("kenc.encoder", len(opts.encoder_layers) + 1)},
        "final_proj": conv("final_proj"),
        "bin_score": jnp.asarray(to_np(sd["bin_score"]).reshape(())),
    }
    for i in range(2 * opts.num_layers):
        g = f"gnn.layers.{i}"
        params[f"gnn{i}"] = {
            "attn": {
                "proj_q": conv(f"{g}.attn.proj.0"),
                "proj_k": conv(f"{g}.attn.proj.1"),
                "proj_v": conv(f"{g}.attn.proj.2"),
                "merge": conv(f"{g}.attn.merge"),
            },
            "mlp": stack(f"{g}.mlp", 2),
        }
    return {"params": params}


def load_torch_weights(path: str, opts: SuperGlueOptions = SuperGlueOptions()):
    from gtsfm_tpu.utils.torch_io import load_torch_checkpoint

    sd = load_torch_checkpoint(path)
    return convert_torch_state_dict(sd, opts)
