"""LightGlue attention matcher in Flax — exact public-checkpoint layout.

Parity: /root/reference/gtsfm/frontend/matcher/lightglue_matcher.py:24-110
(torch LightGlue from thirdparty/LightGlue). This is a faithful port of the
public LightGlue architecture (Lindenberger et al., ICCV 2023):

- input_proj: Linear(input_dim -> dim)
- posenc: learnable Fourier positional encoding of normalized keypoint
  coords (Wr: 2 -> head_dim/2, rotary cos/sin repeat-interleaved x2)
- n_layers TransformerLayers, each a SelfBlock (fused Wqkv, rotary q/k,
  out_proj, ffn on concat[x, message]) then a CrossBlock (shared to_qk,
  to_v, to_out, same ffn shape)
- MatchAssignment: final_proj + matchability, sigmoid-log-double-softmax
  assignment matrix with dustbin row/column

All attention is batched MXU matmuls. load_torch_weights() converts the
official superpoint_lightglue.pth state_dict one-to-one (verified
layer-for-layer against a torch re-implementation in
tests/frontend/test_lightglue_exact.py). Without weights the module runs
random-init for pipeline-shape tests.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class LightGlueOptions(NamedTuple):
    dim: int = 256
    num_layers: int = 9
    num_heads: int = 4
    match_threshold: float = 0.1
    input_dim: int = 256  # SuperPoint descriptors
    # bf16 compute for the transformer matmuls (params stay f32, softmax /
    # layernorm / assignment in f32) — the MXU-native precision, matching
    # the official model's fp16 autocast inference; disable for bitwise
    # exactness tests
    mixed_precision: bool = True
    # route _attend through the fused Pallas kernel (pallas_attention.py):
    # measured 1.7x pair throughput on v5e (295 -> 498 pairs/s at K=1024)
    # by keeping the (K, K) score tile in VMEM. Safe default: _attend falls
    # back to the XLA path off-TPU and for non-128-aligned K.
    use_pallas_attention: bool = True


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    """(..., 2k) pairwise (even, odd) -> (-odd, even), official rotate_half."""
    x = x.reshape(x.shape[:-1] + (-1, 2))
    x1, x2 = x[..., 0], x[..., 1]
    return jnp.stack([-x2, x1], axis=-1).reshape(x.shape[:-2] + (-1,))


def _apply_rotary(t: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    return t * cos + _rotate_half(t) * sin


class FourierPosEnc(nn.Module):
    """LearnableFourierPositionalEncoding(M=2, head_dim): Wr (2 -> F/2, no
    bias), cos/sin each repeat-interleaved x2 to head_dim."""

    head_dim: int

    @nn.compact
    def __call__(self, coords: jnp.ndarray):  # (K, 2) -> cos/sin (K, head_dim)
        proj = nn.Dense(self.head_dim // 2, use_bias=False, name="Wr")(coords)
        cos = jnp.repeat(jnp.cos(proj), 2, axis=-1)
        sin = jnp.repeat(jnp.sin(proj), 2, axis=-1)
        return cos, sin


class _FFN(nn.Module):
    """Sequential[Linear(2d, 2d), LayerNorm(2d), GELU, Linear(2d, d)]."""

    dim: int
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(2 * self.dim, name="ffn0", dtype=self.dtype)(x)
        h = nn.LayerNorm(name="ffn1", dtype=jnp.float32)(h)
        h = nn.gelu(h, approximate=False)
        return nn.Dense(self.dim, name="ffn3", dtype=self.dtype)(h)


def _heads(x: jnp.ndarray, h: int) -> jnp.ndarray:
    # (K, D) -> (h, K, dh)
    K, D = x.shape
    return x.reshape(K, h, D // h).transpose(1, 0, 2)


def _merge(x: jnp.ndarray) -> jnp.ndarray:
    # (h, K, dh) -> (K, D)
    h, K, dh = x.shape
    return x.transpose(1, 0, 2).reshape(K, h * dh)


def _pallas_ok(*Ks, full_score: bool = True) -> bool:
    """The fused kernels need TPU + 128-aligned keypoint counts + a
    128-row f32 score strip fitting VMEM (the kernels tile queries).
    full_score is kept for the legacy shared-tile cross kernel, whose
    whole (K0, K1) tile must fit."""
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    if not all(K % 128 == 0 for K in Ks):
        return False
    rows = max(Ks) if full_score else 128
    return rows * max(Ks) * 4 <= 6 * 1024 * 1024


def _merged_heads_ok(dim: int, heads: int) -> bool:
    """The merged-layout kernel pairs two heads per program so its column
    block is 128 lanes (a Mosaic block-width requirement)."""
    return heads % 2 == 0 and (2 * (dim // heads)) % 128 == 0


def _cross_attend(qk0, qk1, v0, v1, mask0=None, mask1=None,
                  dtype=jnp.float32, use_pallas=False):
    """Bidirectional cross attention computing the similarity matrix ONCE
    (S10 = S01^T — the official LightGlue bidirectional trick). Returns
    (message into image 0, message into image 1), each (h, K, dh)."""
    if use_pallas and _pallas_ok(qk0.shape[1], qk1.shape[1]):
        from gtsfm_tpu.frontend.matchers.pallas_attention import fused_cross_attention

        return fused_cross_attention(
            qk0.astype(dtype), qk1.astype(dtype),
            v0.astype(dtype), v1.astype(dtype),
            mask0=mask0, mask1=mask1,
        )
    s = jnp.einsum(
        "hqd,hkd->hqk", qk0.astype(dtype), qk1.astype(dtype),
        preferred_element_type=jnp.float32,
    ) / jnp.sqrt(jnp.float32(qk0.shape[-1]))
    s0 = s if mask1 is None else jnp.where(mask1[None, None, :], s, -1e9)
    s1 = s if mask0 is None else jnp.where(mask0[None, :, None], s, -1e9)
    a0 = jax.nn.softmax(s0, axis=-1)
    a1 = jax.nn.softmax(s1, axis=1)  # down the image-0 axis of the SAME s
    o0 = jnp.einsum("hqk,hkd->hqd", a0.astype(dtype), v1.astype(dtype),
                    preferred_element_type=jnp.float32).astype(dtype)
    o1 = jnp.einsum("hqk,hqd->hkd", a1.astype(dtype), v0.astype(dtype),
                    preferred_element_type=jnp.float32).astype(dtype)
    return o0, o1


def _attend(q, k, v, kv_mask=None, dtype=jnp.float32, use_pallas=False):
    # q,k,v: (h, Kq/Kk, dh); score/AV matmuls in `dtype` (bf16 on the MXU
    # in mixed-precision mode), softmax accumulated in f32. With
    # use_pallas, tile-aligned K routes through the fused kernel that keeps
    # the (K, K) score tile in VMEM (pallas_attention.py) — opt-in, see
    # LightGlueOptions.use_pallas_attention.
    if (
        use_pallas
        and jax.default_backend() in ("tpu", "axon")
        and q.shape[1] % 128 == 0
        and k.shape[1] == v.shape[1]
    ):
        from gtsfm_tpu.frontend.matchers.pallas_attention import fused_attention

        return fused_attention(q.astype(dtype), k.astype(dtype), v.astype(dtype),
                               kv_mask=kv_mask)
    s = jnp.einsum(
        "hqd,hkd->hqk", q.astype(dtype), k.astype(dtype),
        preferred_element_type=jnp.float32,
    ) / jnp.sqrt(jnp.float32(q.shape[-1]))
    if kv_mask is not None:
        s = jnp.where(kv_mask[None, None, :], s, -1e9)
    a = jax.nn.softmax(s, axis=-1)
    return jnp.einsum(
        "hqk,hkd->hqd", a.astype(dtype), v.astype(dtype),
        preferred_element_type=jnp.float32,
    ).astype(dtype)


class SelfBlock(nn.Module):
    dim: int
    heads: int
    dtype: object = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, cos, sin, mask=None):
        d, h = self.dim, self.heads
        # rotary in compute dtype: cos/sin are f32 from the posenc; mixing
        # them into bf16 q/k would silently promote the whole attention
        # input back to f32 (an extra HBM round-trip per block)
        cos = cos.astype(self.dtype)
        sin = sin.astype(self.dtype)
        qkv = nn.Dense(3 * d, name="Wqkv", dtype=self.dtype)(x)  # (K, 3d)
        # official layout: unflatten(-1, (heads, dh, 3))
        K = x.shape[0]
        qkv = qkv.reshape(K, h, d // h, 3)
        if (self.use_pallas and _pallas_ok(K, full_score=False)
                and _merged_heads_ok(d, h)):
            # MERGED-layout path: heads stay in column slices of (K, d) —
            # never materializes the (h, K, dh) transpose in HBM (14 such
            # copies/layer measured ~10% of matcher device time). Rotary
            # pairs adjacent lanes, and dh is even, so applying it on the
            # merged tensor with head-tiled cos/sin is per-head exact.
            from gtsfm_tpu.frontend.matchers.pallas_attention import (
                fused_attention_merged,
            )

            q = qkv[..., 0].reshape(K, d)
            k = qkv[..., 1].reshape(K, d)
            v = qkv[..., 2].reshape(K, d)
            cos_t = jnp.tile(cos, (1, h))
            sin_t = jnp.tile(sin, (1, h))
            q = q * cos_t + _rotate_half(q) * sin_t
            k = k * cos_t + _rotate_half(k) * sin_t
            ctx = fused_attention_merged(q, k, v, heads=h, kv_mask=mask)
            message = nn.Dense(d, name="out_proj", dtype=self.dtype)(ctx)
        else:
            q, k, v = qkv[..., 0], qkv[..., 1], qkv[..., 2]  # (K, h, dh)
            q = q.transpose(1, 0, 2)
            k = k.transpose(1, 0, 2)
            v = v.transpose(1, 0, 2)
            q = _apply_rotary(q, cos[None], sin[None])
            k = _apply_rotary(k, cos[None], sin[None])
            ctx = _attend(q, k, v, kv_mask=mask, dtype=self.dtype,
                          use_pallas=self.use_pallas)
            message = nn.Dense(d, name="out_proj", dtype=self.dtype)(_merge(ctx))
        return x + _FFN(d, name="ffn", dtype=self.dtype)(
            jnp.concatenate([x, message.astype(x.dtype)], axis=-1)
        )


class CrossBlock(nn.Module):
    dim: int
    heads: int
    dtype: object = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x0, x1, mask0=None, mask1=None):
        d, h = self.dim, self.heads
        to_qk = nn.Dense(d, name="to_qk", dtype=self.dtype)
        to_v = nn.Dense(d, name="to_v", dtype=self.dtype)
        to_out = nn.Dense(d, name="to_out", dtype=self.dtype)
        ffn = _FFN(d, name="ffn", dtype=self.dtype)
        if (self.use_pallas
                and _pallas_ok(x0.shape[0], x1.shape[0], full_score=False)
                and _merged_heads_ok(d, h)):
            # merged layout: projections feed the kernel directly, messages
            # come back (K, d) — zero head transposes in HBM
            from gtsfm_tpu.frontend.matchers.pallas_attention import (
                fused_cross_attention_merged,
            )

            ctx0, ctx1 = fused_cross_attention_merged(
                to_qk(x0), to_qk(x1), to_v(x0), to_v(x1), heads=h,
                mask0=mask0, mask1=mask1,
            )
            m0 = to_out(ctx0)
            m1 = to_out(ctx1)
        else:
            qk0 = _heads(to_qk(x0), h)
            qk1 = _heads(to_qk(x1), h)
            v0 = _heads(to_v(x0), h)
            v1 = _heads(to_v(x1), h)
            ctx0, ctx1 = _cross_attend(qk0, qk1, v0, v1, mask0=mask0,
                                       mask1=mask1, dtype=self.dtype,
                                       use_pallas=self.use_pallas)
            m0 = to_out(_merge(ctx0))
            m1 = to_out(_merge(ctx1))
        x0 = x0 + ffn(jnp.concatenate([x0, m0.astype(x0.dtype)], axis=-1))
        x1 = x1 + ffn(jnp.concatenate([x1, m1.astype(x1.dtype)], axis=-1))
        return x0, x1


class MatchAssignment(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x0, x1):
        d = self.dim
        # final_proj and matchability are shared between the two images
        final_proj = nn.Dense(d, name="final_proj")
        matchability = nn.Dense(1, name="matchability")
        md0 = final_proj(x0) / d**0.25
        md1 = final_proj(x1) / d**0.25
        sim = jnp.einsum("md,nd->mn", md0, md1)
        z0 = matchability(x0)[:, 0]
        z1 = matchability(x1)[:, 0]
        m, n = sim.shape
        cert = jax.nn.log_sigmoid(z0)[:, None] + jax.nn.log_sigmoid(z1)[None, :]
        scores0 = jax.nn.log_softmax(sim, axis=1)
        scores1 = jax.nn.log_softmax(sim, axis=0)
        scores = jnp.full((m + 1, n + 1), 0.0, sim.dtype)
        scores = scores.at[:m, :n].set(scores0 + scores1 + cert)
        scores = scores.at[:m, n].set(jax.nn.log_sigmoid(-z0))
        scores = scores.at[m, :n].set(jax.nn.log_sigmoid(-z1))
        return scores, z0, z1


class _TransformerLayer(nn.Module):
    """One LightGlue layer (shared-weight self-attention on both images +
    cross-attention), shaped for nn.scan: the 9 layers compile ONCE instead
    of being unrolled (9x faster XLA compile at identical math)."""

    dim: int
    heads: int
    dtype: object
    use_pallas: bool = False

    @nn.compact
    def __call__(self, carry, _):
        x0, x1, cos0, sin0, cos1, sin1, m0, m1 = carry
        sb = SelfBlock(self.dim, self.heads, dtype=self.dtype,
                       use_pallas=self.use_pallas, name="self")
        x0 = sb(x0, cos0, sin0, mask=m0)
        x1 = sb(x1, cos1, sin1, mask=m1)
        x0, x1 = CrossBlock(self.dim, self.heads, dtype=self.dtype,
                            use_pallas=self.use_pallas, name="cross")(
            x0, x1, mask0=m0, mask1=m1
        )
        return (x0, x1, cos0, sin0, cos1, sin1, m0, m1), None


class LightGlueNet(nn.Module):
    opts: LightGlueOptions

    @nn.compact
    def __call__(self, desc0, desc1, coords0, coords1, mask0=None, mask1=None):
        """desc: (K, D_in); coords: (K, 2) normalized (center/scale).
        Returns (log-assignment (K0+1, K1+1), matchability0, matchability1).
        """
        o = self.opts
        cdtype = jnp.bfloat16 if o.mixed_precision else jnp.float32
        proj = nn.Dense(o.dim, name="input_proj")
        # keep the RESIDUAL STREAM in the compute dtype too: with an f32
        # stream every block boundary pays an (K, 2d) convert+add HBM pass
        # (measured ~28% of the matcher's device time). LayerNorms inside
        # the ffns still normalize in f32; the assignment head gets f32.
        x0 = proj(desc0).astype(cdtype)
        x1 = proj(desc1).astype(cdtype)
        posenc = FourierPosEnc(o.dim // o.num_heads, name="posenc")
        cos0, sin0 = posenc(coords0)
        cos1, sin1 = posenc(coords1)
        Layers = nn.scan(
            _TransformerLayer,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=o.num_layers,
        )
        carry = (x0, x1, cos0, sin0, cos1, sin1, mask0, mask1)
        carry, _ = Layers(o.dim, o.num_heads, cdtype, o.use_pallas_attention,
                          name="layers")(carry, None)
        x0, x1 = carry[0], carry[1]
        scores, z0, z1 = MatchAssignment(o.dim, name="assign")(
            x0.astype(jnp.float32), x1.astype(jnp.float32)
        )
        return scores, z0, z1


def normalize_keypoints(coords: jnp.ndarray, image_size) -> jnp.ndarray:
    """Official LightGlue normalization: shift by size/2, divide by
    max(size)/2 (lightglue.normalize_keypoints)."""
    size = jnp.asarray(image_size, jnp.float32)  # (w, h)
    shift = size / 2.0
    scale = jnp.max(size) / 2.0
    return (coords - shift) / scale


class LightGlueMatcher:
    """match(desc0, desc1, coords0, coords1, mask0, mask1, image_size) ->
    (match_idx (K0,), match_mask (K0,), scores (K0,)) — the same contract
    as matchers.mutual_nn.match_descriptors."""

    def __init__(
        self,
        options: LightGlueOptions = LightGlueOptions(),
        params=None,
        example_dim: Optional[int] = None,
    ):
        self.options = options
        if example_dim is not None and params is None:
            options = options._replace(input_dim=example_dim)
            self.options = options
        self.net = LightGlueNet(options)
        if params is None:
            k = jax.random.PRNGKey(0)
            params = self.net.init(
                k,
                jnp.zeros((8, options.input_dim)), jnp.zeros((8, options.input_dim)),
                jnp.zeros((8, 2)), jnp.zeros((8, 2)),
            )["params"]
        self.params = params
        self._fwd = jax.jit(
            lambda p, d0, d1, c0, c1, m0, m1: self.net.apply(
                {"params": p}, d0, d1, c0, c1, m0, m1
            )
        )
        self._fwd_batch = jax.jit(
            jax.vmap(
                lambda d0, d1, c0, c1, m0, m1: self.net.apply(
                    {"params": self.params}, d0, d1, c0, c1, m0, m1
                )
            )
        )

    # ------------------------------------------------------------------
    def _postprocess(self, z, mask0, mask1):
        """z: (K0+1, K1+1) log-assignment (un-batched)."""
        zi = z[:-1, :-1]
        neg = jnp.asarray(-1e9, zi.dtype)
        zi = jnp.where(mask0[:, None] & mask1[None, :], zi, neg)
        nn12 = jnp.argmax(zi, axis=1)
        nn21 = jnp.argmax(zi, axis=0)
        mutual = jnp.arange(zi.shape[0]) == nn21[nn12]
        score = jnp.exp(jnp.max(zi, axis=1))
        ok = mask0 & mutual & (score > self.options.match_threshold)
        return jnp.where(ok, nn12, -1).astype(jnp.int32), ok, score.astype(jnp.float32)

    def match(self, desc0, desc1, coords0, coords1, mask0, mask1, image_size):
        c0 = normalize_keypoints(coords0, image_size)
        c1 = normalize_keypoints(coords1, image_size)
        z, _z0, _z1 = self._fwd(self.params, desc0, desc1, c0, c1, mask0, mask1)
        return self._postprocess(z, mask0, mask1)

    def match_batch(self, desc0, desc1, coords0, coords1, mask0, mask1, image_size):
        """Batched over pairs: desc [P, K, D], coords [P, K, 2], mask [P, K]
        -> (match_idx i32 [P, K], match_mask bool [P, K], scores f32 [P, K]).
        Shaped for run_two_view_batch's precomputed-match inputs."""
        c0 = normalize_keypoints(coords0, image_size)
        c1 = normalize_keypoints(coords1, image_size)
        z, _z0, _z1 = self._fwd_batch(desc0, desc1, c0, c1, mask0, mask1)
        return jax.vmap(self._postprocess)(z, mask0, mask1)


# ---------------------------------------------------------------------------
# torch checkpoint conversion
# ---------------------------------------------------------------------------

def convert_torch_state_dict(sd, opts: LightGlueOptions):
    """Map the official LightGlue state_dict to Flax params.

    Official keys (weights superpoint_lightglue.pth):
      input_proj.{weight,bias}
      posenc.Wr.weight
      transformers.{i}.self_attn.{Wqkv,out_proj}.{weight,bias}
      transformers.{i}.self_attn.ffn.{0,1,3}.{weight,bias}
      transformers.{i}.cross_attn.{to_qk,to_v,to_out}.{weight,bias}
      transformers.{i}.cross_attn.ffn.{0,1,3}.{weight,bias}
      log_assignment.{i}.{matchability,final_proj}.{weight,bias}
      token_confidence.{i}.token.{0}.{weight,bias}   (unused: early-exit)
    Only the LAST log_assignment head is used at full depth.
    """

    def lin(prefix):
        w = np.asarray(sd[f"{prefix}.weight"], np.float32)
        out = {"kernel": jnp.asarray(w.T)}
        if f"{prefix}.bias" in sd:
            out["bias"] = jnp.asarray(np.asarray(sd[f"{prefix}.bias"], np.float32))
        return out

    def ln(prefix):
        return {
            "scale": jnp.asarray(np.asarray(sd[f"{prefix}.weight"], np.float32)),
            "bias": jnp.asarray(np.asarray(sd[f"{prefix}.bias"], np.float32)),
        }

    params = {
        "input_proj": lin("input_proj"),
        "posenc": {"Wr": {"kernel": jnp.asarray(np.asarray(sd["posenc.Wr.weight"], np.float32).T)}},
    }
    L = opts.num_layers
    per_layer = []
    for i in range(L):
        sa = f"transformers.{i}.self_attn"
        ca = f"transformers.{i}.cross_attn"
        per_layer.append(
            {
                "self": {
                    "Wqkv": lin(f"{sa}.Wqkv"),
                    "out_proj": lin(f"{sa}.out_proj"),
                    "ffn": {
                        "ffn0": lin(f"{sa}.ffn.0"),
                        "ffn1": ln(f"{sa}.ffn.1"),
                        "ffn3": lin(f"{sa}.ffn.3"),
                    },
                },
                "cross": {
                    "to_qk": lin(f"{ca}.to_qk"),
                    "to_v": lin(f"{ca}.to_v"),
                    "to_out": lin(f"{ca}.to_out"),
                    "ffn": {
                        "ffn0": lin(f"{ca}.ffn.0"),
                        "ffn1": ln(f"{ca}.ffn.1"),
                        "ffn3": lin(f"{ca}.ffn.3"),
                    },
                },
            }
        )
    # nn.scan layout: per-layer trees stacked on a leading layer axis
    params["layers"] = jax.tree.map(lambda *xs: jnp.stack(xs), *per_layer)
    last = L - 1
    params["assign"] = {
        "final_proj": lin(f"log_assignment.{last}.final_proj"),
        "matchability": lin(f"log_assignment.{last}.matchability"),
    }
    return params


def load_torch_weights(path: str, opts: LightGlueOptions = LightGlueOptions()):
    """Load the official superpoint_lightglue.pth -> (Flax params, opts)."""
    from gtsfm_tpu.utils.torch_io import load_torch_checkpoint

    sd = load_torch_checkpoint(path)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: v for k, v in sd.items()}
    n_layers = 1 + max(
        int(k.split(".")[1]) for k in sd if k.startswith("transformers.")
    )
    dim = int(sd["input_proj.weight"].shape[0])
    input_dim = int(sd["input_proj.weight"].shape[1])
    head_dim = 2 * int(sd["posenc.Wr.weight"].shape[0])  # Wr: 2 -> head_dim/2
    opts = opts._replace(
        num_layers=n_layers, dim=dim, input_dim=input_dim,
        num_heads=dim // head_dim,
    )
    return convert_torch_state_dict(sd, opts), opts
