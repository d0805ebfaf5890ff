import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np, jax, jax.numpy as jnp
from gtsfm_tpu.frontend.matchers.pallas_attention import fused_attention

P, h, K, dh, REP = 8, 4, 1024, 64, 50
rng = np.random.default_rng(0)
q0 = jnp.asarray(rng.normal(size=(P, h, K, dh)).astype(np.float32)).astype(jnp.bfloat16)

def timeit(name, fn, x, flops):
    r = fn(x); jax.block_until_ready(r)
    t0 = time.perf_counter(); r = fn(x); jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / REP
    print(f"{name}: {dt*1e6:.0f} us/iter, {flops/dt/1e12:.1f} TFLOP/s")

@jax.jit
def attn_loop(q):
    def body(x, _):
        o = jax.vmap(lambda a: fused_attention(a, a, a))(x)
        return o.astype(jnp.bfloat16) * 0.01, None
    y, _ = jax.lax.scan(body, q, None, length=REP)
    return y
flops_attn = 2 * 2 * P * h * K * K * dh
timeit("fused_attn", attn_loop, q0, flops_attn)

@jax.jit
def xla_attn_loop(q):
    def body(x, _):
        s = jnp.einsum("phqd,phkd->phqk", x, x, preferred_element_type=jnp.float32) * 0.125
        a = jax.nn.softmax(s, axis=-1).astype(jnp.bfloat16)
        o = jnp.einsum("phqk,phkd->phqd", a, x, preferred_element_type=jnp.float32)
        return o.astype(jnp.bfloat16) * 0.01, None
    y, _ = jax.lax.scan(body, q, None, length=REP)
    return y
timeit("xla_attn", xla_attn_loop, q0, flops_attn)

W = jnp.asarray(rng.normal(size=(512, 512)).astype(np.float32)).astype(jnp.bfloat16) * 0.04
x2 = jnp.asarray(rng.normal(size=(P * K, 512)).astype(np.float32)).astype(jnp.bfloat16)
@jax.jit
def mm_loop(x):
    def body(c, _):
        y = jax.lax.dot(c, W, preferred_element_type=jnp.float32)
        return y.astype(jnp.bfloat16), None
    y, _ = jax.lax.scan(body, x, None, length=REP)
    return y
timeit("dense512_8192", mm_loop, x2, 2 * P * K * 512 * 512)

from flax import linen as nn
ln = nn.LayerNorm()
lp = ln.init(jax.random.PRNGKey(0), x2.astype(jnp.float32))
@jax.jit
def ln_loop(x):
    def body(c, _):
        y = ln.apply(lp, c.astype(jnp.float32))
        return y.astype(jnp.bfloat16), None
    y, _ = jax.lax.scan(body, x, None, length=REP)
    return y
timeit("layernorm_8192x512", ln_loop, x2, 1)
