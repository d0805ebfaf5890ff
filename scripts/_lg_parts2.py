import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np, jax, jax.numpy as jnp
from gtsfm_tpu.frontend.matchers.pallas_attention import fused_attention

P, h, K, dh = 8, 4, 1024, 64
rng = np.random.default_rng(0)
q0 = jnp.asarray(rng.normal(size=(P, h, K, dh)).astype(np.float32)).astype(jnp.bfloat16)

fa = jax.jit(jax.vmap(lambda a: fused_attention(a, a, a)))
def xa(x):
    s = jnp.einsum("phqd,phkd->phqk", x, x, preferred_element_type=jnp.float32) * 0.125
    a = jax.nn.softmax(s, axis=-1).astype(jnp.bfloat16)
    return jnp.einsum("phqk,phkd->phqd", a, x, preferred_element_type=jnp.float32)
xa = jax.jit(xa)

flops = 2 * 2 * P * h * K * K * dh
for name, f in (("fused", fa), ("xla", xa)):
    y = f(q0); jax.block_until_ready(y)
    N = 100
    t0 = time.perf_counter()
    for _ in range(N):
        y = f(q0)
    jax.block_until_ready(y)
    _ = np.asarray(y[0, 0, 0, :4])
    dt = (time.perf_counter() - t0) / N
    print(f"{name}: {dt*1e6:.0f} us/call, {flops/dt/1e12:.1f} TFLOP/s")
