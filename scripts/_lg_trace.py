import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np, jax, jax.numpy as jnp
from gtsfm_tpu.frontend.matchers.lightglue import LightGlueNet, LightGlueOptions

rng = np.random.default_rng(0)
net = LightGlueNet(LightGlueOptions())
K, P, REP = 1024, 8, 30
d0 = jnp.asarray(rng.normal(size=(K, 256)).astype(np.float32))
c0 = jnp.asarray(rng.uniform(-1, 1, (K, 2)).astype(np.float32))
params = net.init(jax.random.PRNGKey(0), d0, d0, c0, c0)
d0b = jnp.asarray(rng.normal(size=(P, K, 256)).astype(np.float32))
c0b = jnp.asarray(rng.uniform(-1, 1, (P, K, 2)).astype(np.float32))
vnet = jax.vmap(lambda a, b, c, d: net.apply(params, a, b, c, d))
@jax.jit
def run(x):
    def body(i, acc):
        z, _, _ = vnet(x + 1e-9 * acc, d0b, c0b, c0b)
        return acc + jnp.sum(z[:, -1, :])
    return jax.lax.fori_loop(0, REP, body, jnp.float32(0.0))
float(run(d0b))
with jax.profiler.trace("/tmp/lgtrace"):
    float(run(d0b))
print("done")
