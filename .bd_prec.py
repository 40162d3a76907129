import time, numpy as np, jax
jax.config.update("jax_default_matmul_precision", "highest")
import jax.numpy as jnp
from markovflow_tpu.kernels import Matern32
from markovflow_tpu.models import GaussianProcessRegression
t_len = 1_000_000
rng = np.random.default_rng(0)
x = np.linspace(0.0, 1000.0, t_len)
y = (np.sin(2.0*x) + 0.2*rng.standard_normal(t_len))[:, None]
m = GaussianProcessRegression((jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32)),
                              Matern32(lengthscale=0.5), jnp.asarray([[0.2]], jnp.float32))
step = jax.jit(jax.value_and_grad(lambda mm: mm.loss()))
out = step(m); jax.block_until_ready(out)
ts=[]
for _ in range(10):
    t0=time.perf_counter(); out = step(m); jax.block_until_ready(out); ts.append(time.perf_counter()-t0)
print(f"highest-precision grad step: {np.median(ts)*1e3:.3f} ms", flush=True)
print("loss:", float(out[0]), "(f64 oracle: -168809.20)", flush=True)
