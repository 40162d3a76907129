import time, numpy as np, jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from markovflow_tpu.kernels import Matern32
from markovflow_tpu.models import GaussianProcessRegression
t_len = 1_000_000
rng = np.random.default_rng(0)
x = np.linspace(0.0, 1000.0, t_len)
y = (np.sin(2.0*x) + 0.2*rng.standard_normal(t_len))[:, None]
m = GaussianProcessRegression((jnp.asarray(x, jnp.float64), jnp.asarray(y, jnp.float64)),
                              Matern32(lengthscale=0.5), jnp.asarray([[0.2]], jnp.float64))
step = jax.jit(jax.value_and_grad(lambda mm: mm.loss()))
out = step(m); jax.block_until_ready(out)
ts=[]
for _ in range(10):
    t0=time.perf_counter(); out = step(m); jax.block_until_ready(out); ts.append(time.perf_counter()-t0)
print(f"f64 grad step: {np.median(ts)*1e3:.3f} ms", flush=True)
print("loss:", float(out[0]), "(f64 CPU oracle: -168809.2002945221)", flush=True)
