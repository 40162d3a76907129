import time, json, numpy as np
t00 = time.perf_counter()
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from markovflow_tpu.kernels import Matern32
from markovflow_tpu.models import GaussianProcessRegression
print(f"imports: {time.perf_counter()-t00:.1f}s", flush=True)

t_len = 1_000_000
rng = np.random.default_rng(0)
x = np.linspace(0.0, 1000.0, t_len)
y = (np.sin(2.0*x) + 0.2*rng.standard_normal(t_len))[:, None]
model = GaussianProcessRegression(
    input_data=(jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32)),
    kernel=Matern32(lengthscale=0.5, variance=1.0),
    chol_obs_covariance=jnp.asarray([[0.2]], jnp.float32))
step = jax.jit(jax.value_and_grad(lambda m: m.loss()))
t0 = time.perf_counter()
lowered = step.lower(model)
print(f"lower: {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
compiled = lowered.compile()
print(f"compile: {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
loss, g = compiled(model); loss.block_until_ready()
print(f"first run: {time.perf_counter()-t0:.1f}s loss={float(loss):.1f}", flush=True)
times=[]
for _ in range(10):
    t0=time.perf_counter(); loss, g = compiled(model); loss.block_until_ready(); times.append(time.perf_counter()-t0)
print(f"step: {np.median(times)*1e3:.2f} ms", flush=True)
