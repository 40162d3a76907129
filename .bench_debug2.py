import faulthandler, sys, time
faulthandler.dump_traceback_later(90, repeat=True, file=sys.stderr)
import numpy as np
import jax
import jax.numpy as jnp
from markovflow_tpu.kernels import Matern32
from markovflow_tpu.models import GaussianProcessRegression

t_len = 1_000_000
rng = np.random.default_rng(0)
x = np.linspace(0.0, 1000.0, t_len)
print("building model", flush=True)
y = (np.sin(2.0*x) + 0.2*rng.standard_normal(t_len))[:, None]
model = GaussianProcessRegression(
    input_data=(jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32)),
    kernel=Matern32(lengthscale=0.5, variance=1.0),
    chol_obs_covariance=jnp.asarray([[0.2]], jnp.float32))
print("model built", flush=True)
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
