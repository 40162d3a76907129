import time, jax, jax.numpy as jnp, numpy as np
import sys
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
from markovflow_tpu.kernels import Matern32
T = 100_000
x = jnp.asarray(np.linspace(0, 100, T), jnp.float32)
k = Matern32(lengthscale=0.5, variance=1.0)

# warmup: trivial jit to init backend
t0=time.time(); jax.jit(lambda a: a+1).lower(x).compile(); print(f"warmup {time.time()-t0:.1f}s", flush=True)

def g(ts):
    ssm = k.state_space_model(ts)
    return ssm.marginals
t0 = time.time()
l = jax.jit(g).lower(x); t1 = time.time()
l.compile(); t2 = time.time()
print(f"marginals lower {t1-t0:.1f}s compile {t2-t1:.1f}s", flush=True)

def f(ts):
    ssm = k.state_space_model(ts)
    return ssm.marginal_means
t0 = time.time()
l = jax.jit(f).lower(x); t1 = time.time()
l.compile(); t2 = time.time()
print(f"marginal_means lower {t1-t0:.1f}s compile {t2-t1:.1f}s", flush=True)
