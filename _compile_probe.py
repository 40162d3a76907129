import time, jax, jax.numpy as jnp, numpy as np
from markovflow_tpu.kernels import Matern32
import sys
T = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
x = jnp.asarray(np.linspace(0, 100, T), jnp.float32)
k = Matern32(lengthscale=0.5, variance=1.0)

def f(ts):
    ssm = k.state_space_model(ts)
    return ssm.marginal_means

t0 = time.time()
lowered = jax.jit(f).lower(x)
t1 = time.time()
comp = lowered.compile()
t2 = time.time()
print(f"T={T} trace+lower {t1-t0:.1f}s compile {t2-t1:.1f}s", flush=True)

def g(ts):
    ssm = k.state_space_model(ts)
    m, c = ssm.marginals
    return m, c
t0 = time.time()
comp2 = jax.jit(g).lower(x).compile()
t2 = time.time()
print(f"T={T} marginals lower+compile {t2-t0:.1f}s", flush=True)
