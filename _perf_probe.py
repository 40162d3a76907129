"""Slope-protocol breakdown of the GPR training step at T=1e6 on TPU."""
import time, json
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from markovflow_tpu.kernels import Matern32
from markovflow_tpu.models import GaussianProcessRegression

T = 1_000_000
rng = np.random.default_rng(0)
x = np.linspace(0.0, 1000.0, T)
y = (np.sin(2.0 * x) + 0.2 * rng.standard_normal(T))[:, None]
model = GaussianProcessRegression(
    input_data=(jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32)),
    kernel=Matern32(lengthscale=0.5, variance=1.0),
    chol_obs_covariance=jnp.asarray([[0.2]], jnp.float32))

def slope(step, args, reps=7):
    def chain(k):
        @jax.jit
        def fn(*a):
            def body(_, acc):
                return step(acc, *a)
            return jax.lax.fori_loop(0, k, body, jnp.zeros((), jnp.float32))
        return fn
    fns = {k: chain(k) for k in (1, 2)}
    for f in fns.values(): float(f(*args))
    t = {}
    for k, f in fns.items():
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter(); float(f(*args)); ts.append(time.perf_counter()-t0)
        t[k] = float(np.median(ts))
    return (t[2]-t[1])*1e3

# 1. forward loss only (koopman -> pallas filter pipeline fused)
def fwd(acc, m):
    m2 = m.replace(observations=m.observations*(1+acc*1e-30))
    return m2.loss().astype(jnp.float32)*1e-6
print("fwd_loss_ms", slope(fwd, (model,)), flush=True)

# 2. full value_and_grad
def vg(acc, m):
    m2 = m.replace(observations=m.observations*(1+acc*1e-30))
    loss, grads = jax.value_and_grad(lambda mm: mm.loss())(m2)
    gsum = sum(jnp.sum(jnp.abs(l)) for l in jax.tree_util.tree_leaves(grads))
    return (loss+gsum).astype(jnp.float32)*1e-6
print("value_and_grad_ms", slope(vg, (model,)), flush=True)

# 3. TL inputs precomputed: raw filter pipeline
from markovflow_tpu.ops.kalman import filter_pipeline_tl
from markovflow_tpu.ops.adjoint import _adjoint_grads
F, c, Q, h, nu, lam, mask = model.kalman._tl_inputs()
print("shapes", F.shape, c.shape, Q.shape, h.shape, nu.shape, lam.shape, mask is None, flush=True)

def pipe(acc, F, c, Q, h, nu, lam):
    F2 = F*(1+acc*1e-30)
    m_f, p_f, out = filter_pipeline_tl(F2, c, Q, h, nu, lam, None, engine="pallas")
    return (out.sum()+m_f[...,0,-1].sum()).astype(jnp.float32)*1e-6
print("filter_pipeline_pallas_ms", slope(pipe, (F, c, Q, h, nu, lam)), flush=True)

# 4. element construction (kernel discretization) alone
def elems(acc, m):
    m2 = m.replace(observations=m.observations*(1+acc*1e-30))
    F, c, Q, h, nu, lam, mask = m2.kalman._tl_inputs()
    return (F.sum()+c.sum()+Q.sum()+nu.sum()+lam.sum()).astype(jnp.float32)*1e-6
print("tl_inputs_ms", slope(elems, (model,)), flush=True)

# 5. adjoint grads alone (fwd precomputed)
mask_arr = jnp.ones(F.shape[-1], bool)
m_f, p_f, out = jax.jit(lambda *a: filter_pipeline_tl(*a, None, engine="pallas"))(F, c, Q, h, nu, lam)
def adj(acc, F, c, Q, h, nu, lam, m_f, p_f):
    F2 = F*(1+acc*1e-30)
    g = _adjoint_grads(F2, c, Q, h, nu, lam, jnp.ones(F.shape[-1], F.dtype), m_f, p_f, engine="pallas")
    return sum(x.sum() for x in g).astype(jnp.float32)*1e-6
print("adjoint_grads_ms", slope(adj, (F, c, Q, h, nu, lam, m_f, p_f)), flush=True)
