"""All headline benchmarks in one run (honest slope protocol throughout).

Usage: python benchmarks/run_all.py  [--quick]

Prints one JSON line per metric.  See benchmarks/harness.py for why naive
timing loops are invalid on detached TPU runtimes: every workload here runs
K times inside one jit with a chained data dependency, and the per-step
time is the slope between K=1 and K=2 (larger K crashes this runtime's
worker), with a host readback as the only trusted clock.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _slope(step, args, reps=9):
    import jax
    import jax.numpy as jnp

    def chain(k):
        @jax.jit
        def fn(*a):
            def body(_, acc):
                return step(acc, *a)
            return jax.lax.fori_loop(0, k, body, jnp.zeros((), jnp.float32))
        return fn

    fns = {k: chain(k) for k in (1, 2)}
    for fn in fns.values():
        float(fn(*args))
    t = {}
    for k, fn in fns.items():
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(*args))
            ts.append(time.perf_counter() - t0)
        t[k] = float(np.median(ts))
    return (t[2] - t[1]) * 1e3


def _emit(metric, ms, **extra):
    print(json.dumps({"metric": metric, "value": round(ms, 4), "unit": "ms",
                      **extra}), flush=True)


def main():
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from markovflow_tpu.kernels import Matern12, Matern32
    from markovflow_tpu.likelihoods import Gaussian
    from markovflow_tpu.models import GaussianProcessRegression
    from markovflow_tpu.models.variational_cvi import CVIGaussianProcess

    quick = "--quick" in sys.argv
    t_len = 100_000 if quick else 1_000_000
    dtype = jnp.float32
    rng = np.random.default_rng(0)
    x = np.linspace(0.0, t_len / 1000.0, t_len)
    y = (np.sin(2.0 * x) + 0.2 * rng.standard_normal(t_len))[:, None]
    xj, yj = jnp.asarray(x, dtype), jnp.asarray(y, dtype)

    def grad_step(acc, m):
        m2 = m.replace(observations=m.observations * (1 + acc * 1e-30))
        loss, grads = jax.value_and_grad(lambda mm: mm.loss())(m2)
        gsum = sum(jnp.sum(jnp.abs(l))
                   for l in jax.tree_util.tree_leaves(grads))
        return (loss + gsum).astype(jnp.float32) * 1e-6

    # 1. GPR training step (the north star)
    gpr = GaussianProcessRegression(
        input_data=(xj, yj), kernel=Matern32(lengthscale=0.5, variance=1.0),
        chol_obs_covariance=jnp.asarray([[0.2]], dtype))
    ms = _slope(grad_step, (gpr,))
    _emit(f"gpr_train_step_T{t_len}_matern32", ms,
          vs_50ms_target=round(50.0 / ms, 2))

    # 2. GPR training step with autodiff VJP (for the record)
    ms = _slope(grad_step, (gpr.replace(grad_engine="autodiff"),))
    _emit(f"gpr_train_step_T{t_len}_autodiff_vjp", ms)

    # 3. sum kernel (state_dim 4)
    gpr4 = GaussianProcessRegression(
        input_data=(xj, yj),
        kernel=Matern32(lengthscale=0.5, variance=1.0)
        + Matern12(lengthscale=3.0, variance=0.5),
        chol_obs_covariance=jnp.asarray([[0.2]], dtype))
    ms = _slope(grad_step, (gpr4,))
    _emit(f"gpr_train_step_T{t_len}_sum_kernel_d4", ms)

    # 4. CVI full iteration (site update + ELBO value_and_grad)
    cvi = CVIGaussianProcess(
        input_data=(xj, yj), kernel=Matern32(lengthscale=0.5, variance=1.0),
        likelihood=Gaussian(variance=0.04), learning_rate=0.5)

    def cvi_step(acc, m):
        m2 = m.replace(observations=m.observations * (1 + acc * 1e-30))
        m3 = m2.update_sites()
        loss, grads = jax.value_and_grad(lambda mm: mm.loss())(m3)
        gsum = sum(jnp.sum(jnp.abs(l))
                   for l in jax.tree_util.tree_leaves(grads))
        s = sum(jnp.sum(jnp.abs(l))
                for l in jax.tree_util.tree_leaves(m3.sites.nat1))
        return (loss + gsum + s).astype(jnp.float32) * 1e-9

    ms = _slope(cvi_step, (cvi,))
    _emit(f"cvi_full_iteration_T{t_len}", ms)

    # 5. posterior marginals (filter + smoother), serving path
    def marg_step(acc, m):
        m2 = m.replace(observations=m.observations * (1 + acc * 1e-30))
        ms_, ps_ = m2.kalman.posterior_marginals(engine="pallas")
        return (jnp.sum(ms_[0]) + jnp.sum(ps_[0])).astype(jnp.float32) * 1e-6

    ms = _slope(marg_step, (gpr,))
    _emit(f"posterior_marginals_T{t_len}_pallas", ms)


if __name__ == "__main__":
    main()
