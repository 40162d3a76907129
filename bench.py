"""North-star benchmark: exact GPR training step at T = 1e6 (Matern-3/2).

Runs on whatever accelerator JAX picks (the real TPU chip under the driver).
Measures one full training step — value_and_grad of the log marginal
likelihood (Koopman analytic-adjoint engine + Pallas scan kernels) — and
prints ONE JSON line.

Timing protocol (honest; see benchmarks/harness.py): on the axon runtime
``jax.block_until_ready`` is a NO-OP, so naive loops measure dispatch
latency, not device time.  Here the step runs K times inside one jit with a
genuine data dependency between iterations, a scalar is read back (the only
honest clock), and the per-step time is the slope between K=1 and K=2
(chains with K >= 3 are rejected by this runtime).

Target (BASELINE.md): < 50 ms / step on one TPU v5e chip.  ``vs_baseline``
is target_ms / measured_ms (>1 means beating the target).
"""
from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax

    # Persistent compilation cache (first compile is slow; cache across runs).
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from markovflow_tpu.kernels import Matern32
    from markovflow_tpu.models import GaussianProcessRegression

    dtype = jnp.float32
    t_len = 1_000_000
    rng = np.random.default_rng(0)
    x = np.linspace(0.0, 1000.0, t_len)
    y = (np.sin(2.0 * x) + 0.2 * rng.standard_normal(t_len))[:, None]

    model = GaussianProcessRegression(
        input_data=(jnp.asarray(x, dtype), jnp.asarray(y, dtype)),
        kernel=Matern32(lengthscale=0.5, variance=1.0),
        chol_obs_covariance=jnp.asarray([[0.2]], dtype),
    )  # grad_engine="koopman" (default): analytic adjoint + Pallas scans

    def step(acc, m):
        m2 = m.replace(observations=m.observations * (1 + acc * 1e-30))
        loss, grads = jax.value_and_grad(lambda mm: mm.loss())(m2)
        gsum = sum(jnp.sum(jnp.abs(l))
                   for l in jax.tree_util.tree_leaves(grads))
        return (loss + gsum).astype(jnp.float32) * 1e-6

    def chain(k):
        @jax.jit
        def fn(m):
            def body(_, acc):
                return step(acc, m)
            return jax.lax.fori_loop(0, k, body, jnp.zeros((), jnp.float32))
        return fn

    fns = {k: chain(k) for k in (1, 2)}
    for fn in fns.values():
        float(fn(model))  # compile + drain

    t = {}
    for k, fn in fns.items():
        times = []
        for _ in range(9):
            t0 = time.perf_counter()
            float(fn(model))
            times.append(time.perf_counter() - t0)
        t[k] = float(np.median(times))
    ms = (t[2] - t[1]) * 1e3

    loss = float(jax.jit(lambda m: m.loss())(model))
    target_ms = 50.0
    print(json.dumps({
        "metric": "gpr_train_step_T1e6_matern32_ms",
        "value": round(ms, 4),
        "unit": "ms",
        "vs_baseline": round(target_ms / ms, 2),
        "loss": round(loss, 2),
    }))


if __name__ == "__main__":
    main()
