"""Driver benchmark: all 5 BASELINE.md configs, one JSON line.

Headline metric: exact GPR training step at T = 1e6 (Matern-3/2) — the
north-star config (< 50 ms target on one TPU v5e chip).  The `configs`
field carries one driver-captured number per BASELINE.md config:

  1. gpr      — exact GPR train step, T = 1e6, f32 (north star)
  2. vgp      — VGP + Bernoulli natural-gradient step, T = 1e5, f64
  3. svgp     — sparse VGP natgrad step, N = 1e5 data / M = 2048 inducing, f64
  4. cvi      — CVI full iteration (site update + ELBO grad), T = 1e6, f32
  5. sde      — DoubleWell SDE VI iteration (linearize + smooth + KL), f32

Timing protocol (honest; see benchmarks/harness.py): on the axon runtime
``jax.block_until_ready`` is a NO-OP, so naive loops measure dispatch
latency, not device time.  Every workload runs K times inside one jit with
a genuine data dependency between iterations, a scalar is read back (the
only honest clock), and the per-step time is the slope between K=1 and K=2.

``vs_baseline`` is target_ms / measured_ms for the north star (>1 means
beating the target).  The per-config reference comparison lives in
BENCHMARKS.md (LAPACK banded-Cholesky / TF-CPU stand-ins measured by
benchmarks/tf_cpu_baseline.py — the reference itself publishes no numbers).
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def _note(msg):
    print(msg, file=sys.stderr, flush=True)


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
        float(fn(*args))  # compile + drain
    t = {}
    for k, fn in fns.items():
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(*args))
            times.append(time.perf_counter() - t0)
        t[k] = float(np.median(times))
    return (t[2] - t[1]) * 1e3


def bench_gpr_and_cvi():
    import jax
    import jax.numpy as jnp

    from markovflow_tpu.kernels import Matern32
    from markovflow_tpu.likelihoods import Gaussian
    from markovflow_tpu.models import CVIGaussianProcess, \
        GaussianProcessRegression
    from markovflow_tpu.utils import filtered_value_and_grad, trainable_mask

    t_len = 1_000_000
    rng = np.random.default_rng(0)
    x = np.linspace(0.0, 1000.0, t_len)
    y = (np.sin(2.0 * x) + 0.2 * rng.standard_normal(t_len))[:, None]
    # numpy time points: enables the stationary uniform-grid fast path
    # (constant prior-step arrays; detection needs host-inspectable values)
    xj = x.astype(np.float32)
    yj = jnp.asarray(y, jnp.float32)

    def make_gpr(uniform=True):
        m = GaussianProcessRegression(
            input_data=(xj, yj),
            kernel=Matern32(lengthscale=0.5, variance=1.0),
            chol_obs_covariance=jnp.asarray([[0.2]], jnp.float32))
        if not uniform:
            object.__setattr__(m, "_uniform_grid", False)
        return m

    gpr = make_gpr()
    gpr_mask = trainable_mask(gpr)

    def grad_step(acc, m):
        m2 = m.replace(observations=m.observations * (1 + acc * 1e-30))
        loss, grads = filtered_value_and_grad(lambda mm: mm.loss(), m2,
                                              gpr_mask)
        gsum = sum(jnp.sum(jnp.abs(l))
                   for l in jax.tree_util.tree_leaves(grads))
        return (loss + gsum).astype(jnp.float32) * 1e-6

    try:
        gpr_ms = _slope(grad_step, (gpr,))
        gpr_engine = "pallas-uniform"
    except Exception as e:  # uniform kernels failed: fall back, keep bench
        _note(f"uniform GPR path failed ({type(e).__name__}); "
              "falling back to the general engine")
        gpr = make_gpr(uniform=False)
        gpr_ms = _slope(grad_step, (gpr,))
        gpr_engine = "general-fallback"
    loss = float(jax.jit(lambda m: m.loss())(gpr))

    cvi = CVIGaussianProcess(
        input_data=(xj, yj), kernel=Matern32(lengthscale=0.5, variance=1.0),
        likelihood=Gaussian(variance=0.04), learning_rate=0.5)

    cvi_mask = trainable_mask(cvi)

    def cvi_step(acc, m):
        m2 = m.replace(observations=m.observations * (1 + acc * 1e-30))
        m3 = m2.update_sites()
        l, grads = filtered_value_and_grad(lambda mm: mm.loss(), m3, cvi_mask)
        gsum = sum(jnp.sum(jnp.abs(g))
                   for g in jax.tree_util.tree_leaves(grads))
        s = sum(jnp.sum(jnp.abs(g))
                for g in jax.tree_util.tree_leaves(m3.sites.nat1))
        return (l + gsum + s).astype(jnp.float32) * 1e-9

    try:
        cvi_ms = _slope(cvi_step, (cvi,))
        cvi_engine = "pallas-uniform"
    except Exception as e:
        _note(f"uniform CVI path failed ({type(e).__name__}); "
              "falling back to the general engine")
        object.__setattr__(cvi, "_uniform_grid", False)
        cvi_ms = _slope(cvi_step, (cvi,))
        cvi_engine = "general-fallback"
    return gpr_ms, cvi_ms, loss, gpr_engine, cvi_engine


def _wait_for_backend(max_wait_s: float = 900.0):
    """The axon TPU tunnel flaps; probe backend init in a subprocess (jax
    caches an in-process init failure permanently) and retry for a while
    before initializing here, so a transient outage doesn't zero the
    bench.  Returns once a probe succeeds or the budget is exhausted."""
    import subprocess
    import sys

    t0 = time.time()
    while True:
        try:
            probe = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                capture_output=True, text=True, timeout=600)
            ok = probe.returncode == 0
        except subprocess.TimeoutExpired:
            ok = False
        if ok:
            return
        if time.time() - t0 > max_wait_s:
            _note("backend probe still failing; proceeding anyway")
            return
        _note("backend probe failed; retrying in 60 s")
        time.sleep(60.0)


def main():
    import os

    import jax

    from markovflow_tpu.config import setup_compilation_cache

    setup_compilation_cache(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".jax_cache"))
    _wait_for_backend()

    import benchmarks.run_all as cfgs

    configs = {}
    _note("bench: gpr+cvi ...")
    gpr_ms, cvi_ms, loss, gpr_engine, cvi_engine = bench_gpr_and_cvi()
    _note(f"bench: gpr {gpr_ms:.3f} ms [{gpr_engine}], "
          f"cvi {cvi_ms:.3f} ms [{cvi_engine}]")
    configs["gpr_T1e6_f32_ms"] = round(gpr_ms, 3)
    configs["cvi_T1e6_f32_ms"] = round(cvi_ms, 3)
    # which engine actually compiled on the chip: "general-fallback" here
    # means the fused Pallas kernels failed Mosaic backend compile (the
    # cross-platform .lower() tests cannot catch that) — treat as a red flag
    configs["gpr_engine"] = gpr_engine
    configs["cvi_engine"] = cvi_engine
    _note("bench: sde ...")
    try:
        configs["sde_doublewell_n16384_f32_ms"] = round(
            cfgs.bench_sde_vi(quick=False), 3)
    except Exception as e:  # keep the headline metric alive
        configs["sde_doublewell_n16384_f32_ms"] = f"error: {type(e).__name__}"
    jax.config.update("jax_enable_x64", True)
    _note("bench: vgp natgrad f64 ...")
    try:
        configs["vgp_bernoulli_natgrad_T1e5_f64_ms"] = round(
            cfgs.bench_vgp_natgrad(100_000), 3)
    except Exception as e:
        configs["vgp_bernoulli_natgrad_T1e5_f64_ms"] = \
            f"error: {type(e).__name__}"
    _note("bench: svgp natgrad f64 ...")
    try:
        configs["svgp_natgrad_N1e5_M2048_f64_ms"] = round(
            cfgs.bench_svgp_natgrad(100_000, 2048), 3)
    except Exception as e:
        configs["svgp_natgrad_N1e5_M2048_f64_ms"] = f"error: {type(e).__name__}"

    target_ms = 50.0
    print(json.dumps({
        "metric": "gpr_train_step_T1e6_matern32_ms",
        "value": round(gpr_ms, 4),
        "unit": "ms",
        "vs_baseline": round(target_ms / gpr_ms, 2),
        "loss": round(loss, 2),
        "configs": configs,
    }))


if __name__ == "__main__":
    main()
