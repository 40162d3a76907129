"""Driver benchmark: all 5 BASELINE.md configs, one JSON line per update.

Headline metric: exact GPR training step at T = 1e6 (Matern-3/2) — the
north-star config (< 50 ms target on one TPU v5e chip).  The `configs`
field carries one driver-captured number per BASELINE.md config:

  1. gpr      — exact GPR train step, T = 1e6, f32 (north star)
  2. vgp      — VGP + Bernoulli natural-gradient step, T = 1e5, f64
  3. svgp     — sparse VGP natgrad step, N = 1e5 data / M = 2048 inducing, f64
  4. cvi      — CVI full iteration (site update + ELBO grad), T = 1e6, f32
  5. sde      — DoubleWell SDE VI iteration (linearize + smooth + KL), f32

plus two recorded-quality extras: ``parity`` (on-chip f32-engine loss AND
gradient parity vs the f64 oracle at T = 2e4, with a ``parity_fail`` flag
when loss parity exceeds the 1e-6 budget) and ``d9`` (Sum-of-three-Matern52
GPR step, state_dim 9 — the recursive d <= 12 Pallas fast path).

Robustness contract (round-3 postmortem: the bench emitted numbers for only
2/5 configs because per-config timeboxes summed past the driver's own
wall-clock and three configs died with bare "timeout" strings):

  * ONE GLOBAL BUDGET (default 1380 s, env MFTPU_BENCH_BUDGET_S) governs
    the whole run; configs run cheapest-first and each child's timebox is
    clamped to what the global budget can still afford, reserving minimum
    boxes for the configs behind it.  A config whose minimum no longer
    fits is skipped explicitly — but the ordering makes that the rare case.
  * Each config runs in its OWN subprocess with a hard wall-clock timebox;
    a hung XLA compile cannot take the parent (or the other configs) down.
  * Children print PROVISIONAL results (measured upper bounds, tagged
    ``*-upper-bound``) as soon as they have them, then refine; on a child
    timeout the parent harvests the last BENCH_RESULT line from the
    partial stdout, so a slow config yields a bounded number, never a bare
    "timeout".
  * The parent prints the full headline JSON line after EVERY config.
  * The slope protocol retries while the slope is non-positive and falls
    back to the mean upper bound — it can never emit a negative number.

Outage contract (round-4 postmortem: the axon tunnel wedged for hours at
driver time and the bench spent its whole budget running configs against a
server its own probe had declared dead, nulling the round's record):

  * BENCH_LASTGOOD.json (committed) carries the last healthy measurement
    per metric, with the commit/date it was taken at.  Every config that
    produces a fresh numeric value refreshes the file.
  * When the initial backend probe never goes green, the parent emits the
    full headline JSON IMMEDIATELY — ``backend_down: true``, last-good
    values merged in and tagged ``*_stale`` — then keeps probing on the
    remaining budget and runs the real configs only if the tunnel
    recovers.  A wedged backend costs seconds, not the round.
  * Simulate an outage with MFTPU_BENCH_PROBE_CMD="sleep 999" (the probe
    subprocess is overridable); tests/unit/test_bench_outage.py pins this.

Timing protocol (honest; see benchmarks/harness.py): on the axon runtime
``jax.block_until_ready`` is a NO-OP, so naive loops measure dispatch
latency, not device time.  Every workload runs K times inside one jit with
a genuine data dependency between iterations, a scalar is read back (the
only honest clock), and the per-step time is the slope between K=1 and K=8.

``vs_baseline`` is target_ms / measured_ms for the north star (>1 means
beating the target).  The per-config reference comparison lives in
BENCHMARKS.md (LAPACK banded-Cholesky / TF-CPU stand-ins measured by
benchmarks/tf_cpu_baseline.py — the reference itself publishes no numbers).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
TARGET_MS = 50.0

#: Global wall-clock budget for the whole bench (seconds).
BUDGET_S = int(os.environ.get("MFTPU_BENCH_BUDGET_S", "1380"))

# Per-config (nominal, minimum) wall-clock boxes, seconds, compile included.
# Ordered cheapest-first AFTER the headline; the global budget clamps the
# nominal and skips a config only when even its minimum no longer fits.
BOXES = {
    "gpr_cvi": (420, 300),
    "parity": (900, 120),
    "sde": (120, 60),
    "d9": (900, 90),  # d=9 compiles (Mosaic AND XLA) exceed 600 s on-chip
    # vgp: the f64 step compile after a scan-engine change runs ~780 s
    # (measured for the blocked-scan first compile); once cached it
    # completes in a fraction of this
    "vgp": (1200, 240),
    # svgp nominal is large: the first f64 compile (M=2048 natgrad +
    # N=1e5 projection) exceeds 600 s on-chip; the driver's global
    # budget clamps it, and once the executable is in the persistent
    # cache the config completes in a fraction of this.
    "svgp": (1500, 240),
}
# BASELINE configs first (cheapest-first within that), the d9 extra last:
# vgp/svgp have never landed a driver-time number, so they outrank d9.
ORDER = ["gpr_cvi", "sde", "parity", "vgp", "svgp", "d9"]

#: Committed last-known-good per-metric values (see "Outage contract").
LASTGOOD_PATH = os.environ.get(
    "MFTPU_BENCH_LASTGOOD", os.path.join(HERE, "BENCH_LASTGOOD.json"))


def _note(msg):
    print(msg, file=sys.stderr, flush=True)


def _emit_partial(out):
    """Child-side: print a provisional/complete result line.  The parent
    always takes the LAST such line, so refinements overwrite."""
    print("BENCH_RESULT " + json.dumps(out), flush=True)


# --------------------------------------------------------------------------
# slope protocol (child side)
# --------------------------------------------------------------------------

def _slope(step, args, reps=7, provisional=None):
    """Per-step time in ms: slope between K=1 and K=8 chained executions.

    Guarantees a positive result: retries with doubled reps while the
    measured slope is non-positive (inter-run noise), and finally falls
    back to median(t_K)/K — a strict upper bound on the per-step time.
    ``provisional(ms, tag)``, when given, receives a first single-step
    upper bound as soon as the K=1 chain has compiled, so a parent
    harvesting a timed-out child still gets a bounded number.
    Returns (ms, protocol_tag).
    """
    import jax
    import jax.numpy as jnp

    def chain(k):
        @jax.jit
        def fn(*a):
            def body(_, acc):
                return step(acc, *a)
            return jax.lax.fori_loop(0, k, body, jnp.zeros((), jnp.float32))
        return fn

    # Prefer a wide K spread for SNR; fall back if the long chain fails to
    # compile/run on this runtime (historically large K crashed the worker).
    for hi in (8, 4, 2):
        try:
            fns = {k: chain(k) for k in (1, hi)}
            float(fns[1](*args))  # compile + drain the cheap chain first
            if provisional is not None:
                t0 = time.perf_counter()
                float(fns[1](*args))
                provisional((time.perf_counter() - t0) * 1e3,
                            "single-step-upper-bound")
                provisional = None
            float(fns[hi](*args))
            break
        except Exception as e:  # noqa: BLE001 — any backend failure
            _note(f"slope: K={hi} chain failed ({type(e).__name__}); "
                  "narrowing")
            if hi == 2:
                raise
    else:  # pragma: no cover
        raise RuntimeError("no K chain compiled")

    def medians(r):
        out = {}
        for k, fn in fns.items():
            ts = []
            for _ in range(r):
                t0 = time.perf_counter()
                float(fn(*args))
                ts.append(time.perf_counter() - t0)
            ts.sort()
            out[k] = ts[len(ts) // 2]
        return out

    r = reps
    for _ in range(3):
        t = medians(r)
        ms = (t[hi] - t[1]) / (hi - 1) * 1e3
        if ms > 0:
            return ms, f"slope-k1-k{hi}"
        _note(f"slope: non-positive ({ms:.3f} ms at reps={r}); retrying")
        r *= 2
    # Upper bound: the whole K-chain divided by K.  Positive by construction.
    t = medians(reps)
    return t[hi] / hi * 1e3, "mean-upper-bound"


def _slope_dispatch(step_fn, state0, read, reps=5, provisional=None):
    """Slope protocol via ASYNC DISPATCH CHAINS — for workloads whose
    loop-wrapped jit does not compile in budget.

    Wrapping a training-step graph in ``fori_loop``/``while_loop`` blows up
    the XLA compile for the largest graphs here (measured: the f64 VGP
    natgrad step at T = 1e5 compiles bare in minutes but its loop-wrapped
    form did not finish in 800 s).  Instead: compile the BARE step once
    (``step_fn: state -> state``), dispatch it K times back-to-back — each
    call consumes the previous call's output, so the device must execute
    them sequentially — and read back one scalar at the end (the only
    honest clock on this runtime; it waits on the whole chain).  Per-step
    time is the slope between K=1 and K=8, which also cancels the fixed
    ~28 ms readback RPC.

    ``provisional(ms, tag)``, when given, is called with a first measured
    upper bound (one step incl. readback) right after compile, so a parent
    harvesting partial output gets a bounded number even if the full
    protocol never finishes.

    Returns (ms, protocol_tag); never negative (same retry/upper-bound
    contract as :func:`_slope`).
    """
    t0 = time.perf_counter()
    s = step_fn(state0)  # compile + drain
    read(s)
    compile_s = time.perf_counter() - t0
    _note(f"dispatch: compile+first-step {compile_s:.1f}s")
    # one-step upper bound (includes the fixed readback RPC)
    t0 = time.perf_counter()
    read(step_fn(state0))
    ub_ms = (time.perf_counter() - t0) * 1e3
    if provisional is not None:
        provisional(ub_ms, "single-step-upper-bound")
    hi = 8

    def t_of(k, r):
        ts = []
        for _ in range(r):
            t0 = time.perf_counter()
            s = state0
            for _ in range(k):
                s = step_fn(s)
            read(s)
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2]

    r = reps
    for _ in range(3):
        t1, t8 = t_of(1, r), t_of(hi, r)
        ms = (t8 - t1) / (hi - 1) * 1e3
        if ms > 0:
            return ms, f"dispatch-slope-k1-k{hi}"
        _note(f"slope: non-positive ({ms:.3f} ms at reps={r}); retrying")
        r *= 2
    return t_of(hi, reps) / hi * 1e3, "dispatch-mean-upper-bound"


# --------------------------------------------------------------------------
# configs (child side)
# --------------------------------------------------------------------------

def bench_gpr_and_cvi():
    import jax
    import jax.numpy as jnp
    import numpy as np

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

    def make_gpr(uniform=None):
        return GaussianProcessRegression(
            input_data=(xj, yj),
            kernel=Matern32(lengthscale=0.5, variance=1.0),
            chol_obs_covariance=jnp.asarray([[0.2]], jnp.float32),
            uniform_grid=uniform)

    gpr = make_gpr()
    gpr_mask = trainable_mask(gpr)

    def grad_step(acc, m):
        m2 = m.replace(observations=m.observations * (1 + acc * 1e-30))
        loss, grads = filtered_value_and_grad(lambda mm: mm.loss(), m2,
                                              gpr_mask)
        gsum = sum(jnp.sum(jnp.abs(l))
                   for l in jax.tree_util.tree_leaves(grads))
        return (loss + gsum).astype(jnp.float32) * 1e-6

    out = {}
    try:
        gpr_ms, gpr_proto = _slope(grad_step, (gpr,))
        gpr_engine = "pallas-uniform"
    except Exception as e:  # uniform kernels failed: fall back, keep bench
        _note(f"uniform GPR path failed ({type(e).__name__}); "
              "falling back to the general engine")
        gpr = make_gpr(uniform=False)
        gpr_ms, gpr_proto = _slope(grad_step, (gpr,))
        gpr_engine = "general-fallback"
    out.update({
        "gpr_T1e6_f32_ms": round(gpr_ms, 3),
        # which engine actually compiled on the chip: "general-fallback"
        # means the fused Pallas kernels failed Mosaic backend compile (the
        # cross-platform .lower() tests cannot catch that) — a red flag
        "gpr_engine": gpr_engine,
        "gpr_protocol": gpr_proto,
    })
    _emit_partial(out)

    # the GENERAL engine's number for the same config (arbitrary grids —
    # the reference's actual generality), recorded every round
    gpr_gen = make_gpr(uniform=False)
    gen_ms, gen_proto = _slope(grad_step, (gpr_gen,), reps=5)
    out.update({"gpr_general_T1e6_f32_ms": round(gen_ms, 3),
                "gpr_general_protocol": gen_proto})
    _emit_partial(out)
    loss = float(jax.jit(lambda m: m.loss())(gpr))
    out["loss"] = round(loss, 2)

    def make_cvi(uniform=None):
        return CVIGaussianProcess(
            input_data=(xj, yj),
            kernel=Matern32(lengthscale=0.5, variance=1.0),
            likelihood=Gaussian(variance=0.04), learning_rate=0.5,
            uniform_grid=uniform)

    cvi = make_cvi()
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
        cvi_ms, cvi_proto = _slope(cvi_step, (cvi,))
        cvi_engine = "pallas-uniform"
    except Exception as e:
        _note(f"uniform CVI path failed ({type(e).__name__}); "
              "falling back to the general engine")
        cvi = make_cvi(uniform=False)
        cvi_ms, cvi_proto = _slope(cvi_step, (cvi,))
        cvi_engine = "general-fallback"
    out.update({
        "cvi_T1e6_f32_ms": round(cvi_ms, 3),
        "cvi_engine": cvi_engine,
        "cvi_protocol": cvi_proto,
    })
    return out


def bench_parity():
    """On-chip numeric parity, recorded AND asserted in the driver JSON
    (VERDICT r3 #3: don't just record).  At T = 2e4 compare (a) the fused
    Pallas uniform-grid engine and (b) the general engine, each against
    (c) the same GPR graph in float64 — the value the suite's CPU oracle
    tests pin to dense NumPy formulas at 1e-10.  Both LOSS parity and
    GRADIENT parity (hyperparameter grads, relative L2 per leaf, max over
    leaves) are recorded; ``parity_fail`` is true when the default engine's
    loss parity exceeds the 1e-6 budget from BASELINE.json.

    Runs in its own child process with x64 ENABLED from the start so both
    precisions are available; f32 operands keep the fast kernels on their
    f32 paths (the kernels are x64-hygienic; tests/unit/test_mosaic_lowering).
    T = 1e4 keeps the f64 oracle's on-chip compile inside the timebox (at
    T = 2e4 the oracle compile outran a 300 s box across three round-5
    attempts on the flapping tunnel; the parity statement is T-insensitive).
    """
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    from markovflow_tpu.kernels import Matern32
    from markovflow_tpu.models import GaussianProcessRegression
    from markovflow_tpu.utils import filtered_value_and_grad, trainable_mask

    t_len = 10_000
    rng = np.random.default_rng(0)
    x = np.linspace(0.0, 100.0, t_len)
    y = (np.sin(2.0 * x) + 0.2 * rng.standard_normal(t_len))[:, None]

    def loss_and_grads(dtype, uniform):
        m = GaussianProcessRegression(
            input_data=(x.astype(dtype), jnp.asarray(y, dtype)),
            kernel=Matern32(lengthscale=0.5, variance=1.0),
            chol_obs_covariance=jnp.asarray([[0.2]], dtype),
            uniform_grid=None if uniform else False)
        mask = trainable_mask(m)
        loss, grads = jax.jit(lambda mm: filtered_value_and_grad(
            lambda q: q.loss(), mm, mask))(m)
        leaves = [np.asarray(g, np.float64)
                  for g in jax.tree_util.tree_leaves(grads)]
        return float(loss), leaves

    # Cheap f32 engine runs FIRST (their compiles are seconds) so a parent
    # harvesting a timed-out child still sees which engines ran; the f64
    # oracle — the slow compile — goes last.
    engines = {}
    out = {}
    for name, uniform in (("pallas_uniform", True), ("general", False)):
        try:
            engines[name] = loss_and_grads(jnp.float32, uniform=uniform)
            out[f"parity_loss_{name}_f32"] = round(engines[name][0], 6)
        except Exception as e:  # noqa: BLE001 — record the failure, move on
            out[f"parity_rel_{name}"] = f"error {type(e).__name__}"
        _emit_partial(out)
    # The f64 oracle is the slow compile this ordering defends against —
    # if IT fails, the record must still carry the engines' losses and an
    # explicit verdict, not die without one (ADVICE r4).
    try:
        l64, g64 = loss_and_grads(jnp.float64, uniform=False)
    except Exception as e:  # noqa: BLE001 — record the failure, verdict too
        err = f"error {type(e).__name__}"
        for name in engines:
            out[f"parity_rel_{name}"] = err
        out["parity_oracle_f64"] = err
        out["parity_fail"] = True
        return out
    out["parity_loss_f64"] = round(l64, 6)
    for name, (l32, g32) in engines.items():
        rel = abs(l32 - l64) / max(abs(l64), 1e-30)
        out[f"parity_rel_{name}"] = float(f"{rel:.3e}")
        grel = max(
            float(np.linalg.norm(a - b)
                  / max(np.linalg.norm(b), 1e-30))
            for a, b in zip(g32, g64))
        out[f"parity_grad_rel_{name}"] = float(f"{grel:.3e}")
        _emit_partial(out)
    # the default engine on a uniform f32 grid is pallas_uniform; fail the
    # record if its loss parity exceeds the 1e-6 budget (BASELINE.json)
    rel_def = out.get("parity_rel_pallas_uniform")
    out["parity_fail"] = not (isinstance(rel_def, float) and rel_def < 1e-6)
    return out


def bench_d9():
    """GPR training step with a three-Matern52 Sum kernel (state_dim 9) at
    T = 1e5 — exercises the recursive Schur-complement d <= 12 Pallas fast
    path (reference Sum kernels: sde_kernel.py:540-687)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from markovflow_tpu.kernels import Matern52
    from markovflow_tpu.models import GaussianProcessRegression
    from markovflow_tpu.utils import filtered_value_and_grad, trainable_mask

    t_len = 100_000
    rng = np.random.default_rng(0)
    x = np.linspace(0.0, 100.0, t_len)
    y = (np.sin(2.0 * x) + 0.2 * rng.standard_normal(t_len))[:, None]
    kern = (Matern52(lengthscale=0.5, variance=1.0)
            + Matern52(lengthscale=2.0, variance=0.5)
            + Matern52(lengthscale=8.0, variance=0.25))

    def make():
        return GaussianProcessRegression(
            input_data=(x.astype(np.float32), jnp.asarray(y, jnp.float32)),
            kernel=kern,
            chol_obs_covariance=jnp.asarray([[0.2]], jnp.float32))

    out = {}

    def grad_step(acc, mm):
        m2 = mm.replace(observations=mm.observations * (1 + acc * 1e-30))
        mask = trainable_mask(m2)
        loss, grads = filtered_value_and_grad(lambda q: q.loss(), m2, mask)
        gsum = sum(jnp.sum(jnp.abs(g))
                   for g in jax.tree_util.tree_leaves(grads))
        return (loss + gsum).astype(jnp.float32) * 1e-6

    # The XLA-scan engine FIRST: the d=9 recursive-Schur Pallas kernel's
    # Mosaic compile has never finished inside a green tunnel window
    # (>600 s observed round 5), so land a number for the config before
    # attempting the fast path.
    def prov_xla(ms, tag):
        out.update({"gpr_sum3xM52_d9_T1e5_f32_ms": round(ms, 3),
                    "d9_engine": "xla-scan", "d9_protocol": tag})
        _emit_partial(out)

    os.environ["MFTPU_FORCE_XLA_SCANS"] = "1"  # read at trace time
    try:
        ms, proto = _slope(grad_step, (make(),), provisional=prov_xla)
    finally:
        os.environ.pop("MFTPU_FORCE_XLA_SCANS", None)
    out.update({"gpr_sum3xM52_d9_T1e5_f32_ms": round(ms, 3),
                "d9_engine": "xla-scan", "d9_protocol": proto})
    _emit_partial(out)

    def prov_pallas(ms, tag):
        out.update({"gpr_sum3xM52_d9_pallas_T1e5_f32_ms": round(ms, 3),
                    "d9_pallas_protocol": tag})
        _emit_partial(out)

    try:
        ms, proto = _slope(grad_step, (make(),),
                           provisional=prov_pallas)
        out.update({"gpr_sum3xM52_d9_pallas_T1e5_f32_ms": round(ms, 3),
                    "d9_pallas_protocol": proto})
    except Exception as e:  # noqa: BLE001 — fast path optional here
        out["d9_pallas_status"] = f"error {type(e).__name__}"
    return out


def child_main(config: str):
    """Run one config; print BENCH_RESULT lines as results firm up (the
    parent takes the last one)."""
    import jax

    from markovflow_tpu.config import setup_compilation_cache

    setup_compilation_cache(os.path.join(HERE, ".jax_cache"))

    import benchmarks.run_all as cfgs

    if config == "gpr_cvi":
        out = bench_gpr_and_cvi()
    elif config == "sde":
        out = {}

        def prov(ms, tag):
            out.update({"sde_doublewell_n16384_f32_ms": round(ms, 3),
                        "sde_protocol": tag})
            _emit_partial(out)

        ms, proto = cfgs.bench_sde_vi(quick=False, provisional=prov)
        out.update({"sde_doublewell_n16384_f32_ms": round(ms, 3),
                    "sde_protocol": proto})
    elif config == "vgp":
        jax.config.update("jax_enable_x64", True)
        out = {}

        def prov(ms, tag):
            out.update({"vgp_bernoulli_natgrad_T1e5_f64_ms": round(ms, 3),
                        "vgp_protocol": tag})
            _emit_partial(out)

        ms, proto = cfgs.bench_vgp_natgrad(100_000, provisional=prov)
        out.update({"vgp_bernoulli_natgrad_T1e5_f64_ms": round(ms, 3),
                    "vgp_protocol": proto})
    elif config == "svgp":
        jax.config.update("jax_enable_x64", True)
        out = {}

        def prov(ms, tag):
            out.update({"svgp_natgrad_N1e5_M2048_f64_ms": round(ms, 3),
                        "svgp_protocol": tag})
            _emit_partial(out)

        ms, proto = cfgs.bench_svgp_natgrad(100_000, 2048, provisional=prov)
        out.update({"svgp_natgrad_N1e5_M2048_f64_ms": round(ms, 3),
                    "svgp_protocol": proto})
    elif config == "parity":
        out = bench_parity()
    elif config == "d9":
        out = bench_d9()
    else:
        raise SystemExit(f"unknown config {config!r}")
    _emit_partial(out)


# --------------------------------------------------------------------------
# parent
# --------------------------------------------------------------------------

def _probe_backend(timeout_s: float = 120.0) -> bool:
    """One backend-health probe in a subprocess (jax caches an in-process
    init failure permanently, so the parent never imports jax itself).

    The probe runs a real jit + readback, not just ``jax.devices()``: a
    congested or wedged compute server still answers the device handshake
    while every work RPC hangs (observed: clients killed mid-compile leave
    zombie compiles that serialize the server for tens of minutes).

    MFTPU_BENCH_PROBE_CMD overrides the probe command (shell string) so an
    outage can be simulated: ``MFTPU_BENCH_PROBE_CMD="sleep 999"``."""
    override = os.environ.get("MFTPU_BENCH_PROBE_CMD")
    if override:
        cmd, shell = override, True
    else:
        cmd = [sys.executable, "-c",
               ("import jax, jax.numpy as jnp; "
                "print(float(jax.jit(lambda x: jnp.sum(x * 3.0))"
                "(jnp.ones((128, 128)))))")]
        shell = False
    try:
        probe = subprocess.run(cmd, shell=shell, capture_output=True,
                               text=True, timeout=max(1.0, timeout_s))
        return probe.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _wait_for_backend(max_wait_s: float = 300.0) -> bool:
    """The axon TPU tunnel flaps; retry the probe for up to ``max_wait_s``
    so a transient outage doesn't zero the bench.  Returns True the moment
    a probe goes green, False when the wait is exhausted (callers decide
    what a dead backend costs — see the outage contract in the module
    docstring).  With ``max_wait_s <= 0`` no probe runs at all (an
    exhausted budget must not be overdrawn by a 120 s probe)."""
    if max_wait_s <= 0:
        return False
    t0 = time.time()
    while True:
        left = max_wait_s - (time.time() - t0)
        if _probe_backend(timeout_s=min(120.0, max(1.0, left))):
            return True
        left = max_wait_s - (time.time() - t0)
        if left <= 0:
            _note("backend probe still failing after "
                  f"{max_wait_s:.0f}s of retries")
            return False
        _note("backend probe failed; retrying in 30 s")
        time.sleep(min(30.0, max(0.0, left)))


# --------------------------------------------------------------------------
# last-known-good record
# --------------------------------------------------------------------------

#: Metric keys whose values are worth carrying forward when the backend is
#: down (numbers plus the engine/protocol tags that qualify them).
_CARRY_PREFIXES = ("gpr_", "cvi_", "sde_", "vgp_", "svgp_", "parity_",
                   "d9_", "loss")


def _load_lastgood() -> dict:
    try:
        with open(LASTGOOD_PATH) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return {}


def _update_lastgood(configs: dict):
    """Refresh BENCH_LASTGOOD.json with every fresh numeric metric (and its
    qualifier tags) from this run.  Values merge key-by-key, so a partial
    run never erases a config measured by an earlier full run — and a
    mere upper bound never overwrites a completed slope measurement (the
    protocol tag records which is which)."""
    fresh = {k: v for k, v in configs.items()
             if k.startswith(_CARRY_PREFIXES) and "status" not in k}
    if not any(isinstance(v, (int, float)) and not isinstance(v, bool)
               for v in fresh.values()):
        return
    rec = _load_lastgood()
    good = rec.setdefault("configs", {})
    proto_of = {
        "gpr_T1e6_f32_ms": "gpr_protocol",
        "gpr_general_T1e6_f32_ms": "gpr_general_protocol",
        "cvi_T1e6_f32_ms": "cvi_protocol",
        "sde_doublewell_n16384_f32_ms": "sde_protocol",
        "vgp_bernoulli_natgrad_T1e5_f64_ms": "vgp_protocol",
        "svgp_natgrad_N1e5_M2048_f64_ms": "svgp_protocol",
        "gpr_sum3xM52_d9_T1e5_f32_ms": "d9_protocol",
    }
    for k, pk in proto_of.items():
        old_p, new_p = good.get(pk, ""), fresh.get(pk, "")
        if ("slope" in str(old_p) and "upper-bound" in str(new_p)
                and k in good):
            fresh.pop(k, None)
            fresh.pop(pk, None)
    good.update(fresh)
    rec["updated"] = time.strftime("%Y-%m-%d %H:%M:%S %Z")
    try:
        commit = subprocess.run(
            ["git", "-C", HERE, "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10).stdout.strip()
        if commit:
            rec["commit"] = commit
    except Exception:  # noqa: BLE001 — provenance is best-effort
        pass
    try:
        with open(LASTGOOD_PATH, "w") as f:
            json.dump(rec, f, indent=1, sort_keys=True)
            f.write("\n")
    except OSError as e:
        _note(f"lastgood: could not write {LASTGOOD_PATH}: {e}")


def _merge_stale(configs: dict) -> dict:
    """Fill metrics this run could not measure from BENCH_LASTGOOD.json,
    tagging every borrowed value with a ``*_stale`` provenance string."""
    rec = _load_lastgood()
    good = rec.get("configs", {})
    prov = (f"last-good {rec.get('updated', '?')} "
            f"commit {rec.get('commit', '?')}")
    merged = dict(configs)
    for k, v in good.items():
        if k in merged:
            continue
        base = k[:-3] if k.endswith("_ms") else k
        merged[k] = v
        if isinstance(v, (int, float)) and not isinstance(v, bool):
            merged[base + "_stale"] = prov
    return merged


def _harvest(stdout) -> dict:
    """Last BENCH_RESULT line from (possibly partial) child stdout."""
    if isinstance(stdout, bytes):
        stdout = stdout.decode(errors="replace")
    for line in reversed((stdout or "").splitlines()):
        if line.startswith("BENCH_RESULT "):
            try:
                return json.loads(line[len("BENCH_RESULT "):])
            except json.JSONDecodeError:
                continue
    return {}


def _run_config(config: str, timebox: int):
    """Run one config in a subprocess; returns its dict (possibly a
    provisional upper bound harvested from a timed-out child)."""
    t0 = time.time()
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--config", config],
            capture_output=True, text=True, timeout=timebox, cwd=HERE)
    except subprocess.TimeoutExpired as e:
        _note(f"bench: {config} hit its {timebox}s timebox")
        tail = e.stderr or b""
        if isinstance(tail, bytes):
            tail = tail.decode(errors="replace")
        _note(tail[-500:])
        got = _harvest(e.stdout)
        if got:
            _note(f"bench: {config} harvested a provisional result")
            got[f"{config}_status"] = f"upper-bound (timebox {timebox}s)"
            return got
        return {f"{config}_status": f"timeout after {timebox}s"}
    dt = time.time() - t0
    got = _harvest(proc.stdout)
    if got:
        _note(f"bench: {config} done in {dt:.0f}s")
        return got
    _note(f"bench: {config} FAILED rc={proc.returncode}; stderr tail:")
    _note(proc.stderr[-800:])
    return {f"{config}_status": f"error rc={proc.returncode}"}


def _emit(configs, backend_down=False):
    """Print the full headline JSON line from what we have so far.  Every
    line merges last-good values for metrics this run has not (yet)
    measured, tagged ``*_stale`` with their provenance — the driver takes
    the LAST line, and a run cut off mid-way must still carry a value for
    every config.  ``backend_down`` additionally flags the outage and sets
    ``stale: true`` when the headline number itself is borrowed."""
    shown = _merge_stale(configs)
    gpr_ms = shown.get("gpr_T1e6_f32_ms")
    line = {
        "metric": "gpr_train_step_T1e6_matern32_ms",
        "value": gpr_ms if isinstance(gpr_ms, (int, float)) else None,
        "unit": "ms",
        "vs_baseline": (round(TARGET_MS / gpr_ms, 2)
                        if isinstance(gpr_ms, (int, float)) and gpr_ms > 0
                        else None),
        "loss": shown.get("loss"),
        "configs": {k: v for k, v in shown.items() if k != "loss"},
    }
    if backend_down:
        line["backend_down"] = True
    if "gpr_T1e6_f32_stale" in shown:
        line["stale"] = True
    print(json.dumps(line), flush=True)


def main():
    start = time.time()
    deadline = start + BUDGET_S
    configs = {}
    # MFTPU_BENCH_ONLY="parity,svgp": restrict the run to a subset of ORDER
    # (targeted retries for configs starved by tunnel flaps — a green window
    # shouldn't be spent re-measuring configs that already have fresh
    # numbers).  The driver's full run leaves this unset.
    only = os.environ.get("MFTPU_BENCH_ONLY")
    order = ([c for c in only.split(",") if c in BOXES] if only else ORDER)

    def remaining():
        return deadline - time.time()

    def reserve_after(i):
        return sum(BOXES[c][1] for c in ORDER[i + 1:])

    backend_ok = _wait_for_backend(max_wait_s=min(300.0, BUDGET_S / 4))
    if not backend_ok:
        # Outage contract: a complete (stale-tagged) record lands NOW —
        # a wedged tunnel costs seconds, not the round — then the rest of
        # the budget goes to waiting for recovery, not to burning config
        # timeboxes against a server no work RPC can reach.
        _note("bench: backend down — emitting last-good record immediately")
        _emit(configs, backend_down=True)
        while remaining() > sum(b[1] for b in BOXES.values()) * 0.5:
            if _wait_for_backend(max_wait_s=min(150.0, remaining())):
                backend_ok = True
                _note("bench: backend recovered; running configs")
                break
            time.sleep(min(30.0, max(0.0, remaining())))
        if not backend_ok:
            _note("bench: backend never recovered; stale record stands")
            return

    def reserve_after_in(i, order_):
        return sum(BOXES[c][1] for c in order_[i + 1:])

    for i, name in enumerate(order):
        nominal, minimum = BOXES[name]
        box = int(min(nominal, remaining() - reserve_after_in(i, order)))
        if box < minimum:
            if remaining() > minimum:
                box = minimum  # eat into the reserve rather than skip
            else:
                _note(f"bench: skipping {name} (global budget exhausted: "
                      f"{remaining():.0f}s left)")
                configs[f"{name}_status"] = "skipped (global budget)"
                _emit(configs, backend_down=True)
                continue
        # The tunnel flaps on ~minute timescales; don't burn a config's box
        # while the data plane is down (a wedged server still answers the
        # device handshake — the probe runs real compute).  A dead probe
        # here downgrades the config to its stale value instead of running.
        alive = _wait_for_backend(max_wait_s=min(
            180.0, max(0.0, remaining() - reserve_after_in(i, order)
                       - minimum)))
        if not alive and not _probe_backend(timeout_s=30.0):
            _note(f"bench: backend down at {name}; using last-good value")
            configs[f"{name}_status"] = "backend down (stale value used)"
            _emit(configs, backend_down=True)
            continue
        res = _run_config(name, box)
        if name == "gpr_cvi" and "gpr_T1e6_f32_ms" not in res \
                and remaining() - reserve_after_in(i, order) > minimum:
            _note("bench: headline config failed; one retry")
            res = _run_config(name, int(
                min(nominal, remaining() - reserve_after_in(i, order))))
        configs.update(res)
        _update_lastgood(res)
        _emit(configs)
    # Final line: fill anything still missing from the last-good record so
    # the round's JSON always carries a (possibly stale-tagged) value for
    # every BASELINE config.
    _emit(configs, backend_down=not backend_ok or any(
        "status" in k for k in configs))


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--config":
        child_main(sys.argv[2])
    else:
        main()
