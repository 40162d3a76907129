"""Compile-time regression guards (VERDICT round-1 weak #4, round-4 #3).

The standard-layout public endpoints must stay traceable+lowerable in
bounded time at production sequence lengths.  Round 1 recorded a 263 s
forward-only compile for ``marginal_means`` at T = 1e5; the fix
(optimization barriers between the element producers and the chunked scan,
ops/scans.py:122-138) brought warm-process lowering to seconds.  The
``*_compile_*`` tests go further and run XLA *compile* (`.lower()` only
measures trace+StableHLO emission, but every cliff this project hit — the
r1 263 s forward compile, the f64 natgrad loop-wrap that outran an 800 s
budget — was XLA compile) on the two graphs with a cliff history: the GPR
train step and ``SSMNaturalGradient.step`` at T = 1e5 / f64.  A future
compile-cliff regression turns into a red test here instead of a
timed-out driver bench.  Bounds are generous (one-core host; the cliffs
they guard against overshoot by an order of magnitude), and the suite's
persistent compile cache only short-circuits them while the graphs are
UNCHANGED — exactly the regression-detection contract.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from markovflow_tpu.kernels import Matern32

BOUND_S = 120.0
#: XLA-compile bounds: far above healthy (tens of seconds warm-process on
#: this host), far below the documented cliffs (>800 s).
COMPILE_BOUND_S = 420.0


def _lower_time(fn, *args):
    t0 = time.perf_counter()
    jax.jit(fn).lower(*args)
    return time.perf_counter() - t0


def _compile_time(fn, *args):
    t0 = time.perf_counter()
    jax.jit(fn).lower(*args).compile()
    return time.perf_counter() - t0


def test_marginals_trace_lower_bounded_at_1e5():
    ts = jnp.asarray(np.linspace(0.0, 100.0, 100_000), jnp.float64)
    kernel = Matern32(lengthscale=0.5, variance=1.0)

    def marginal_means(t):
        return kernel.state_space_model(t).marginal_means

    def marginals(t):
        return kernel.state_space_model(t).marginals

    dt1 = _lower_time(marginal_means, ts)
    dt2 = _lower_time(marginals, ts)
    assert dt1 < BOUND_S, f"marginal_means lower took {dt1:.1f}s"
    assert dt2 < BOUND_S, f"marginals lower took {dt2:.1f}s"


def test_loss_grad_trace_lower_bounded_at_1e5():
    from markovflow_tpu.models import GaussianProcessRegression
    from markovflow_tpu.utils import filtered_value_and_grad, trainable_mask

    n = 100_000
    ts = jnp.asarray(np.linspace(0.0, 100.0, n), jnp.float64)
    ys = jnp.asarray(np.sin(np.asarray(ts)))[:, None]
    model = GaussianProcessRegression(
        (ts, ys), Matern32(lengthscale=0.5, variance=1.0),
        jnp.asarray([[0.2]]))
    mask = trainable_mask(model)

    def step(m):
        return filtered_value_and_grad(lambda mm: mm.loss(), m, mask)[0]

    dt = _lower_time(step, model)
    assert dt < BOUND_S, f"train-step lower took {dt:.1f}s"


def test_gpr_train_step_xla_compile_bounded_at_1e5():
    """Full XLA compile of the f64 GPR train step (BASELINE config 1's
    numerics oracle) stays inside budget on the CPU backend."""
    from markovflow_tpu.models import GaussianProcessRegression
    from markovflow_tpu.utils import filtered_value_and_grad, trainable_mask

    n = 100_000
    ts = jnp.asarray(np.linspace(0.0, 100.0, n), jnp.float64)
    ys = jnp.asarray(np.sin(np.asarray(ts)))[:, None]
    model = GaussianProcessRegression(
        (ts, ys), Matern32(lengthscale=0.5, variance=1.0),
        jnp.asarray([[0.2]]))
    mask = trainable_mask(model)

    def step(m):
        return filtered_value_and_grad(lambda mm: mm.loss(), m, mask)[0]

    dt = _compile_time(step, model)
    assert dt < COMPILE_BOUND_S, f"train-step XLA compile took {dt:.1f}s"


def test_natgrad_step_xla_compile_bounded_at_1e5():
    """Full XLA compile of ``SSMNaturalGradient.step`` on a VGP+Bernoulli
    posterior at T = 1e5 / f64 — THE graph whose loop-wrapped form outran
    an 800 s budget (benchmarks/run_all.py) — must stay compilable in
    bounded time in its bare-step form (the form users and the dispatch
    bench actually run)."""
    from markovflow_tpu.likelihoods import Bernoulli
    from markovflow_tpu.models.variational import VariationalGaussianProcess
    from markovflow_tpu.ssm_natgrad import SSMNaturalGradient

    n = 100_000
    rng = np.random.default_rng(1)
    x = np.linspace(0.0, n / 1000.0, n)
    y = (np.sin(2.0 * x) + 0.3 * rng.standard_normal(n) > 0).astype(
        np.float64)[:, None]
    vgp = VariationalGaussianProcess(
        (jnp.asarray(x), jnp.asarray(y)),
        Matern32(lengthscale=0.5, variance=1.0), Bernoulli())
    opt = SSMNaturalGradient(gamma=0.5, naturals_engine="parallel")
    ssm0 = vgp.dist_q.non_trainable_copy()

    def ng_step(ssm):
        new_ssm, _, _ = opt.step(lambda s: vgp.with_dist_q(s).loss(), ssm)
        return new_ssm

    dt = _compile_time(ng_step, ssm0)
    assert dt < COMPILE_BOUND_S, f"natgrad step XLA compile took {dt:.1f}s"
