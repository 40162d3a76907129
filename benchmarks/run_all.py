"""All headline benchmarks in one run (honest slope protocol throughout).

Usage: python benchmarks/run_all.py  [--quick]

Prints one JSON line per metric.  See benchmarks/harness.py for why naive
timing loops are invalid on detached TPU runtimes: every workload here runs
K times inside one jit with a chained data dependency, and the per-step
time is the slope between K=1 and K=8 (narrowing to K=4/2 if the long
chain fails on this runtime), with a host readback as the only trusted
clock.  The slope protocol never returns a negative number (see
bench._slope).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _slope(step, args, reps=7):
    """Delegates to bench._slope: K=1 vs K=8 spread, non-negative result.

    Returns (ms, protocol_tag)."""
    from bench import _slope as slope
    return slope(step, args, reps)


def _emit(metric, ms, **extra):
    print(json.dumps({"metric": metric, "value": round(ms, 4), "unit": "ms",
                      **extra}), flush=True)


def main():
    import jax

    from markovflow_tpu.config import setup_compilation_cache

    setup_compilation_cache(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
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
    ms, proto = _slope(grad_step, (gpr,))
    _emit(f"gpr_train_step_T{t_len}_matern32", ms,
          vs_50ms_target=round(50.0 / ms, 2), protocol=proto)

    # 2. GPR training step with autodiff VJP (for the record)
    ms, proto = _slope(grad_step, (gpr.replace(grad_engine="autodiff"),))
    _emit(f"gpr_train_step_T{t_len}_autodiff_vjp", ms, protocol=proto)

    # 3. sum kernel (state_dim 4)
    gpr4 = GaussianProcessRegression(
        input_data=(xj, yj),
        kernel=Matern32(lengthscale=0.5, variance=1.0)
        + Matern12(lengthscale=3.0, variance=0.5),
        chol_obs_covariance=jnp.asarray([[0.2]], dtype))
    ms, proto = _slope(grad_step, (gpr4,))
    _emit(f"gpr_train_step_T{t_len}_sum_kernel_d4", ms, protocol=proto)

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

    ms, proto = _slope(cvi_step, (cvi,))
    _emit(f"cvi_full_iteration_T{t_len}", ms, protocol=proto)

    # 5. posterior marginals (filter + smoother), serving path
    def marg_step(acc, m):
        m2 = m.replace(observations=m.observations * (1 + acc * 1e-30))
        ms_, ps_ = m2.kalman.posterior_marginals(engine="pallas")
        return (jnp.sum(ms_[0]) + jnp.sum(ps_[0])).astype(jnp.float32) * 1e-6

    ms, proto = _slope(marg_step, (gpr,))
    _emit(f"posterior_marginals_T{t_len}_pallas", ms, protocol=proto)

    # 6. BASELINE config 5: DoubleWell SDE VI iteration (f32)
    ms, proto = bench_sde_vi(quick=quick)
    _emit(f"sde_doublewell_vi_iteration_n{2048 if quick else 16384}", ms,
          protocol=proto)

    # 7-8. BASELINE configs 2-3 need float64 (natural-parameter training on
    # dense grids carries Q^{-1} ~ dt^{-3}; see ssm_natgrad.py) — switch the
    # process to x64 for the remainder.
    jax.config.update("jax_enable_x64", True)
    n2 = 10_000 if quick else 100_000
    ms, proto = bench_vgp_natgrad(n2)
    _emit(f"vgp_bernoulli_natgrad_step_T{n2}_f64", ms, protocol=proto)

    m3 = 512 if quick else 2048
    n3 = 10_000 if quick else 100_000
    ms, proto = bench_svgp_natgrad(n3, m3)
    _emit(f"svgp_natgrad_step_N{n3}_M{m3}_f64", ms, protocol=proto)


def bench_sde_vi(quick: bool, provisional=None):
    """BASELINE config 5: one VI iteration for a DoubleWell SDE-GP —
    linearize the SDE around the current Gaussian path, Kalman-smooth the
    observations against the linearized prior, and evaluate the
    drift-difference KL surrogate (pattern: tests/unit/test_sde.py::
    test_double_well_vi_workflow).  ``provisional(ms, tag)``, when given,
    receives an early single-step upper bound (harvested by a parent whose
    timebox expires before the full slope protocol finishes)."""
    import jax
    import jax.numpy as jnp

    from markovflow_tpu.emission_model import EmissionModel
    from markovflow_tpu.kalman_filter import KalmanFilter
    from markovflow_tpu.sde import (DoubleWellSDE, Gaussian as GaussianPath,
                                    LinearDrift, euler_maruyama,
                                    linearize_sde,
                                    squared_drift_difference_along_Gaussian_path)

    n = 2048 if quick else 16384
    sde = DoubleWellSDE(q=0.5)
    ts = jnp.asarray(np.linspace(0.0, 8.0, n + 1), jnp.float32)
    key = jax.random.PRNGKey(7)
    truth = euler_maruyama(sde, jnp.asarray([[1.0]], jnp.float32), ts, key)[0]
    obs = truth + 0.2 * jax.random.normal(jax.random.fold_in(key, 1),
                                          truth.shape)
    q_mu = jnp.zeros((1, n, 1), jnp.float32)
    q_cov = jnp.ones((1, n, 1, 1), jnp.float32)
    init = GaussianPath(jnp.asarray([[1.0]], jnp.float32),
                        jnp.eye(1, dtype=jnp.float32)[None] * 0.25)
    dt = float(ts[1] - ts[0])

    def vi_step(acc, obs_, q_mu_, q_cov_):
        obs2 = obs_ * (1 + acc * 1e-30)
        q_path = GaussianPath(q_mu_, q_cov_)
        prior_ssm = linearize_sde(sde, ts, q_path, init)
        h = jnp.ones((1, n + 1, 1, 1), jnp.float32)
        kf = KalmanFilter(prior_ssm, EmissionModel(h), obs2[None],
                          jnp.asarray([[0.2]], jnp.float32))
        post = kf.posterior_state_space_model()
        means, covs = post.marginals
        drift = LinearDrift.from_ssm(post, dt)
        kl = squared_drift_difference_along_Gaussian_path(
            sde, LinearDrift(A=drift.A[0, :, :, 0], b=drift.b[0]),
            GaussianPath(means[0, 1:], covs[0, 1:]), dt)
        out = kl + jnp.sum(means) * 1e-6 + jnp.sum(covs) * 1e-6
        return out.astype(jnp.float32) * 1e-6

    from bench import _slope as slope
    return slope(vi_step, (obs, q_mu, q_cov), provisional=provisional)


def bench_vgp_natgrad(n: int, provisional=None):
    """BASELINE config 2: VGP + Bernoulli classification, one natural-
    gradient step on the full-rank SSM posterior (float64).
    ``provisional(ms, tag)`` receives an early single-step upper bound."""
    import jax
    import jax.numpy as jnp

    from markovflow_tpu.kernels import Matern32
    from markovflow_tpu.likelihoods import Bernoulli
    from markovflow_tpu.models.variational import VariationalGaussianProcess
    from markovflow_tpu.ssm_natgrad import SSMNaturalGradient

    rng = np.random.default_rng(1)
    x = np.linspace(0.0, n / 1000.0, n)
    y = (np.sin(2.0 * x) + 0.3 * rng.standard_normal(n) > 0).astype(
        np.float64)[:, None]
    xj, yj = jnp.asarray(x, jnp.float64), jnp.asarray(y, jnp.float64)
    vgp = VariationalGaussianProcess((xj, yj), Matern32(lengthscale=0.5,
                                                        variance=1.0),
                                     Bernoulli())
    opt = SSMNaturalGradient(gamma=0.5, naturals_engine="parallel")
    ssm0 = vgp.dist_q.non_trainable_copy()

    # Dispatch-chain protocol: this graph's loop-wrapped jit does not
    # compile in budget (see bench._slope_dispatch); chain bare-step
    # dispatches through the SSM state instead.
    @jax.jit
    def ng_step(ssm):
        new_ssm, _, _ = opt.step(lambda s: vgp.with_dist_q(s).loss(), ssm)
        return new_ssm

    from bench import _slope_dispatch

    return _slope_dispatch(ng_step, ssm0,
                           lambda s: float(jnp.sum(s.initial_mean)),
                           provisional=provisional)


def bench_svgp_natgrad(n: int, m: int, provisional=None):
    """BASELINE config 3: sparse VGP with inducing states, one natural-
    gradient step on q(s(Z)) (float64).
    ``provisional(ms, tag)`` receives an early single-step upper bound."""
    import jax
    import jax.numpy as jnp

    from markovflow_tpu.kernels import Matern32
    from markovflow_tpu.likelihoods import Gaussian
    from markovflow_tpu.models import SparseVariationalGaussianProcess
    from markovflow_tpu.ssm_natgrad import SSMNaturalGradient

    rng = np.random.default_rng(2)
    span = n / 1000.0
    x = np.linspace(0.0, span, n)
    y = (np.sin(2.0 * x) + 0.2 * rng.standard_normal(n))[:, None]
    z = np.linspace(-0.01, span + 0.01, m)
    xj, yj = jnp.asarray(x, jnp.float64), jnp.asarray(y, jnp.float64)
    svgp = SparseVariationalGaussianProcess(
        kernel=Matern32(lengthscale=0.5, variance=1.0),
        likelihood=Gaussian(variance=0.04),
        inducing_points=jnp.asarray(z, jnp.float64))
    opt = SSMNaturalGradient(gamma=0.5, naturals_engine="parallel")
    ssm0 = svgp.dist_q.non_trainable_copy()

    @jax.jit
    def ng_step(ssm):
        new_ssm, _, _ = opt.step(
            lambda s: svgp.with_dist_q(s).loss((xj, yj)), ssm)
        return new_ssm

    from bench import _slope_dispatch

    return _slope_dispatch(ng_step, ssm0,
                           lambda s: float(jnp.sum(s.initial_mean)),
                           provisional=provisional)


if __name__ == "__main__":
    main()
