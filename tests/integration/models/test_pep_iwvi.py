"""PEP and IWVI tests
(patterns: reference tests/integration/models/test_pep.py,
test_importance_weighted_vi.py)."""
import jax
import jax.numpy as jnp
import numpy as np
from numpy.testing import assert_allclose

from markovflow_tpu.kernels import Matern32
from markovflow_tpu.likelihoods import Gaussian, PEPGaussian, PEPScalarLikelihood
from markovflow_tpu.models import GaussianProcessRegression
from markovflow_tpu.models.iwvi import ImportanceWeightedVI
from markovflow_tpu.models.pep import PowerExpectationPropagation
from tests.tools import ELBO, ELBO_D, LOGLIK, PREDICT_F, UPDATE_SITES

NOISE = 0.3


def make_data(rng, n=12):
    x = np.sort(rng.uniform(0, 5, n))
    y = np.sin(2 * x) + 0.1 * rng.standard_normal(n)
    return jnp.asarray(x), jnp.asarray(y[:, None])


def test_pep_gaussian_recovers_gpr(rng):
    """EP (alpha=1) with an exact Gaussian likelihood converges to the exact
    posterior: the site-model evidence equals the GPR evidence."""
    x, y = make_data(rng)
    kernel = Matern32(lengthscale=0.7, variance=1.2)
    pep = PowerExpectationPropagation(
        kernel, (x, y), PEPGaussian(Gaussian(variance=NOISE**2)),
        learning_rate=1.0, alpha=1.0)
    gpr = GaussianProcessRegression(
        (x, y), Matern32(lengthscale=0.7, variance=1.2), jnp.asarray([[NOISE]]))
    for _ in range(3):
        pep = UPDATE_SITES(pep)
    assert_allclose(float(ELBO(pep)), float(LOGLIK(gpr)), rtol=1e-6)
    x_new = jnp.asarray([0.4, 2.2])
    f_p, v_p = PREDICT_F(pep, x_new)
    f_g, v_g = PREDICT_F(gpr, x_new)
    assert_allclose(np.asarray(f_p), np.asarray(f_g), atol=1e-6)
    assert_allclose(np.asarray(v_p), np.asarray(v_g), atol=1e-6)


def test_pep_quadrature_matches_analytic_gaussian(rng):
    """PEPScalarLikelihood (quadrature) site updates agree with the analytic
    PEPGaussian on the same data.  Uses a moderate noise scale + extra
    Gauss-Hermite nodes: a likelihood much narrower than q(f) is the classic
    failure mode of fixed-node quadrature (same limitation as the
    reference's gpflow quadrature)."""
    x, y = make_data(rng, n=8)
    kernel = Matern32(lengthscale=0.7, variance=1.2)
    base = Gaussian(variance=0.5**2)
    pep_q = PowerExpectationPropagation(
        kernel, (x, y), PEPScalarLikelihood(base, num_gauss_hermite_points=60),
        learning_rate=1.0, alpha=0.5)
    pep_a = PowerExpectationPropagation(
        kernel, (x, y), PEPGaussian(base), learning_rate=1.0, alpha=0.5)
    pep_q, pep_a = UPDATE_SITES(pep_q), UPDATE_SITES(pep_a)
    assert_allclose(np.asarray(pep_q.sites.nat1), np.asarray(pep_a.sites.nat1),
                    atol=1e-4)
    assert_allclose(np.asarray(pep_q.sites.nat2), np.asarray(pep_a.sites.nat2),
                    atol=1e-4)


def test_pep_energy_finite_and_improves(rng):
    x, y = make_data(rng)
    pep = PowerExpectationPropagation(
        Matern32(lengthscale=0.7, variance=1.2), (x, y),
        PEPGaussian(Gaussian(variance=NOISE**2)), learning_rate=0.7,
        alpha=0.8)
    e0 = float(pep.energy())
    for _ in range(5):
        pep = UPDATE_SITES(pep)
    e1 = float(pep.energy())
    assert np.isfinite(e0) and np.isfinite(e1)
    assert e1 > e0


def test_iwvi_elbo_monotone_in_k(rng):
    """IW-ELBO is non-decreasing in the number of importance samples
    (pattern: reference models/test_importance_weighted_vi.py)."""
    x, y = make_data(rng, n=10)
    kernel = Matern32(lengthscale=0.7, variance=1.2)
    key = jax.random.PRNGKey(42)

    def avg_elbo(k_samples):
        model = ImportanceWeightedVI(kernel, x, Gaussian(variance=NOISE**2),
                                     num_importance_samples=k_samples)
        vals = [float(ELBO_D(model, (x, y), jax.random.fold_in(key, i)))
                for i in range(60)]
        return np.mean(vals)

    e1, e5, e20 = avg_elbo(1), avg_elbo(5), avg_elbo(20)
    assert e5 > e1 - 0.15
    assert e20 > e1 - 0.05
    # K=1 equals the standard ELBO in expectation; larger K tightens towards
    # the evidence
    gpr = GaussianProcessRegression(
        (x, y), Matern32(lengthscale=0.7, variance=1.2), jnp.asarray([[NOISE]]))
    assert e20 <= float(LOGLIK(gpr)) + 0.5


def test_iwvi_resampled_trajectories_match_expected_value(rng):
    """Categorically-resampled IW posterior trajectories
    (reference: posterior.py:623-674) have the same mean as the
    Rao-Blackwellized self-normalized estimate (`expected_value`)."""
    x, y = make_data(rng, n=8)
    kernel = Matern32(lengthscale=0.7, variance=1.2)
    model = ImportanceWeightedVI(kernel, x, Gaussian(variance=NOISE**2),
                                 num_importance_samples=6)
    post = model.posterior
    t_new = jnp.asarray([0.9, 2.1, 3.3])
    n_mc = 256
    key = jax.random.PRNGKey(3)
    key_r, key_e = jax.random.split(key)

    @jax.jit
    def draw_resampled(k):
        s, _ = post.sample_state_trajectories(t_new, (n_mc,), k,
                                              input_data=(x, y))
        return s  # [n_mc, 3, d]

    @jax.jit
    def draw_expected(k):
        return jax.vmap(
            lambda kk: post.expected_value(t_new, (x, y), kk))(
            jax.random.split(k, n_mc))  # [n_mc, 3, d]

    from tests.tools.check_distributions import (
        assert_samples_close_in_expectation)

    s_re = np.asarray(draw_resampled(key_r))
    s_ev = np.asarray(draw_expected(key_e))
    assert s_re.shape == s_ev.shape == (n_mc, 3, kernel.state_dim)
    assert_samples_close_in_expectation(s_re, s_ev, sigma=4.0)


def test_iwvi_sample_f_shapes_and_finite(rng):
    x, y = make_data(rng, n=8)
    model = ImportanceWeightedVI(Matern32(lengthscale=0.7, variance=1.2), x,
                                 Gaussian(variance=NOISE**2),
                                 num_importance_samples=4)
    t_new = jnp.asarray([0.5, 1.5])
    f = jax.jit(lambda k: model.posterior.sample_f(
        t_new, (7,), k, input_data=(x, y)))(jax.random.PRNGKey(0))
    assert f.shape == (7, 2, 1)
    assert np.all(np.isfinite(np.asarray(f)))
    # input_data is mandatory for IW sampling, as in the reference
    import pytest
    with pytest.raises(ValueError):
        model.posterior.sample_state_trajectories(
            t_new, (7,), jax.random.PRNGKey(0))


def test_iwvi_dregs_gradient_finite(rng):
    x, y = make_data(rng, n=10)
    model = ImportanceWeightedVI(Matern32(lengthscale=0.7, variance=1.2), x,
                                 Gaussian(variance=NOISE**2),
                                 num_importance_samples=4)
    key = jax.random.PRNGKey(0)

    def obj(ssm):
        return model.with_dist_q(ssm).dregs_objective((x, y), key)

    grads = jax.grad(obj)(model.dist_q.non_trainable_copy())
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert any(float(jnp.max(jnp.abs(l))) > 0 for l in leaves)
