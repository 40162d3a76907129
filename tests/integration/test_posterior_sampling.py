"""ConditionalProcess joint-sampling statistics vs closed-form predictions
(reference pattern: tests/integration/test_posterior.py:121-182)."""
import jax
import jax.numpy as jnp
import numpy as np
from numpy.testing import assert_allclose

from markovflow_tpu.kernels import Matern32
from markovflow_tpu.models import GaussianProcessRegression
from tests.tools import PREDICT_F


def _gpr(rng, n=14):
    x = np.sort(rng.uniform(0, 6, n))
    y = np.sin(2 * x)[:, None] + 0.1 * rng.standard_normal((n, 1))
    return GaussianProcessRegression(
        input_data=(jnp.asarray(x), jnp.asarray(y)),
        kernel=Matern32(lengthscale=1.0, variance=1.0),
        chol_obs_covariance=jnp.asarray([[0.3]])), x


def test_sample_f_moments_match_predict_f(rng):
    """Mean/variance of pathwise-conditioned joint posterior samples match
    the closed-form posterior marginals, including the correction path at
    interior (off-grid) and extrapolation points."""
    model, x = _gpr(rng)
    post = model.posterior
    t_new = jnp.asarray(np.concatenate([
        0.5 * (x[2:7] + x[3:8]),          # interior off-grid
        x[-1] + np.array([0.5, 1.5]),     # future
    ]))
    n_samples = 4000
    samples = post.sample_f(t_new, n_samples, jax.random.PRNGKey(3))
    mu, var = PREDICT_F(post, t_new)
    se_mean = np.sqrt(np.asarray(var)[..., 0] / n_samples)
    err = np.abs(np.asarray(samples).mean(0)[..., 0] - np.asarray(mu)[..., 0])
    assert np.all(err < 5 * se_mean), (err, se_mean)
    sample_var = np.asarray(samples).var(0)[..., 0]
    assert_allclose(sample_var, np.asarray(var)[..., 0], rtol=0.15)


def test_sample_trajectories_hit_conditioning_consistency(rng):
    """Joint (s, u) samples: the s-marginals at the conditioning points
    themselves reproduce q(u)'s marginals (the correction is exact there)."""
    model, x = _gpr(rng)
    post = model.posterior
    t_new = jnp.asarray(x[3:6])  # coincide with conditioning points
    n_samples = 3000
    s, u = post.sample_state_trajectories(t_new, n_samples,
                                          jax.random.PRNGKey(5))
    assert u.shape == (n_samples,) + (len(x), 2)
    # at exact hits, s must equal the corresponding u draw
    assert_allclose(np.asarray(s), np.asarray(u)[:, 3:6, :], atol=1e-6)


def test_sample_shapes(rng):
    model, x = _gpr(rng)
    post = model.posterior
    t_new = jnp.asarray(np.array([1.0, 2.5]))
    for sample_shape in (1, 6, (10, 3), (2, 1, 3)):
        s = post.sample_f(t_new, sample_shape, jax.random.PRNGKey(0))
        expect = (sample_shape if isinstance(sample_shape, tuple)
                  else (sample_shape,))
        assert s.shape == expect + (2, 1)


def test_zero_samples(rng):
    model, _ = _gpr(rng)
    s = model.posterior.sample_f(jnp.asarray([7.0]), 0, jax.random.PRNGKey(0))
    assert s.size == 0
