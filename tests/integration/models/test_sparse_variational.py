"""SVGP and SparseCVI tests
(pattern: reference tests/integration/models/test_sparse_variational.py:128-195)."""
import jax.numpy as jnp
import numpy as np
from numpy.testing import assert_allclose

from markovflow_tpu.kernels import Matern32
from markovflow_tpu.likelihoods import Gaussian
from markovflow_tpu.models import GaussianProcessRegression
from markovflow_tpu.models.sparse_variational import (
    SparseVariationalGaussianProcess,
)
from markovflow_tpu.models.sparse_variational_cvi import (
    SparseCVIGaussianProcess,
)
from markovflow_tpu.ssm_natgrad import SSMNaturalGradient
from tests.tools import CLASSIC_ELBO_D, LOGLIK, PREDICT_F, UPDATE_SITES_D

NOISE = 0.3


def make_data(rng, n=12):
    x = np.sort(rng.uniform(0, 5, n))
    y = np.sin(2 * x) + 0.1 * rng.standard_normal(n)
    return jnp.asarray(x), jnp.asarray(y[:, None])


def test_svgp_with_inducing_equal_data_recovers_gpr(rng):
    """SVGP with Z = X after one natgrad step reaches the GPR evidence."""
    x, y = make_data(rng)
    kernel = Matern32(lengthscale=0.7, variance=1.2)
    svgp = SparseVariationalGaussianProcess(
        kernel, Gaussian(variance=NOISE**2), inducing_points=x)
    gpr = GaussianProcessRegression(
        (x, y), Matern32(lengthscale=0.7, variance=1.2), jnp.asarray([[NOISE]]))

    opt = SSMNaturalGradient(gamma=1.0)
    loss_fn = lambda s: svgp.with_dist_q(s).loss((x, y))
    ssm1, _, _ = opt.step(loss_fn, svgp.dist_q.non_trainable_copy())
    elbo = float(svgp.with_dist_q(ssm1).elbo((x, y)))
    assert_allclose(elbo, float(LOGLIK(gpr)), rtol=1e-8)


def test_svgp_sparse_elbo_below_gpr(rng):
    x, y = make_data(rng, n=30)
    z = jnp.asarray(np.linspace(float(x[0]), float(x[-1]), 8))
    kernel = Matern32(lengthscale=0.7, variance=1.2)
    svgp = SparseVariationalGaussianProcess(
        kernel, Gaussian(variance=NOISE**2), inducing_points=z)
    gpr = GaussianProcessRegression(
        (x, y), Matern32(lengthscale=0.7, variance=1.2), jnp.asarray([[NOISE]]))
    opt = SSMNaturalGradient(gamma=0.8)
    ssm = svgp.dist_q.non_trainable_copy()
    loss_fn = lambda s: svgp.with_dist_q(s).loss((x, y))
    state = None
    for _ in range(20):
        ssm, state, _ = opt.step(loss_fn, ssm, state)
    elbo = float(svgp.with_dist_q(ssm).elbo((x, y)))
    gpr_ll = float(LOGLIK(gpr))
    assert elbo <= gpr_ll + 1e-6
    assert elbo > gpr_ll - 5.0  # reasonably tight

    # predictions are close to GPR
    f_s, _ = svgp.with_dist_q(ssm).predict_f(x)
    f_g, _ = PREDICT_F(gpr, x)
    assert float(jnp.max(jnp.abs(f_s - f_g))) < 0.25


def test_scvi_with_inducing_equal_data_recovers_gpr(rng):
    """SCVI with Z = X and lr = 1: one site update recovers the GPR posterior
    (pattern: reference tests for sparse CVI)."""
    x, y = make_data(rng)
    kernel = Matern32(lengthscale=0.7, variance=1.2)
    scvi = SparseCVIGaussianProcess(
        kernel, inducing_points=x, likelihood=Gaussian(variance=NOISE**2),
        learning_rate=1.0)
    gpr = GaussianProcessRegression(
        (x, y), Matern32(lengthscale=0.7, variance=1.2), jnp.asarray([[NOISE]]))
    scvi = UPDATE_SITES_D(scvi, (x, y))
    assert_allclose(float(CLASSIC_ELBO_D(scvi, (x, y))),
                    float(LOGLIK(gpr)), rtol=1e-7)
    x_new = jnp.asarray([0.4, 2.2, 4.7])
    f_c, v_c = PREDICT_F(scvi, x_new)
    f_g, v_g = PREDICT_F(gpr, x_new)
    assert_allclose(np.asarray(f_c), np.asarray(f_g), atol=1e-6)
    assert_allclose(np.asarray(v_c), np.asarray(v_g), atol=1e-6)


def test_scvi_sparse_improves(rng):
    x, y = make_data(rng, n=40)
    z = jnp.asarray(np.linspace(float(x[0]) - 0.1, float(x[-1]) + 0.1, 10))
    scvi = SparseCVIGaussianProcess(
        Matern32(lengthscale=0.7, variance=1.2), inducing_points=z,
        likelihood=Gaussian(variance=NOISE**2), learning_rate=0.8)
    e0 = float(CLASSIC_ELBO_D(scvi, (x, y)))
    for _ in range(10):
        scvi = UPDATE_SITES_D(scvi, (x, y))
    e1 = float(CLASSIC_ELBO_D(scvi, (x, y)))
    assert e1 > e0 + 1.0
