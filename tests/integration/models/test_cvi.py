"""CVI tests (pattern: reference tests/integration/models/test_variational_cvi.py)."""
import jax.numpy as jnp
import numpy as np
from numpy.testing import assert_allclose

from markovflow_tpu.kernels import Matern32
from markovflow_tpu.likelihoods import Gaussian, Poisson
from markovflow_tpu.models import GaussianProcessRegression
from markovflow_tpu.models.variational_cvi import CVIGaussianProcess
from tests.tools import CLASSIC_ELBO, ELBO, LOGLIK, PREDICT_F, UPDATE_SITES

NOISE = 0.3


def make_data(rng, n=14):
    x = np.sort(rng.uniform(0, 5, n))
    y = np.sin(2 * x) + 0.1 * rng.standard_normal(n)
    return jnp.asarray(x), jnp.asarray(y[:, None])


def test_cvi_gaussian_converges_to_gpr(rng):
    """With a Gaussian likelihood and lr=1, CVI sites converge to the exact
    likelihood factors in one step, recovering GPR."""
    x, y = make_data(rng)
    kernel = Matern32(lengthscale=0.7, variance=1.2)
    cvi = CVIGaussianProcess((x, y), kernel, Gaussian(variance=NOISE**2),
                             learning_rate=1.0)
    gpr = GaussianProcessRegression(
        (x, y), Matern32(lengthscale=0.7, variance=1.2), jnp.asarray([[NOISE]]))
    cvi = UPDATE_SITES(cvi)
    assert_allclose(float(ELBO(cvi)), float(LOGLIK(gpr)), rtol=1e-8)
    # posterior parity at new points
    x_new = jnp.asarray([0.4, 2.3, 4.9])
    f_c, v_c = PREDICT_F(cvi, x_new)
    f_g, v_g = PREDICT_F(gpr, x_new)
    assert_allclose(np.asarray(f_c), np.asarray(f_g), atol=1e-7)
    assert_allclose(np.asarray(v_c), np.asarray(v_g), atol=1e-7)


def test_cvi_elbo_equals_classic_elbo_at_convergence(rng):
    x, y = make_data(rng)
    kernel = Matern32(lengthscale=0.7, variance=1.2)
    cvi = CVIGaussianProcess((x, y), kernel, Gaussian(variance=NOISE**2),
                             learning_rate=1.0)
    cvi = UPDATE_SITES(cvi)
    # For the Gaussian case at convergence both ELBOs equal log p(y)
    assert_allclose(float(ELBO(cvi)), float(CLASSIC_ELBO(cvi)), rtol=1e-7)


def test_cvi_poisson_improves(rng):
    """Log-Gaussian Cox process (BASELINE config 4): classic ELBO increases
    monotonically over site updates."""
    x = jnp.asarray(np.linspace(0, 4, 25))
    counts = rng.poisson(np.exp(np.sin(2 * np.asarray(x)) * 1.0))
    y = jnp.asarray(counts[:, None].astype(float))
    cvi = CVIGaussianProcess((x, y), Matern32(lengthscale=0.8, variance=1.0),
                             Poisson(), learning_rate=0.5)
    elbos = [float(CLASSIC_ELBO(cvi))]
    for _ in range(15):
        cvi = UPDATE_SITES(cvi)
        elbos.append(float(CLASSIC_ELBO(cvi)))
    assert elbos[-1] > elbos[0] + 1.0
    diffs = np.diff(np.asarray(elbos[5:]))
    assert np.all(diffs > -1e-6)  # monotone after burn-in
