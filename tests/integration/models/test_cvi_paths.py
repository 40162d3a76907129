"""The two dist_q constructions (parallel filter vs naturals) agree."""
import jax.numpy as jnp
import numpy as np
from numpy.testing import assert_allclose

from markovflow_tpu.kernels import Matern32
from markovflow_tpu.likelihoods import Poisson
from markovflow_tpu.models.variational_cvi import CVIGaussianProcess
from tests.tools import UPDATE_SITES


def test_dist_q_filter_equals_naturals(rng):
    x = jnp.asarray(np.linspace(0, 4, 25))
    y = jnp.asarray(rng.poisson(
        np.exp(np.sin(2 * np.asarray(x))))[:, None].astype(float))
    cvi = CVIGaussianProcess((x, y), Matern32(lengthscale=0.8),
                             Poisson(), learning_rate=0.6)
    for _ in range(6):
        cvi = UPDATE_SITES(cvi)
    q_f = cvi.dist_q
    q_n = cvi.dist_q_naturals
    assert_allclose(np.asarray(q_f.marginal_means),
                    np.asarray(q_n.marginal_means), atol=1e-7)
    assert_allclose(np.asarray(q_f.marginal_covariances),
                    np.asarray(q_n.marginal_covariances), atol=1e-7)
    assert_allclose(np.asarray(q_f.state_transitions),
                    np.asarray(q_n.state_transitions), atol=1e-7)
