"""Model-level explicit-collective sequence parallelism
(grad_engine="collective") on the virtual 8-device mesh."""
import jax
import jax.numpy as jnp
import numpy as np
from numpy.testing import assert_allclose

from markovflow_tpu.kernels import Matern32
from markovflow_tpu.models import GaussianProcessRegression
from markovflow_tpu.parallel import make_mesh
from markovflow_tpu.utils import filtered_value_and_grad, trainable_mask


def _model(rng, n, **kw):
    # key the data generator on n alone so repeated calls build models
    # over IDENTICAL observations (rng is stateful across calls)
    del rng
    data_rng = np.random.default_rng(n)
    x = np.linspace(0.0, 10.0, n)
    y = np.sin(2 * x)[:, None] + 0.1 * data_rng.standard_normal((n, 1))
    return GaussianProcessRegression(
        input_data=(jnp.asarray(x), jnp.asarray(y)),
        kernel=Matern32(lengthscale=0.8, variance=1.1),
        chol_obs_covariance=jnp.asarray([[0.3]]), **kw)


def test_collective_engine_matches_koopman(rng):
    n = 64
    mesh = make_mesh(dp=1, sp=8)
    ref = _model(rng, n)  # koopman default
    col = _model(rng, n, grad_engine="collective", mesh=mesh,
                 shard_axis="sp")
    ll_ref = float(jax.jit(lambda m: m.log_likelihood())(ref))
    ll_col = float(jax.jit(lambda m: m.log_likelihood())(col))
    assert_allclose(ll_col, ll_ref, rtol=1e-10)

    mask = trainable_mask(ref)
    _, g_ref = jax.jit(lambda m: filtered_value_and_grad(
        lambda mm: mm.loss(), m, mask))(ref)
    _, g_col = jax.jit(lambda m: filtered_value_and_grad(
        lambda mm: mm.loss(), m, mask))(col)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_col)):
        assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-8, atol=1e-10)


def test_collective_engine_requires_mesh(rng):
    model = _model(rng, 16, grad_engine="collective")
    try:
        model.log_likelihood()
        raise AssertionError("expected ValueError without a mesh")
    except ValueError:
        pass
