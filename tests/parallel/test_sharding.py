"""Multi-device sharding: numerics must be identical to single-device.

Runs on the 8 virtual CPU devices configured in conftest (the SPMD analogue
of the reference's nonexistent distributed support, SURVEY.md section 2.7).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P
from numpy.testing import assert_allclose

from markovflow_tpu.kernels import Matern32
from markovflow_tpu.models import GaussianProcessRegression
from markovflow_tpu.parallel import make_mesh


@pytest.fixture
def data(rng):
    batch, n = 4, 64
    x = np.broadcast_to(np.linspace(0, 10, n), (batch, n)).copy()
    y = np.sin(x)[..., None] + 0.1 * rng.standard_normal((batch, n, 1))
    return jnp.asarray(x), jnp.asarray(y)


def _loss(x, y):
    model = GaussianProcessRegression(
        (x, y), Matern32(lengthscale=0.7, variance=1.2),
        jnp.asarray([[0.3]]))
    return model.loss()


def test_dp_sp_sharded_loss_matches_single_device(data):
    x, y = data
    baseline = np.asarray(jax.jit(_loss)(x, y))

    mesh = make_mesh(dp=2, sp=4)
    xs = jax.device_put(x, NamedSharding(mesh, P("dp", "sp")))
    ys = jax.device_put(y, NamedSharding(mesh, P("dp", "sp", None)))
    with mesh:
        sharded = np.asarray(jax.jit(_loss)(xs, ys))
    assert_allclose(sharded, baseline, rtol=1e-12)


def test_sharded_grads_match(data):
    x, y = data

    def total_loss(ell, x, y):
        model = GaussianProcessRegression(
            (x, y), Matern32(lengthscale=ell, variance=1.2),
            jnp.asarray([[0.3]]))
        return jnp.sum(model.loss())

    g0 = float(jax.jit(jax.grad(total_loss))(0.7, x, y))
    mesh = make_mesh(dp=2, sp=4)
    xs = jax.device_put(x, NamedSharding(mesh, P("dp", "sp")))
    ys = jax.device_put(y, NamedSharding(mesh, P("dp", "sp", None)))
    with mesh:
        g1 = float(jax.jit(jax.grad(total_loss))(0.7, xs, ys))
    assert_allclose(g1, g0, rtol=1e-10)


def test_prediction_sharded(data):
    x, y = data
    mesh = make_mesh(dp=4, sp=2)

    def predict(x, y):
        model = GaussianProcessRegression(
            (x, y), Matern32(lengthscale=0.7, variance=1.2),
            jnp.asarray([[0.3]]))
        return model.posterior.dist.marginal_means

    base = np.asarray(jax.jit(predict)(x, y))
    xs = jax.device_put(x, NamedSharding(mesh, P("dp", "sp")))
    ys = jax.device_put(y, NamedSharding(mesh, P("dp", "sp", None)))
    with mesh:
        out = np.asarray(jax.jit(predict)(xs, ys))
    assert_allclose(out, base, atol=1e-10)
