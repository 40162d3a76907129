"""Training helpers + checkpointing round trip."""
import jax.numpy as jnp
import numpy as np
from numpy.testing import assert_allclose

from markovflow_tpu.kernels import Matern32
from markovflow_tpu.likelihoods import Gaussian
from markovflow_tpu.models import GaussianProcessRegression
from markovflow_tpu.models.variational import VariationalGaussianProcess
from markovflow_tpu.training import (
    fit,
    fit_natgrad,
    load_checkpoint,
    save_checkpoint,
)


def make_gpr(rng, ell=1.5):
    x = np.sort(rng.uniform(0, 5, 40))
    y = np.sin(2 * x)[:, None] + 0.1 * rng.standard_normal((40, 1))
    return GaussianProcessRegression(
        (jnp.asarray(x), jnp.asarray(y)), Matern32(lengthscale=ell),
        jnp.asarray([[0.2]]))


def test_fit_decreases_loss(rng):
    model = make_gpr(rng)
    trained, losses = fit(model, num_steps=80)
    assert float(losses[-1]) < float(losses[0]) - 0.2
    assert float(trained.kernel.lengthscale.value) != 1.5


def test_fit_natgrad_two_phase(rng):
    x = np.sort(rng.uniform(0, 5, 30))
    y = np.sin(2 * x)[:, None] + 0.1 * rng.standard_normal((30, 1))
    vgp = VariationalGaussianProcess(
        (jnp.asarray(x), jnp.asarray(y)), Matern32(lengthscale=1.0),
        Gaussian(variance=0.04))
    trained, losses = fit_natgrad(vgp, num_steps=15, gamma=0.8)
    assert float(losses[-1]) < float(losses[0]) - 1.0


def test_checkpoint_roundtrip(tmp_path, rng):
    model = make_gpr(rng)
    trained, _ = fit(model, num_steps=5)
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, trained)
    template = make_gpr(rng)  # fresh params, same structure
    restored = load_checkpoint(path, template)
    assert_allclose(
        float(restored.kernel.lengthscale.value),
        float(trained.kernel.lengthscale.value), rtol=1e-12)
    assert_allclose(float(restored.loss()), float(trained.loss()), rtol=1e-12)
