"""Mean function tests (pattern: reference tests/unit/test_mean_functions.py)."""
import jax.numpy as jnp
import numpy as np
from numpy.testing import assert_allclose

from markovflow_tpu.kernels import Matern12, Matern32
from markovflow_tpu.mean_function import (
    ImpulseMeanFunction,
    LinearMeanFunction,
    StepMeanFunction,
    ZeroMeanFunction,
)


def test_zero_and_linear():
    ts = jnp.asarray([0.0, 0.5, 2.0])
    assert_allclose(np.asarray(ZeroMeanFunction()(ts)), 0.0)
    assert_allclose(np.asarray(LinearMeanFunction(2.5)(ts))[:, 0],
                    2.5 * np.asarray(ts))


def test_impulse_mean_function_matern12():
    """For Matern-1/2 (state dim 1, F = -1/ell) the impulse response decays
    exponentially from each impulse: mu(t) = sum over past impulses of
    exp(-(t - t_k)/ell) u_k."""
    ell = 0.7
    kernel = Matern12(lengthscale=ell, variance=1.0)
    action_times = jnp.asarray([1.0, 2.0])
    perturbations = jnp.asarray([[1.0], [0.5]])
    mf = ImpulseMeanFunction(action_times, perturbations, kernel)
    ts = jnp.asarray([0.5, 1.5, 2.5])
    got = np.asarray(mf(ts))[:, 0]
    # t=0.5: before any impulse -> 0
    assert_allclose(got[0], 0.0, atol=1e-12)
    # t=1.5: exp(-0.5/ell) * 1
    assert_allclose(got[1], np.exp(-0.5 / ell), rtol=1e-9)
    # t=2.5: exp(-1.5/ell)*1 + exp(-0.5/ell)*0.5
    assert_allclose(got[2], np.exp(-1.5 / ell) + 0.5 * np.exp(-0.5 / ell),
                    rtol=1e-9)


def test_step_mean_function_matern12():
    """Step response for Matern-1/2: mu(t) -> -u/F = u*ell as t - t_k -> inf,
    starting from the pre-step value."""
    ell = 0.5
    kernel = Matern12(lengthscale=ell, variance=1.0)
    action_times = jnp.asarray([1.0])
    perturbations = jnp.asarray([[2.0]])
    mf = StepMeanFunction(action_times, perturbations, kernel)
    ts = jnp.asarray([0.5, 1.0 + 20.0 * ell, 1.5])
    got = np.asarray(mf(ts))[:, 0]
    assert_allclose(got[0], 0.0, atol=1e-12)
    # steady state: -F^{-1} u = ell * u
    assert_allclose(got[1], ell * 2.0, rtol=1e-6)
    # transient: a + exp(F dt) b with a = ell*u, b = -a
    dt = 0.5
    expected = ell * 2.0 * (1 - np.exp(-dt / ell))
    assert_allclose(got[2], expected, rtol=1e-9)


def test_impulse_mean_function_matern32_continuity():
    """State-dim-2 case: response is continuous and starts at the
    perturbation value immediately after the impulse."""
    kernel = Matern32(lengthscale=1.0, variance=1.0)
    action_times = jnp.asarray([1.0])
    perturbations = jnp.asarray([[0.0, 1.0]])  # impulse in the derivative
    mf = ImpulseMeanFunction(action_times, perturbations, kernel)
    eps = 1e-5
    ts = jnp.asarray([1.0 + eps, 1.5, 3.0])
    got = np.asarray(mf(ts))[:, 0]
    assert abs(got[0]) < 1e-3       # f starts near 0 (impulse is in f')
    assert got[1] > 0.1             # rises
    assert abs(got[2]) < got[1]     # decays back
