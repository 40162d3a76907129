"""FactorAnalysisKernel and stacked-output kernels
(pattern: reference tests/integration/test_f_covariance.py and notebooks)."""
import jax.numpy as jnp
import numpy as np
from numpy.testing import assert_allclose

from markovflow_tpu.kernels import (
    FactorAnalysisKernel,
    IndependentMultiOutputStack,
    Matern12,
    Matern32,
)

SQRT3 = np.sqrt(3.0)


def test_factor_analysis_kernel(rng):
    """f = A(t) B g(t): with A = I and B given, Cov(f) = B Cov(g) B^T."""
    latents = [Matern12(lengthscale=0.7, variance=1.3),
               Matern32(lengthscale=1.1, variance=0.4)]
    B = jnp.asarray(rng.standard_normal((3, 2)))
    weight_fn = lambda t: jnp.broadcast_to(
        jnp.eye(3), t.shape[:-1] + (t.shape[-1], 3, 3))
    kernel = FactorAnalysisKernel(weight_fn, latents, output_dim=3,
                                  loading=B, trainable_loading=False)
    ts = jnp.asarray([0.0, 0.4, 1.3])
    ssm = kernel.state_space_model(ts)
    em = kernel.generate_emission_model(ts)
    _, covs = ssm.marginals
    f_cov = em.project_state_covariance_to_f(covs, full_output_cov=True)
    # at any single time, Cov(g) = diag(vars of latents)
    g_cov = np.diag([1.3, 0.4])
    expected = np.asarray(B) @ g_cov @ np.asarray(B).T
    for i in range(3):
        assert_allclose(np.asarray(f_cov)[i], expected, atol=1e-9)
    # intermediate-space projection available (ComposedPairEmissionModel)
    g_var = em.project_state_covariance_to_g(covs)
    assert_allclose(np.asarray(g_var)[0], np.diag(g_cov), atol=1e-9)


def test_independent_multi_output_stack(rng):
    k1 = Matern12(lengthscale=0.7, variance=1.3)
    k2 = Matern32(lengthscale=1.1, variance=0.4)
    stack = IndependentMultiOutputStack([k1, k2])
    ts = jnp.broadcast_to(jnp.asarray([0.0, 0.5, 1.5]), (2, 3))
    ssm = stack.state_space_model(ts)
    em = stack.generate_emission_model(ts)
    means, covs = ssm.marginals
    f_var = em.project_state_covariance_to_f(covs)
    assert f_var.shape == (3, 2)
    assert_allclose(np.asarray(f_var)[:, 0], 1.3, atol=1e-9)
    assert_allclose(np.asarray(f_var)[:, 1], 0.4, atol=1e-9)

    # elementwise combination of stacks
    both = stack + stack
    assert both.num_kernels == 2
    ssm2 = both.state_space_model(ts)
    em2 = both.generate_emission_model(ts)
    v2 = em2.project_state_covariance_to_f(ssm2.marginal_covariances)
    assert_allclose(np.asarray(v2)[:, 0], 2 * 1.3, atol=1e-8)
    assert_allclose(np.asarray(v2)[:, 1], 2 * 0.4, atol=1e-8)

    prod = stack * stack
    v3 = prod.generate_emission_model(ts).project_state_covariance_to_f(
        prod.state_space_model(ts).marginal_covariances)
    assert_allclose(np.asarray(v3)[:, 0], 1.3**2, atol=1e-8)
    assert_allclose(np.asarray(v3)[:, 1], 0.4**2, atol=1e-8)
