"""Emission model unit tests (reference: markovflow/emission_model.py)."""
import jax.numpy as jnp
import numpy as np
from numpy.testing import assert_allclose

from markovflow_tpu.emission_model import (
    ComposedPairEmissionModel,
    EmissionModel,
    StackEmissionModel,
)


def test_emission_projections(rng):
    n, d, o = 5, 3, 2
    h = rng.standard_normal((n, o, d))
    em = EmissionModel(jnp.asarray(h))
    assert em.output_dim == o and em.state_dim == d
    x = rng.standard_normal((n, d))
    f = em.project_state_to_f(jnp.asarray(x))
    assert_allclose(np.asarray(f), np.einsum("nij,nj->ni", h, x), atol=1e-12)
    covs = rng.standard_normal((n, d, d))
    covs = covs @ np.swapaxes(covs, -1, -2)
    full = em.project_state_covariance_to_f(jnp.asarray(covs),
                                            full_output_cov=True)
    expected = np.einsum("nij,njk,nlk->nil", h, covs, h)
    assert_allclose(np.asarray(full), expected, atol=1e-10)
    diag = em.project_state_covariance_to_f(jnp.asarray(covs),
                                            full_output_cov=False)
    assert_allclose(np.asarray(diag),
                    np.stack([np.diag(e) for e in expected]), atol=1e-10)
    means, fcovs = em.project_state_marginals_to_f(
        jnp.asarray(x), jnp.asarray(covs))
    assert_allclose(np.asarray(means), np.asarray(f), atol=1e-12)


def test_composed_pair_emission(rng):
    """H = H_outer @ H_inner with the intermediate g-space projections
    (reference: emission_model.py:157-266)."""
    n, d, g_dim, o = 4, 3, 2, 1
    h_in = rng.standard_normal((n, g_dim, d))
    h_out = rng.standard_normal((n, o, g_dim))
    em = ComposedPairEmissionModel(EmissionModel(jnp.asarray(h_out)),
                                   EmissionModel(jnp.asarray(h_in)))
    x = rng.standard_normal((n, d))
    f = em.project_state_to_f(jnp.asarray(x))
    expected = np.einsum("nij,njk,nk->ni", h_out, h_in, x)
    assert_allclose(np.asarray(f), expected, atol=1e-10)
    g = em.project_state_to_g(jnp.asarray(x))
    assert_allclose(np.asarray(g), np.einsum("nij,nj->ni", h_in, x),
                    atol=1e-10)
    covs = rng.standard_normal((n, d, d))
    covs = covs @ np.swapaxes(covs, -1, -2)
    gc = em.project_state_covariance_to_g(jnp.asarray(covs),
                                          full_output_cov=True)
    assert_allclose(np.asarray(gc),
                    np.einsum("nij,njk,nlk->nil", h_in, covs, h_in),
                    atol=1e-10)


def test_stack_emission(rng):
    """Per-kernel emission with the stack (num_kernels) axis mapped to the
    output dim (reference: emission_model.py:270-378)."""
    k, n, d = 3, 5, 2
    h = rng.standard_normal((k, n, 1, d))
    em = StackEmissionModel(jnp.asarray(h))
    assert em.output_dim == k
    x = rng.standard_normal((k, n, d))
    f = em.project_state_to_f(jnp.asarray(x))
    expected = np.einsum("knij,knj->kni", h, x)[..., 0]  # [k, n]
    assert f.shape[-2:] == (n, k)
    assert_allclose(np.asarray(f), np.moveaxis(expected, 0, -1), atol=1e-10)
    covs = rng.standard_normal((k, n, d, d))
    covs = covs @ np.swapaxes(covs, -1, -2)
    fv = em.project_state_covariance_to_f(jnp.asarray(covs),
                                          full_output_cov=False)
    exp_var = np.einsum("knij,knjl,knil->kni", h, covs, h)[..., 0]
    assert_allclose(np.asarray(fv), np.moveaxis(exp_var, 0, -1), atol=1e-10)
