"""Unit tests for conditionals.py against dense-Gaussian oracles
(reference pattern: tests/integration/test_posterior.py + the CR docstring
in reference conditionals.py:258-376)."""
import jax.numpy as jnp
import pytest
import numpy as np
from numpy.testing import assert_allclose

from markovflow_tpu.conditionals import (
    base_conditional_predict,
    conditional_predict,
    conditional_statistics,
    cyclic_reduction_conditional_statistics,
)
from markovflow_tpu.kernels import Matern12, Matern32, Matern52


def dense_joint(kernel, ts):
    """Dense joint covariance over states at ts via the SSM precision."""
    ssm = kernel.state_space_model(jnp.asarray(ts))
    prec = np.asarray(ssm.precision().to_dense())
    return np.linalg.inv(prec), ssm


def test_conditional_statistics_match_dense_gaussian_conditioning(rng):
    """p(x* | x-, x+) from conditional_statistics == dense conditioning of
    the joint over [existing ∪ new] (reference: conditionals.py:122-254)."""
    kernel = Matern32(lengthscale=0.8, variance=1.3)
    d = kernel.state_dim
    existing = np.sort(rng.uniform(0, 5, 6))
    new = np.array([existing[1] + 0.3 * (existing[2] - existing[1])])
    merged = np.sort(np.concatenate([existing, new]))
    sigma, _ = dense_joint(kernel, merged)
    i_new = int(np.searchsorted(merged, new[0]))
    i_l, i_r = i_new - 1, i_new + 1

    blk = lambda i, j: sigma[i * d:(i + 1) * d, j * d:(j + 1) * d]
    s_nn = blk(i_new, i_new)
    s_nc = np.concatenate([blk(i_new, i_l), blk(i_new, i_r)], axis=1)
    s_cc = np.block([[blk(i_l, i_l), blk(i_l, i_r)],
                     [blk(i_r, i_l), blk(i_r, i_r)]])
    proj_oracle = s_nc @ np.linalg.inv(s_cc)
    cov_oracle = s_nn - proj_oracle @ s_nc.T

    p, off, t_cov, idx = conditional_statistics(
        jnp.asarray(new), jnp.asarray(existing), kernel)
    assert int(idx[0]) == int(np.searchsorted(existing, new[0]))
    assert_allclose(np.asarray(p[0]), proj_oracle, atol=1e-8)
    assert_allclose(np.asarray(t_cov[0]), cov_oracle, atol=1e-8)
    assert_allclose(np.asarray(off[0]), 0.0, atol=1e-10)  # zero-mean kernel


@pytest.mark.parametrize("make_kernel", [
    lambda: Matern12(lengthscale=0.6, variance=0.9),
    pytest.param(lambda: Matern52(lengthscale=1.1, variance=1.4),
                 marks=pytest.mark.slow),
], ids=["m12", "m52"])
def test_conditional_predict_matches_union_grid_marginals(rng, make_kernel):
    for kernel in (make_kernel(),):
        existing = np.sort(rng.uniform(0, 4, 7))
        t_new = np.array([0.5 * (existing[i] + existing[i + 1])
                          for i in (0, 2, 4)])
        ssm = kernel.state_space_model(jnp.asarray(existing))
        means, covs = conditional_predict(
            jnp.asarray(t_new), jnp.asarray(existing), kernel, ssm)
        union = np.sort(np.concatenate([existing, t_new]))
        ssm_u = kernel.state_space_model(jnp.asarray(union))
        idx = np.searchsorted(union, t_new)
        assert_allclose(np.asarray(means),
                        np.asarray(ssm_u.marginal_means)[idx], atol=1e-7)
        assert_allclose(np.asarray(covs),
                        np.asarray(ssm_u.marginal_covariances)[idx],
                        atol=1e-7)


def test_base_conditional_predict_shapes(rng):
    d = 2
    n = 4
    p = jnp.asarray(rng.standard_normal((n, d, 2 * d)))
    off = jnp.asarray(rng.standard_normal((n, d)))
    t_cov = jnp.broadcast_to(jnp.eye(d), (n, d, d))
    adj = jnp.asarray(rng.standard_normal((n, 2 * d)))
    means, covs = base_conditional_predict(p, off, t_cov, adj)
    assert means.shape == (n, d) and covs.shape == (n, d, d)
    expected = np.einsum("nij,nj->ni", np.asarray(p), np.asarray(adj)) + \
        np.asarray(off)
    assert_allclose(np.asarray(means), expected, atol=1e-12)


def test_cyclic_reduction_factors_round_trip_dense(rng):
    """(F, G, L) factors reproduce the dense conditional of the explained
    points given the conditioning points: cov == blockdiag((L Lᵀ)⁻¹) and
    mean projections D_t = -L_t⁻ᵀ G_{t-1}ᵀ, E_t = -L_t⁻ᵀ F_tᵀ
    (reference: conditionals.py:258-376)."""
    for n in (9, 8):  # n_e = n_c + 1 and n_e = n_c
        x = np.sort(rng.uniform(0, 5, n))
        expl, cond = x[0::2], x[1::2]
        n_e, n_c = len(expl), len(cond)
        kernel = Matern32(lengthscale=0.8, variance=1.1)
        d = kernel.state_dim
        f_fac, g_fac, l_fac = cyclic_reduction_conditional_statistics(
            jnp.asarray(expl), jnp.asarray(cond), kernel)
        assert f_fac.shape == (n_c, d, d)
        assert g_fac.shape == (n_e - 1, d, d)
        assert l_fac.shape == (n_e, d, d)
        f_fac, g_fac, l_fac = map(np.asarray, (f_fac, g_fac, l_fac))

        sigma, _ = dense_joint(kernel, x)
        e_idx = np.arange(n)[0::2]
        c_idx = np.arange(n)[1::2]
        rows = lambda idx: np.concatenate(
            [np.arange(i * d, (i + 1) * d) for i in idx])
        ei, ci = rows(e_idx), rows(c_idx)
        s_ee = sigma[np.ix_(ei, ei)]
        s_ec = sigma[np.ix_(ei, ci)]
        s_cc = sigma[np.ix_(ci, ci)]
        proj = s_ec @ np.linalg.inv(s_cc)          # [n_e d, n_c d]
        cond_cov = s_ee - proj @ s_ec.T            # block diagonal

        for t in range(n_e):
            lt = l_fac[t]
            # covariance block
            assert_allclose(cond_cov[t * d:(t + 1) * d, t * d:(t + 1) * d],
                            np.linalg.inv(lt @ lt.T), atol=1e-7)
            # off-blockdiagonal of the conditional covariance vanishes
            row = cond_cov[t * d:(t + 1) * d].copy()
            row[:, t * d:(t + 1) * d] = 0.0
            assert_allclose(row, 0.0, atol=1e-7)
            lt_inv_t = np.linalg.inv(lt).T
            if t >= 1:  # D_t: weight on the left conditioning point c_{t-1}
                d_t = -lt_inv_t @ g_fac[t - 1].T
                assert_allclose(
                    proj[t * d:(t + 1) * d, (t - 1) * d:t * d], d_t,
                    atol=1e-7)
            if t < n_c:  # E_t: weight on the right conditioning point c_t
                e_t = -lt_inv_t @ f_fac[t].T
                assert_allclose(
                    proj[t * d:(t + 1) * d, t * d:(t + 1) * d], e_t,
                    atol=1e-7)


@pytest.mark.parametrize("make_kernel", [
    lambda: Matern32(lengthscale=0.8, variance=1.3),
    pytest.param(lambda: Matern12(lengthscale=0.6, variance=0.9),
                 marks=pytest.mark.slow),
    pytest.param(lambda: Matern52(lengthscale=1.1, variance=1.4),
                 marks=pytest.mark.slow),
], ids=["m32", "m12", "m52"])
def test_conditional_predict_tl_matches_standard_path(rng, make_kernel):
    """The time-last projection core (the SVGP/predict_f hot path) agrees
    with the standard-layout path on interior points, exact grid hits, and
    extrapolation beyond both ends (reference: posterior.py:207-229)."""
    from markovflow_tpu.conditionals import conditional_predict_tl
    from markovflow_tpu.ops.kalman import _from_tl

    kernel = make_kernel()
    existing = np.sort(rng.uniform(0, 4, 7))
    t_new = np.sort(np.concatenate([
        0.5 * (existing[:-1] + existing[1:])[:3],  # interior
        existing[[1, 4]],                          # exact hits
        np.array([-0.7, existing[-1] + 0.9]),      # extrapolation
    ]))
    ssm = kernel.state_space_model(jnp.asarray(existing))
    means, covs = conditional_predict(
        jnp.asarray(t_new), jnp.asarray(existing), kernel, ssm)
    means_tl, covs_tl = conditional_predict_tl(
        jnp.asarray(t_new), jnp.asarray(existing), kernel, ssm)
    assert_allclose(np.asarray(_from_tl(means_tl))[..., 0],
                    np.asarray(means), atol=1e-9, rtol=1e-8)
    assert_allclose(np.asarray(_from_tl(covs_tl)), np.asarray(covs),
                    atol=1e-9, rtol=1e-8)
