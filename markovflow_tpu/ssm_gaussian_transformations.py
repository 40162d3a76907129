"""Transformations between SSM, expectation, and natural parameterizations.

Rebuild of ``markovflow/ssm_gaussian_transformations.py`` (593 LoC).  These
power natural-gradient updates (:mod:`markovflow_tpu.ssm_natgrad`) and the
CVI family.  Parameterizations (same conventions as the reference):

* **SSM**: (mu0, chol_P0, A_s, b_s, chol_Q_s).
* **Expectation** eta: (eta_linear = marginal means [..., N+1, d];
  eta_diag = Sigma_k + mu_k mu_k^T; eta_subdiag = E[x_{k+1} x_k^T]).
* **Natural** theta: linear term K^{-1} mu and the block-tridiagonal
  -1/2-precision: theta_diag = -1/2 (Q_k^{-1} + A_{k+1}^T Q_{k+1}^{-1} A_{k+1}),
  theta_subdiag = Q_k^{-1} A_k.
* **Natural, no smoothing** (Lin, Khan & Schmidt 2019): per-transition
  naturals without future information: theta_diag = -1/2 Q_k^{-1},
  theta_subdiag = Q_k^{-1} A_k, theta_linear = Q_k^{-1} b_k.

The reference's banded C++ path (cholesky_band + solve_triang_band,
reference: ssm_gaussian_transformations.py:440-511) is replaced by the
block-tridiagonal UDU factorization plus two O(log N)-depth affine scans for
the mean solve.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .block_tri_diag import SymmetricBlockTriDiagonal
from .ops.scans import affine_scan
from .state_space_model import StateSpaceModel
from .utils.linalg import small_cholesky, small_inv, small_solve, symmetrize, tlt

__all__ = [
    "ssm_to_expectations",
    "expectations_to_ssm_params",
    "expectations_to_ssm",
    "ssm_to_naturals",
    "ssm_to_naturals_no_smoothing",
    "naturals_to_ssm_params",
    "naturals_to_ssm",
    "naturals_to_ssm_params_no_smoothing",
]


# --------------------------------------------------------------------------
# expectations
# --------------------------------------------------------------------------
def ssm_to_expectations(ssm: StateSpaceModel):
    """(eta_linear [..., N+1, d], eta_diag [..., N+1, d, d],
    eta_subdiag [..., N, d, d]) (reference: :32-89)."""
    means, covs = ssm.marginals
    a_s = ssm.state_transitions
    eta_linear = means
    eta_diag = covs + means[..., None] * means[..., None, :]
    eta_subdiag = a_s @ covs[..., :-1, :, :] + \
        means[..., 1:, :, None] * means[..., :-1, None, :]
    return eta_linear, eta_diag, eta_subdiag


def expectations_to_ssm_params(eta_linear, eta_diag, eta_subdiag):
    """Inverse of :func:`ssm_to_expectations` (reference: :93-178).

    Returns (A_s, b_s, chol_P0, chol_Q_s, mu0)."""
    means = eta_linear
    covs = eta_diag - means[..., None] * means[..., None, :]
    # Cov(x_k, x_{k+1}) = eta_subdiag^T - mu_k mu_{k+1}^T
    cov_right = tlt(eta_subdiag) - means[..., :-1, :, None] * \
        means[..., 1:, None, :]
    chols = small_cholesky(symmetrize(covs))
    a_s = tlt(small_solve(symmetrize(covs[..., :-1, :, :]), cov_right))
    mu0 = means[..., 0, :]
    chol_p0 = chols[..., 0, :, :]
    b_s = means[..., 1:, :] - jnp.einsum(
        "...nij,...nj->...ni", a_s, means[..., :-1, :])
    q_s = covs[..., 1:, :, :] - a_s @ covs[..., :-1, :, :] @ tlt(a_s)
    chol_q_s = small_cholesky(symmetrize(q_s))
    return a_s, b_s, chol_p0, chol_q_s, mu0


def expectations_to_ssm(eta_linear, eta_diag, eta_subdiag) -> StateSpaceModel:
    a_s, b_s, chol_p0, chol_q_s, mu0 = expectations_to_ssm_params(
        eta_linear, eta_diag, eta_subdiag)
    return StateSpaceModel(mu0, chol_p0, a_s, b_s, chol_q_s)


# --------------------------------------------------------------------------
# naturals (with smoothing)
# --------------------------------------------------------------------------
def _q_inverses(ssm: StateSpaceModel):
    """(P0^{-1} prepended) Q_k^{-1} for k = 0..N, [..., N+1, d, d]."""
    l0 = ssm.cholesky_initial_covariance[..., None, :, :]
    lq = ssm.cholesky_process_covariances
    chols = jnp.concatenate([l0, lq], axis=-3)
    return small_inv(symmetrize(chols @ tlt(chols)))


def ssm_to_naturals(ssm: StateSpaceModel):
    """(theta_linear, theta_diag, theta_subdiag) (reference: :182-253)."""
    a_s = ssm.state_transitions
    q_inv = _q_inverses(ssm)  # index 0 = P0^{-1}
    qinv_a = q_inv[..., 1:, :, :] @ a_s
    theta_subdiag = qinv_a
    at_qinv_a = jnp.einsum("...nji,...njk->...nik", a_s, qinv_a)
    zero = jnp.zeros_like(q_inv[..., :1, :, :])
    theta_diag = -0.5 * (q_inv + jnp.concatenate([at_qinv_a, zero], axis=-3))
    b_all = jnp.concatenate(
        [ssm.initial_mean[..., None, :], ssm.state_offsets], axis=-2)
    qinv_b = jnp.einsum("...nij,...nj->...ni", q_inv, b_all)
    at_qinv_b_next = jnp.einsum(
        "...nji,...nj->...ni", a_s, qinv_b[..., 1:, :])
    theta_linear = jnp.concatenate([
        qinv_b[..., :-1, :] - at_qinv_b_next,
        qinv_b[..., -1:, :],
    ], axis=-2)
    return theta_linear, theta_diag, theta_subdiag


def naturals_to_ssm_params(theta_linear, theta_diag, theta_subdiag):
    """Inverse of :func:`ssm_to_naturals` (reference: :333-511).

    Precision = -2 theta_diag on the diagonal, -theta_subdiag on the
    subdiagonal; a backward UDU factorization recovers (A, Q, P0) and two
    affine scans solve for the means."""
    precision = SymmetricBlockTriDiagonal(
        symmetrize(-2.0 * theta_diag), -theta_subdiag)
    u_off, d_chol = precision.upper_diagonal_lower()
    # A_{k+1} = -U_k^T ; Q_{k+1} = D_{k+1}^{-1} ; P0 = D_0^{-1}
    a_s = -tlt(u_off)
    d = theta_diag.shape[-1]
    eye = jnp.eye(d, dtype=theta_diag.dtype)
    cov_all = small_inv(symmetrize(d_chol @ tlt(d_chol)))
    cov_all = symmetrize(cov_all)
    chol_cov_all = small_cholesky(cov_all)
    chol_p0 = chol_cov_all[..., 0, :, :]
    chol_q_s = chol_cov_all[..., 1:, :, :]

    # means: mu = K theta_linear = U^{-T} D^{-1} U^{-1} theta_linear
    # backward affine scan: z_N = th_N, z_k = th_k + A_{k+1}^T z_{k+1}
    th_rev = jnp.flip(theta_linear, axis=-2)
    at_rev = jnp.flip(tlt(a_s), axis=-3)
    zero = jnp.zeros_like(at_rev[..., :1, :, :])
    f_rev = jnp.concatenate([zero, at_rev], axis=-3)
    z = jnp.flip(affine_scan(f_rev, th_rev), axis=-2)
    w = jnp.einsum("...nij,...nj->...ni", cov_all, z)
    # forward affine scan: mu_0 = w_0, mu_k = w_k + A_k mu_{k-1}
    zero_f = jnp.zeros_like(a_s[..., :1, :, :])
    f_fwd = jnp.concatenate([zero_f, a_s], axis=-3)
    mu = affine_scan(f_fwd, w)
    mu0 = mu[..., 0, :]
    b_s = mu[..., 1:, :] - jnp.einsum(
        "...nij,...nj->...ni", a_s, mu[..., :-1, :])
    return a_s, b_s, chol_p0, chol_q_s, mu0


def naturals_to_ssm(theta_linear, theta_diag, theta_subdiag) -> StateSpaceModel:
    a_s, b_s, chol_p0, chol_q_s, mu0 = naturals_to_ssm_params(
        theta_linear, theta_diag, theta_subdiag)
    return StateSpaceModel(mu0, chol_p0, a_s, b_s, chol_q_s)


# --------------------------------------------------------------------------
# naturals without smoothing (Lin, Khan & Schmidt 2019)
# --------------------------------------------------------------------------
def ssm_to_naturals_no_smoothing(ssm: StateSpaceModel):
    """(reference: :257-329)."""
    a_s = ssm.state_transitions
    q_inv = _q_inverses(ssm)
    theta_subdiag = q_inv[..., 1:, :, :] @ a_s
    theta_diag = -0.5 * q_inv
    b_all = jnp.concatenate(
        [ssm.initial_mean[..., None, :], ssm.state_offsets], axis=-2)
    theta_linear = jnp.einsum("...nij,...nj->...ni", q_inv, b_all)
    return theta_linear, theta_diag, theta_subdiag


def naturals_to_ssm_params_no_smoothing(theta_linear, theta_diag,
                                        theta_subdiag):
    """Inverse of :func:`ssm_to_naturals_no_smoothing` (reference: :515-593)."""
    q_all = small_inv(symmetrize(-2.0 * theta_diag))
    q_all = symmetrize(q_all)
    chol_all = small_cholesky(q_all)
    chol_p0 = chol_all[..., 0, :, :]
    chol_q_s = chol_all[..., 1:, :, :]
    a_s = q_all[..., 1:, :, :] @ theta_subdiag
    b_all = jnp.einsum("...nij,...nj->...ni", q_all, theta_linear)
    mu0 = b_all[..., 0, :]
    return a_s, b_all[..., 1:, :], chol_p0, chol_q_s, mu0
