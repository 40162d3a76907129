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
    "naturals_to_ssm_params_parallel",
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


def naturals_to_ssm_params_parallel(theta_linear, theta_diag, theta_subdiag):
    """O(log N)-depth :func:`naturals_to_ssm_params` via a synthetic-model
    reduction (no sequential UDU recursion).

    The block-tridiagonal natural precision ``J = blocktridiag(-2 theta_diag,
    -theta_subdiag)`` is *exactly* the posterior precision of a synthetic
    linear-Gaussian SSM observed through identity emissions with site
    precisions ``Lam_k = J_kk - [J_prior]_kk`` and site linear terms
    ``nu_k = theta_linear_k`` (zero prior mean makes the posterior linear
    term equal ``theta_linear``).  One parallel filter + smoother and the
    posterior's forward-Markov extraction (:func:`ops.kalman
    .posterior_ssm_params_tl`) then recover the unique forward SSM with these
    naturals — the same result as the sequential UDU path, with O(log N)
    depth on TPU instead of the reference's backward ``tf.while_loop``
    (reference: markovflow/block_tri_diag.py:438-545,
    ssm_gaussian_transformations.py:333-511).

    The synthetic prior is scale-matched to theta for conditioning: process
    precisions ``Q_k^{-1} = -theta_diag_k`` (half the precision diagonal,
    always PD for a valid theta) and transitions
    ``A_{k+1} = Q_{k+1} theta_subdiag_k`` (so the prior reproduces J's
    off-diagonal exactly).  The leftover site precisions
    ``Lam_k = -theta_diag_k - theta_subdiag_k^T Q_{k+1} theta_subdiag_k``
    are indefinite in general (the Lam-form filter elements handle that
    natively) but bounded by ~4x J's own diagonal scale, so no catastrophic
    cancellation occurs — unlike e.g. a unit-noise synthetic prior, whose
    ``Lam ~ theta_subdiag^T theta_subdiag`` squares the scale of J.
    """
    from .ops import kalman as K

    to_tl = lambda x: jnp.moveaxis(x, -3, -1)
    from_tl = lambda x: jnp.moveaxis(x, -1, -3)
    th_lin = to_tl(theta_linear[..., None])          # [..., d, 1, N+1]
    th_diag = to_tl(theta_diag)                      # [..., d, d, N+1]
    th_sub = to_tl(theta_subdiag)                    # [..., d, d, N]
    d = theta_diag.shape[-1]
    dtype = theta_diag.dtype
    eye = jnp.eye(d, dtype=dtype)[..., None]

    q_tl = K._inv_tl(-th_diag)                       # Q_k = (-theta_diag_k)^-1
    f_next = K._mm_tl(q_tl[..., 1:], th_sub)         # A_{k+1} = Q_{k+1} S_k
    zero_f = jnp.zeros_like(th_diag[..., :1])
    f_tl = jnp.concatenate([zero_f, f_next], axis=-1)
    c_tl = jnp.zeros_like(th_lin)
    h_tl = jnp.broadcast_to(eye, th_diag.shape)
    # A^T Q^{-1} A = S_k^T Q_{k+1} S_k; J_prior diag_k = -th_diag_k + that
    sqs = K._mm_tl(K._t_tl(th_sub), K._mm_tl(q_tl[..., 1:], th_sub))
    lam_tl = -th_diag - jnp.concatenate(
        [sqs, jnp.zeros_like(th_diag[..., :1])], axis=-1)

    m_f, p_f, _ = K.filter_pipeline_tl(f_tl, c_tl, q_tl, h_tl, th_lin, lam_tl)
    m_s, p_s, gains = K.smoother_pipeline_tl(f_tl, c_tl, q_tl, m_f, p_f)
    mu0_tl, p0_tl, a_tl, b_tl, qp_tl = K.posterior_ssm_params_tl(
        m_s, p_s, gains)
    a_s = from_tl(a_tl)
    b_s = from_tl(b_tl)[..., 0]
    q_s = from_tl(qp_tl)
    chol_q_s = small_cholesky(symmetrize(q_s))
    chol_p0 = small_cholesky(symmetrize(p0_tl))
    return a_s, b_s, chol_p0, chol_q_s, mu0_tl[..., 0]


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
