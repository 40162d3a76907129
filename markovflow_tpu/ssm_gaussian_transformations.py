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
from .ops.kalman import (
    _chol_tl,
    _from_tl,
    _inv_tl,
    _mm_tl,
    _sym_tl,
    _t_tl,
    _to_tl,
)
from .ops.scans import affine_cov_scan_tl, affine_scan
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
# Time-last (TL) cores.
#
# Every transform here is elementwise d x d algebra over the N+1 states.  In
# the public [..., N, d, d] layout each tiny block tile-pads to an (8, 128)
# TPU tile and batched dot_generals relayout to time-middle (measured 223x;
# see ops/kalman.py) — and the f64 VGP natgrad graph in that layout did not
# finish XLA-compiling in 500 s at T = 1e5.  The cores below therefore work
# in time-last layout [..., d, d, N] with unrolled lane ops; the public
# wrappers convert at the boundary (transposes fuse under jit).  The
# natural-gradient optimizer (ssm_natgrad.py) calls the TL cores directly so
# no standard-layout intermediate is ever materialized inside its step.
# --------------------------------------------------------------------------
def _ssm_fields_tl(ssm: StateSpaceModel):
    """(a [..., d, d, N], b [..., d, 1, N], l0 [..., d, d, 1],
    lq [..., d, d, N], mu0 [..., d, 1, 1]) in TL layout."""
    a_tl = _to_tl(ssm.state_transitions)
    b_tl = _to_tl(ssm.state_offsets[..., None])
    lq_tl = _to_tl(ssm.cholesky_process_covariances)
    l0_tl = ssm.cholesky_initial_covariance[..., None]
    mu0_tl = ssm.initial_mean[..., None, None]
    return a_tl, b_tl, l0_tl, lq_tl, mu0_tl


def ssm_to_expectations_tl(ssm: StateSpaceModel):
    """TL-layout core of :func:`ssm_to_expectations`: returns
    (eta_linear [..., d, 1, N+1], eta_diag [..., d, d, N+1],
    eta_subdiag [..., d, d, N]).

    Marginals come from ``ssm.marginals_tl()`` — the same expression every
    other training-graph consumer uses, so XLA CSE can collapse the scans
    when a natgrad step computes both the loss and the expectations of the
    same SSM."""
    a_tl = _to_tl(ssm.state_transitions)
    means, covs = ssm.marginals_tl()
    eta_linear = means
    eta_diag = covs + _mm_tl(means, _t_tl(means))
    eta_subdiag = _mm_tl(a_tl, covs[..., :-1]) + _mm_tl(
        means[..., 1:], _t_tl(means[..., :-1]))
    return eta_linear, eta_diag, eta_subdiag


def expectations_to_ssm_params_tl(eta_linear, eta_diag, eta_subdiag):
    """TL-layout core of :func:`expectations_to_ssm_params`: TL inputs (see
    :func:`ssm_to_expectations_tl`), TL outputs
    (a [..., d, d, N], b [..., d, 1, N], chol_p0 [..., d, d, 1],
    chol_q [..., d, d, N], mu0 [..., d, 1, 1])."""
    means = eta_linear
    covs = eta_diag - _mm_tl(means, _t_tl(means))
    # Cov(x_k, x_{k+1}) = eta_subdiag^T - mu_k mu_{k+1}^T
    cov_right = _t_tl(eta_subdiag) - _mm_tl(
        means[..., :-1], _t_tl(means[..., 1:]))
    chols = _chol_tl(_sym_tl(covs))
    a_s = _t_tl(_mm_tl(_inv_tl(_sym_tl(covs[..., :-1])), cov_right))
    mu0 = means[..., :1]
    chol_p0 = chols[..., :1]
    b_s = means[..., 1:] - _mm_tl(a_s, means[..., :-1])
    q_s = covs[..., 1:] - _mm_tl(a_s, _mm_tl(covs[..., :-1], _t_tl(a_s)))
    chol_q_s = _chol_tl(_sym_tl(q_s))
    return a_s, b_s, chol_p0, chol_q_s, mu0


def ssm_to_naturals_tl(ssm: StateSpaceModel):
    """TL-layout core of :func:`ssm_to_naturals`: returns
    (theta_linear [..., d, 1, N+1], theta_diag [..., d, d, N+1],
    theta_subdiag [..., d, d, N])."""
    a_tl, b_tl, l0_tl, lq_tl, mu0_tl = _ssm_fields_tl(ssm)
    chols = jnp.concatenate([l0_tl, lq_tl], axis=-1)
    q_inv = _inv_tl(_sym_tl(_mm_tl(chols, _t_tl(chols))))  # index 0 = P0^-1
    qinv_a = _mm_tl(q_inv[..., 1:], a_tl)
    theta_subdiag = qinv_a
    at_qinv_a = _mm_tl(_t_tl(a_tl), qinv_a)
    zero = jnp.zeros_like(q_inv[..., :1])
    theta_diag = -0.5 * (q_inv + jnp.concatenate([at_qinv_a, zero], axis=-1))
    b_all = jnp.concatenate([mu0_tl, b_tl], axis=-1)
    qinv_b = _mm_tl(q_inv, b_all)
    at_qinv_b_next = _mm_tl(_t_tl(a_tl), qinv_b[..., 1:])
    theta_linear = jnp.concatenate([
        qinv_b[..., :-1] - at_qinv_b_next,
        qinv_b[..., -1:],
    ], axis=-1)
    return theta_linear, theta_diag, theta_subdiag


# --------------------------------------------------------------------------
# expectations
# --------------------------------------------------------------------------
def ssm_to_expectations(ssm: StateSpaceModel):
    """(eta_linear [..., N+1, d], eta_diag [..., N+1, d, d],
    eta_subdiag [..., N, d, d]) (reference: :32-89)."""
    eta_linear, eta_diag, eta_subdiag = ssm_to_expectations_tl(ssm)
    return (_from_tl(eta_linear)[..., 0], _from_tl(eta_diag),
            _from_tl(eta_subdiag))


def expectations_to_ssm_params(eta_linear, eta_diag, eta_subdiag):
    """Inverse of :func:`ssm_to_expectations` (reference: :93-178).

    Returns (A_s, b_s, chol_P0, chol_Q_s, mu0)."""
    a_s, b_s, chol_p0, chol_q_s, mu0 = expectations_to_ssm_params_tl(
        _to_tl(eta_linear[..., None]), _to_tl(eta_diag), _to_tl(eta_subdiag))
    return (_from_tl(a_s), _from_tl(b_s)[..., 0], chol_p0[..., 0],
            _from_tl(chol_q_s), mu0[..., 0, 0])


def expectations_to_ssm(eta_linear, eta_diag, eta_subdiag) -> StateSpaceModel:
    a_s, b_s, chol_p0, chol_q_s, mu0 = expectations_to_ssm_params(
        eta_linear, eta_diag, eta_subdiag)
    return StateSpaceModel(mu0, chol_p0, a_s, b_s, chol_q_s)


# --------------------------------------------------------------------------
# naturals (with smoothing)
# --------------------------------------------------------------------------
def ssm_to_naturals(ssm: StateSpaceModel):
    """(theta_linear, theta_diag, theta_subdiag) (reference: :182-253)."""
    theta_linear, theta_diag, theta_subdiag = ssm_to_naturals_tl(ssm)
    return (_from_tl(theta_linear)[..., 0], _from_tl(theta_diag),
            _from_tl(theta_subdiag))


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
    a_tl, b_tl, chol_p0, chol_q_tl, mu0_tl = naturals_to_ssm_params_parallel_tl(
        _to_tl(theta_linear[..., None]), _to_tl(theta_diag),
        _to_tl(theta_subdiag))
    return (_from_tl(a_tl), _from_tl(b_tl)[..., 0], chol_p0[..., 0],
            _from_tl(chol_q_tl), mu0_tl[..., 0, 0])


def naturals_to_ssm_params_parallel_tl(th_lin, th_diag, th_sub):
    """TL-layout core of :func:`naturals_to_ssm_params_parallel`.

    Inputs: th_lin [..., d, 1, N+1], th_diag [..., d, d, N+1],
    th_sub [..., d, d, N].  Outputs: (a [..., d, d, N], b [..., d, 1, N],
    chol_p0 [..., d, d, 1], chol_q [..., d, d, N], mu0 [..., d, 1, 1])."""
    from .ops import kalman as K

    d = th_diag.shape[-3]
    dtype = th_diag.dtype
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
    chol_q_tl = _chol_tl(_sym_tl(qp_tl))
    # posterior_ssm_params_tl returns mu0/P0 without a time axis; restore it
    chol_p0 = _chol_tl(_sym_tl(p0_tl[..., None]))
    return a_tl, b_tl, chol_p0, chol_q_tl, mu0_tl[..., None]


# --------------------------------------------------------------------------
# naturals without smoothing (Lin, Khan & Schmidt 2019)
# --------------------------------------------------------------------------
def ssm_to_naturals_no_smoothing(ssm: StateSpaceModel):
    """(reference: :257-329)."""
    a_tl, b_tl, l0_tl, lq_tl, mu0_tl = _ssm_fields_tl(ssm)
    chols = jnp.concatenate([l0_tl, lq_tl], axis=-1)
    q_inv = _inv_tl(_sym_tl(_mm_tl(chols, _t_tl(chols))))
    theta_subdiag = _mm_tl(q_inv[..., 1:], a_tl)
    theta_diag = -0.5 * q_inv
    b_all = jnp.concatenate([mu0_tl, b_tl], axis=-1)
    theta_linear = _mm_tl(q_inv, b_all)
    return (_from_tl(theta_linear)[..., 0], _from_tl(theta_diag),
            _from_tl(theta_subdiag))


def naturals_to_ssm_params_no_smoothing(theta_linear, theta_diag,
                                        theta_subdiag):
    """Inverse of :func:`ssm_to_naturals_no_smoothing` (reference: :515-593)."""
    th_lin = _to_tl(theta_linear[..., None])
    th_diag = _to_tl(theta_diag)
    th_sub = _to_tl(theta_subdiag)
    q_all = _sym_tl(_inv_tl(_sym_tl(-2.0 * th_diag)))
    chol_all = _chol_tl(q_all)
    chol_p0 = chol_all[..., 0]
    chol_q_s = _from_tl(chol_all[..., 1:])
    a_s = _from_tl(_mm_tl(q_all[..., 1:], th_sub))
    b_all = _mm_tl(q_all, th_lin)
    mu0 = b_all[..., 0, 0]
    return a_s, _from_tl(b_all[..., 1:])[..., 0], chol_p0, chol_q_s, mu0
