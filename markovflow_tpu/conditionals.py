"""Conditional (off-grid) prediction for Markovian GPs.

Rebuild of the reference's ``markovflow/conditionals.py`` (485 LoC).  For a new
time point t* between existing points t- < t* <= t+, the Markov property gives

    p(x* | x-, x+) = N(P [x-; x+] + o, T)

with projections/covariance computed from the transition statistics of the two
sub-intervals (reference: conditionals.py:122-203).  Everything is batched
d x d algebra over the new-points axis — gathers + einsums, no loops.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .config import APPROX_INF
from .gauss_markov import GaussMarkovDistribution
from .utils.linalg import small_inv, symmetrize, tlt

__all__ = [
    "pairwise_marginals",
    "conditional_statistics",
    "base_conditional_predict",
    "conditional_predict",
    "conditional_predict_tl",
    "cyclic_reduction_conditional_statistics",
]


def pairwise_marginals(dist: GaussMarkovDistribution, initial_mean,
                       initial_covariance):
    """Joint mean/cov of each consecutive state pair, extended by the prior at
    both ends (reference: conditionals.py:424-485).

    Returns (means [..., T+2, 2d], covs [..., T+2, 2d, 2d]).
    """
    means = dist.marginal_means
    covs, sub_covs = dist.covariance_blocks()  # sub = Cov(x_{k+1}, x_k)
    im = initial_mean[..., None, :]
    ic = initial_covariance[..., None, :, :]
    ext_means = jnp.concatenate([im, means, im], axis=-2)
    ext_covs = jnp.concatenate([ic, covs, ic], axis=-3)
    zero = jnp.zeros_like(ic)
    ext_sub = jnp.concatenate([zero, sub_covs, zero], axis=-3)
    joint_mean = jnp.concatenate(
        [ext_means[..., :-1, :], ext_means[..., 1:, :]], axis=-1)
    top = jnp.concatenate([ext_covs[..., :-1, :, :], tlt(ext_sub)], axis=-1)
    bottom = jnp.concatenate([ext_sub, ext_covs[..., 1:, :, :]], axis=-1)
    return joint_mean, jnp.concatenate([top, bottom], axis=-2)


def _conditional_statistics_from_transitions(a1, q1, b1, a2, q2, b2):
    """Statistics of p(x* | x-, x+) where x* = A1 x- + b1 + N(0, Q1) and
    x+ = A2 x* + b2 + N(0, Q2) (reference: conditionals.py:122-203).

    Returns (P [..., d, 2d], offset [..., d], T [..., d, d]) with
    p(x* | x-, x+) = N(P [x-; x+] + offset, T).
    """
    q1_inv = small_inv(symmetrize(q1))
    q2_inv_a2 = small_inv(symmetrize(q2)) @ a2
    t_inv = q1_inv + jnp.einsum("...ji,...jk->...ik", a2, q2_inv_a2)
    t_cov = symmetrize(small_inv(symmetrize(t_inv)))
    d_proj = t_cov @ q1_inv @ a1                      # weight on x-
    e_proj = t_cov @ tlt(q2_inv_a2)                   # weight on x+
    offset = jnp.einsum("...ij,...j->...i", t_cov @ q1_inv, b1) - jnp.einsum(
        "...ij,...j->...i", t_cov @ tlt(q2_inv_a2), b2)
    p_proj = jnp.concatenate([d_proj, e_proj], axis=-1)
    return p_proj, offset, t_cov


def conditional_statistics(new_time_points, existing_time_points, kernel):
    """(P, offset, T, indices) for each new point against its existing
    neighbours; outside points use +/-APPROX_INF phantom neighbours
    (reference: conditionals.py:207-254).

    ``indices[i]`` is the insertion index of new point i into the existing
    points (0 = before the first -> left neighbour is the phantom prior).
    """
    padded = jnp.concatenate([
        jnp.full_like(existing_time_points[..., :1], -APPROX_INF),
        existing_time_points,
        jnp.full_like(existing_time_points[..., :1], APPROX_INF),
    ], axis=-1)
    indices = jnp.searchsorted(existing_time_points, new_time_points,
                               side="left")
    t_minus = jnp.take_along_axis(
        jnp.broadcast_to(padded, indices.shape[:-1] + padded.shape[-1:]),
        indices, axis=-1)
    t_plus = jnp.take_along_axis(
        jnp.broadcast_to(padded, indices.shape[:-1] + padded.shape[-1:]),
        indices + 1, axis=-1)
    dt1 = jnp.clip(new_time_points - t_minus, 0.0, APPROX_INF)
    dt2 = jnp.clip(t_plus - new_time_points, 0.0, APPROX_INF)
    # A new point coinciding with an existing one (dt2 == 0, searchsorted
    # side='left') makes Q2 singular; handle it exactly: x* = x+.
    exact = dt2 <= 0.0
    dt2_safe = jnp.where(exact, 1.0, dt2)
    a1, q1 = kernel.transition_statistics(t_minus, dt1)
    a2, q2 = kernel.transition_statistics(new_time_points, dt2_safe)
    b1 = kernel.state_offsets(a1, dt1, transition_times=t_minus)
    b2 = kernel.state_offsets(a2, dt2_safe, transition_times=new_time_points)
    p_proj, offset, t_cov = _conditional_statistics_from_transitions(
        a1, q1, b1, a2, q2, b2)
    d = a1.shape[-1]
    eye = jnp.eye(d, dtype=a1.dtype)
    p_exact = jnp.concatenate([jnp.zeros_like(eye), eye], axis=-1)
    ex = exact[..., None, None]
    p_proj = jnp.where(ex, p_exact, p_proj)
    offset = jnp.where(exact[..., None], 0.0, offset)
    t_cov = jnp.where(ex, 0.0, t_cov)
    return p_proj, offset, t_cov, indices


def base_conditional_predict(conditional_projections, conditional_offsets,
                             conditional_covariances, adjacent_means,
                             pairwise_covariances=None):
    """Marginals p(x*) = N(P m + o, T + P S P^T)
    (reference: conditionals.py:380-420)."""
    means = jnp.einsum("...nij,...nj->...ni", conditional_projections,
                       adjacent_means) + conditional_offsets
    covs = conditional_covariances
    if pairwise_covariances is not None:
        covs = covs + (conditional_projections @ pairwise_covariances
                       @ tlt(conditional_projections))
    return means, covs


def conditional_predict(new_time_points, existing_time_points, kernel, dist):
    """Marginal means/covs of states at ``new_time_points`` given the
    distribution ``dist`` over states at ``existing_time_points``
    (reference: conditionals.py:29-85).
    """
    p_proj, offset, t_cov, indices = conditional_statistics(
        new_time_points, existing_time_points, kernel)
    mu = kernel.initial_mean(existing_time_points.shape[:-1])
    p_inf = kernel.initial_covariance(existing_time_points[..., :1])
    pair_means, pair_covs = pairwise_marginals(dist, mu, p_inf)
    adj_means = jnp.take_along_axis(
        pair_means, indices[..., None], axis=-2)
    adj_covs = jnp.take_along_axis(
        pair_covs, indices[..., None, None], axis=-3)
    return base_conditional_predict(p_proj, offset, t_cov, adj_means, adj_covs)


def conditional_predict_tl(new_time_points, existing_time_points, kernel,
                           dist):
    """Time-last core of :func:`conditional_predict`: returns
    (means_tl [..., d, 1, N*], covs_tl [..., d, d, N*]).

    The standard-layout path materializes [N*, d, 2d] f64 intermediates
    whose tiny minor dims tile-pad to (8, 128) on TPU and whose matmuls
    are batched dot_generals — measured 279.8 ms for the FORWARD
    projection alone at N*=1e5/f64 (benchmarks/decompose_svgp.py), which
    dominated the SVGP natgrad step.  This core keeps every [d, *, N*]
    intermediate in TL layout with unrolled lane ops (the same discipline
    as ops/kalman.py); the per-point transition statistics are produced
    standard and transposed immediately (the producers are elementwise
    closed forms, so the transpose fuses).
    """
    from .ops.kalman import _inv_tl, _mm_tl, _sym_tl, _t_tl, _to_tl

    padded = jnp.concatenate([
        jnp.full_like(existing_time_points[..., :1], -APPROX_INF),
        existing_time_points,
        jnp.full_like(existing_time_points[..., :1], APPROX_INF),
    ], axis=-1)
    indices = jnp.searchsorted(existing_time_points, new_time_points,
                               side="left")
    t_minus = jnp.take_along_axis(
        jnp.broadcast_to(padded, indices.shape[:-1] + padded.shape[-1:]),
        indices, axis=-1)
    t_plus = jnp.take_along_axis(
        jnp.broadcast_to(padded, indices.shape[:-1] + padded.shape[-1:]),
        indices + 1, axis=-1)
    dt1 = jnp.clip(new_time_points - t_minus, 0.0, APPROX_INF)
    dt2 = jnp.clip(t_plus - new_time_points, 0.0, APPROX_INF)
    exact = dt2 <= 0.0
    dt2_safe = jnp.where(exact, 1.0, dt2)
    a1, q1 = kernel.transition_statistics(t_minus, dt1)
    a2, q2 = kernel.transition_statistics(new_time_points, dt2_safe)
    b1 = kernel.state_offsets(a1, dt1, transition_times=t_minus)
    b2 = kernel.state_offsets(a2, dt2_safe, transition_times=new_time_points)
    a1t, q1t = _to_tl(a1), _to_tl(q1)
    a2t, q2t = _to_tl(a2), _to_tl(q2)
    b1t, b2t = _to_tl(b1[..., None]), _to_tl(b2[..., None])

    q1_inv = _inv_tl(_sym_tl(q1t))
    q2_inv_a2 = _mm_tl(_inv_tl(_sym_tl(q2t)), a2t)
    t_inv = q1_inv + _mm_tl(_t_tl(a2t), q2_inv_a2)
    t_cov = _sym_tl(_inv_tl(_sym_tl(t_inv)))
    tq1 = _mm_tl(t_cov, q1_inv)
    d_proj = _mm_tl(tq1, a1t)                 # weight on x-
    e_proj = _mm_tl(t_cov, _t_tl(q2_inv_a2))  # weight on x+
    offset = _mm_tl(tq1, b1t) - _mm_tl(e_proj, b2t)

    # exact hits (dt2 == 0): x* = x+ exactly
    d = a1t.shape[-3]
    ex_m = exact[..., None, None, :]
    eye = jnp.eye(d, dtype=a1t.dtype)[..., None]
    d_proj = jnp.where(ex_m, 0.0, d_proj)
    e_proj = jnp.where(ex_m, eye, e_proj)
    offset = jnp.where(ex_m, 0.0, offset)
    t_cov = jnp.where(ex_m, 0.0, t_cov)

    # adjacent pair moments, gathered along the (minor) time axis
    mu = kernel.initial_mean(existing_time_points.shape[:-1])
    p_inf = kernel.initial_covariance(existing_time_points[..., :1])
    pair_means, pair_covs = pairwise_marginals(dist, mu, p_inf)
    pm_tl = _to_tl(pair_means[..., None])     # [..., 2d, 1, M+1]
    pc_tl = _to_tl(pair_covs)                 # [..., 2d, 2d, M+1]
    gather = lambda x: jnp.take_along_axis(
        x, jnp.broadcast_to(indices[..., None, None, :],
                            x.shape[:-1] + indices.shape[-1:]), axis=-1)
    adj_m = gather(pm_tl)                     # [..., 2d, 1, N*]
    adj_c = gather(pc_tl)                     # [..., 2d, 2d, N*]

    p_tl = jnp.concatenate([d_proj, e_proj], axis=-2)  # [..., d, 2d, N*]
    means = _mm_tl(p_tl, adj_m) + offset
    covs = t_cov + _mm_tl(p_tl, _mm_tl(adj_c, _t_tl(p_tl)))
    return means, covs


def cyclic_reduction_odd_even_statistics(time_points, kernel):
    """Conditional statistics for one cyclic-reduction level over a single
    sorted grid: for each odd point, p(x_odd | x_left_even, x_right_even).

    Returns (P [..., M, d, 2d], offset, T) for the odd points given their even
    neighbours.  (The reference exposes the same math through the (F, G, L)
    factors of :func:`cyclic_reduction_conditional_statistics`.)
    """
    odd = time_points[..., 1::2]
    left = time_points[..., 0::2][..., : odd.shape[-1]]
    right_src = jnp.concatenate([
        time_points[..., 0::2],
        jnp.full_like(time_points[..., :1], APPROX_INF),
    ], axis=-1)
    right = right_src[..., 1 : odd.shape[-1] + 1]
    dt1 = odd - left
    dt2 = jnp.clip(right - odd, 0.0, APPROX_INF)
    a1, q1 = kernel.transition_statistics(left, dt1)
    a2, q2 = kernel.transition_statistics(odd, dt2)
    b1 = kernel.state_offsets(a1, dt1, transition_times=left)
    b2 = kernel.state_offsets(a2, dt2, transition_times=odd)
    return _conditional_statistics_from_transitions(a1, q1, b1, a2, q2, b2)


def cyclic_reduction_conditional_statistics(explained_time_points,
                                            conditioning_time_points, kernel):
    """The (F, G, L) factors of the cyclic-reduction parameterization
    (reference: conditionals.py:258-376 — defined there but unused by
    models).

    With interleaved sorted points  xᵉ₀ < xᶜ₀ < xᵉ₁ < xᶜ₁ < ...  (explained
    e, conditioning c; len(e) == len(c) or len(c) + 1):

        p(xᵉₜ | xᶜₜ₋₁, xᶜₜ) = N(Dₜ xᶜₜ₋₁ + Eₜ xᶜₜ, (Lₜ Lₜᵀ)⁻¹)

    where ``Lₜ`` is the Cholesky factor of the conditional *precision* and
    the returned factors are ``Fₜ = -Eₜᵀ Lₜ`` (the right-neighbour weights)
    and ``Gₜ = -Dₜ₊₁ᵀ Lₜ₊₁`` (the left-neighbour weights), so that
    ``E[xᵉ | xᶜ] = -L⁻ᵀ Uᵀ xᶜ`` with U the bidiagonal matrix of F/G blocks
    (reference docstring, conditionals.py:275-304).

    Returns (F [..., n_c, d, d], G [..., n_e - 1, d, d], L [..., n_e, d, d])
    — the shapes the reference docstring specifies (conditionals.py:308-313):
    F drops the entry for xᵉ's last point when it has no right conditioning
    neighbour (phantom at +APPROX_INF), G drops xᵉ₀'s undefined left weight
    (phantom at -APPROX_INF).  (The reference's own slicing ``F[..., 1:]`` /
    ``G[..., :n_c]`` operates on the matrix-column axis — a latent bug in
    code no model calls; this implementation follows the documented shapes.)
    """
    n_e = explained_time_points.shape[-1]
    n_c = conditioning_time_points.shape[-1]
    assert n_e in (n_c, n_c + 1), (n_e, n_c)
    inf = jnp.full_like(conditioning_time_points[..., :1], APPROX_INF)
    aug = jnp.concatenate([-inf, conditioning_time_points, inf], axis=-1)
    left = aug[..., :n_e]
    right = aug[..., 1 : n_e + 1]
    dt1 = jnp.clip(explained_time_points - left, 0.0, APPROX_INF)
    dt2 = jnp.clip(right - explained_time_points, 0.0, APPROX_INF)
    a1, q1 = kernel.transition_statistics(left, dt1)
    a2, q2 = kernel.transition_statistics(explained_time_points, dt2)
    # conditional precision T^{-1} = Q1^{-1} + A2^T Q2^{-1} A2 and mean
    # projections D (on the left point), E (on the right point)
    q1_inv = small_inv(symmetrize(q1))
    q2_inv_a2 = small_inv(symmetrize(q2)) @ a2
    t_inv = symmetrize(q1_inv
                       + jnp.einsum("...ji,...jk->...ik", a2, q2_inv_a2))
    t_cov = symmetrize(small_inv(t_inv))
    d_proj = t_cov @ q1_inv @ a1
    e_proj = t_cov @ tlt(q2_inv_a2)
    chol_l = jnp.linalg.cholesky(t_inv)
    f_fac = -jnp.einsum("...ji,...jk->...ik", e_proj, chol_l)
    g_fac = -jnp.einsum("...ji,...jk->...ik", d_proj, chol_l)
    return (f_fac[..., :n_c, :, :], g_fac[..., 1:, :, :], chol_l)
