"""Parallel-in-time Kalman filtering and smoothing.

This is the TPU-native inference engine that replaces the reference's
precision-space banded algebra (sequential C++ ``cholesky_band`` /
``solve_triang_mat`` ops and the ``tf.while_loop`` UDU smoother — reference:
markovflow/kalman_filter.py:86-255, markovflow/block_tri_diag.py:438-545).

Formulation: temporal parallelization of Bayesian smoothers
(Sarkka & Garcia-Fernandez, 2019).  Each time step contributes an associative
*element*; ``jax.lax.associative_scan`` combines them with O(log T) depth.
Observations enter in *site* (natural-parameter) form ``exp(nu^T f - 0.5 f^T
Lam f)`` with ``f = H x``, which uniformly covers:

* dense Gaussian observations (``KalmanFilter``): Lam = R^{-1}, nu = R^{-1} y;
* time-varying Gaussian sites (``KalmanFilterWithSites``, CVI/PEP);
* sparse sites on a time grid (``KalmanFilterWithSparseSites``): Lam = 0 at
  unobserved points — the update formulas below are Lam-form and handle
  singular Lam exactly (no R = Lam^{-1} anywhere in the filter).

Conventions: N = T+1 states.  The "prior step" arrays (F, c, Q) have element 0
encoding the initial distribution (F_0 = 0, c_0 = mu0, Q_0 = P0) and element
k >= 1 the transition x_k = F_k x_{k-1} + c_k + N(0, Q_k).  All arrays carry
arbitrary leading batch shapes; the time axis is third-from-last.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..utils.linalg import small_det, small_inv, small_solve, symmetrize, tlt
from .scans import scan_tl, unrolled_lane_ops as _unrolled_lane_ops

__all__ = [
    "FilterElements",
    "make_filter_elements",
    "parallel_filter",
    "sequential_filter",
    "predicted_moments",
    "parallel_smoother",
    "sequential_smoother",
    "posterior_ssm_params",
    "log_likelihood_sites",
    "prior_step_arrays",
]


class FilterElements(NamedTuple):
    """Associative filtering elements (Sarkka & Garcia-Fernandez eq. 10)."""

    A: jnp.ndarray  # [..., N, d, d]
    b: jnp.ndarray  # [..., N, d, 1]
    C: jnp.ndarray  # [..., N, d, d]
    J: jnp.ndarray  # [..., N, d, d]
    eta: jnp.ndarray  # [..., N, d, 1]


# --------------------------------------------------------------------------
# Time-last (TL) layout core.
#
# TPU tiling pads the LAST TWO axes of every materialized array to the
# (sublane, lane) = (8, 128) grid.  An associative scan over [..., N, d, d]
# leaves therefore materializes each tiny d x d block as an 8 x 128 tile —
# ~100x memory waste and ~1000x slowdown measured at d = 2.  The scans here
# run in time-last layout [..., d, d, N]: the long time axis sits on the
# lanes and every combine is a fused elementwise expression over N.
# Boundary transposes fuse into the surrounding computation under jit.
# --------------------------------------------------------------------------
def _to_tl(x):
    return jnp.moveaxis(x, -3, -1)


def _from_tl(x):
    return jnp.moveaxis(x, -1, -3)




def _mm_tl(a, b):
    """[..., d1, d2, N] @ [..., d2, d3, N] -> [..., d1, d3, N].

    Unrolled to elementwise lane ops for small d on TPU (see
    :func:`_unrolled_lane_ops`); einsum elsewhere.
    """
    d1, d2 = a.shape[-3], a.shape[-2]
    d3 = b.shape[-2]
    if max(d1, d2, d3) > 6 or not _unrolled_lane_ops():
        return jnp.einsum("...ijn,...jkn->...ikn", a, b)
    rows = []
    for i in range(d1):
        cols = []
        for k in range(d3):
            acc = a[..., i, 0, :] * b[..., 0, k, :]
            for j in range(1, d2):
                acc = acc + a[..., i, j, :] * b[..., j, k, :]
            cols.append(acc)
        rows.append(jnp.stack(cols, axis=-2))
    return jnp.stack(rows, axis=-3)


def _t_tl(a):
    return jnp.swapaxes(a, -3, -2)


def _sym_tl(a):
    return 0.5 * (a + _t_tl(a))


def _inv_tl(m):
    """Adjugate inverse of [..., d, d, N] over leading matrix dims, d <= 3."""
    d = m.shape[-3]
    if d == 1:
        return 1.0 / m
    if not _unrolled_lane_ops():
        # CPU/GPU: batched LU keeps traces small (LU is unimplemented on
        # TPU for f64, and the relayout is catastrophic there — TPU uses
        # the unrolled adjugate/Schur forms below)
        return _to_tl(jnp.linalg.inv(_from_tl(m)))
    if d == 2:
        det = m[..., 0, 0, :] * m[..., 1, 1, :] - m[..., 0, 1, :] * m[..., 1, 0, :]
        row0 = jnp.stack([m[..., 1, 1, :], -m[..., 0, 1, :]], axis=-2)
        row1 = jnp.stack([-m[..., 1, 0, :], m[..., 0, 0, :]], axis=-2)
        return jnp.stack([row0, row1], axis=-3) / det[..., None, None, :]
    if d == 3:
        c = lambda i1, j1, i2, j2: (m[..., i1, j1, :] * m[..., i2, j2, :]
                                    - m[..., i1, j2, :] * m[..., i2, j1, :])
        det = (m[..., 0, 0, :] * c(1, 1, 2, 2)
               - m[..., 0, 1, :] * c(1, 0, 2, 2)
               + m[..., 0, 2, :] * c(1, 0, 2, 1))
        adj = jnp.stack([
            jnp.stack([c(1, 1, 2, 2), -c(0, 1, 2, 2), c(0, 1, 1, 2)], -2),
            jnp.stack([-c(1, 0, 2, 2), c(0, 0, 2, 2), -c(0, 0, 1, 2)], -2),
            jnp.stack([c(1, 0, 2, 1), -c(0, 0, 2, 1), c(0, 0, 1, 1)], -2),
        ], -3)
        return adj / det[..., None, None, :]
    if d <= 6:
        # Schur-complement block reduction onto the d <= 3 closed forms —
        # stays in TL layout (the LU fallback below relayouts every tiny
        # block to time-middle) and works in f64 on TPU (no LuDecomposition).
        k = d // 2
        a_i = _inv_tl(m[..., :k, :k, :])
        b = m[..., :k, k:, :]
        c_ = m[..., k:, :k, :]
        dd = m[..., k:, k:, :]
        aib = _mm_tl(a_i, b)
        s_i = _inv_tl(dd - _mm_tl(c_, aib))
        cai = _mm_tl(c_, a_i)
        tl_blk = a_i + _mm_tl(aib, _mm_tl(s_i, cai))
        tr = -_mm_tl(aib, s_i)
        bl = -_mm_tl(s_i, cai)
        top = jnp.concatenate([tl_blk, tr], axis=-2)
        bot = jnp.concatenate([bl, s_i], axis=-2)
        return jnp.concatenate([top, bot], axis=-3)
    # fallback through the batched-LU path
    return _to_tl(jnp.linalg.inv(_from_tl(m)))


def _tri_inv_tl(l):
    """Inverse of lower-triangular [..., d, d, N] over the matrix dims.

    Closed forms for d <= 3, recursive 2x2 block reduction above (the
    inverse of [[A, 0], [C, D]] is [[A^-1, 0], [-D^-1 C A^-1, D^-1]]) —
    stays in TL layout with elementwise lane ops only.
    """
    d = l.shape[-3]
    if d == 1:
        return 1.0 / l
    if not _unrolled_lane_ops():
        eye = jnp.eye(d, dtype=l.dtype)
        sol = jax.scipy.linalg.solve_triangular(
            _from_tl(l), eye, lower=True)
        return _to_tl(sol)
    if d == 2:
        ia = 1.0 / l[..., 0, 0, :]
        idd = 1.0 / l[..., 1, 1, :]
        z = jnp.zeros_like(ia)
        return jnp.stack([
            jnp.stack([ia, z], -2),
            jnp.stack([-l[..., 1, 0, :] * ia * idd, idd], -2),
        ], -3)
    if d == 3:
        a = l[..., 0, 0, :]
        b = l[..., 1, 0, :]
        c = l[..., 1, 1, :]
        e = l[..., 2, 0, :]
        f = l[..., 2, 1, :]
        g = l[..., 2, 2, :]
        ia, ic, ig = 1.0 / a, 1.0 / c, 1.0 / g
        z = jnp.zeros_like(ia)
        return jnp.stack([
            jnp.stack([ia, z, z], -2),
            jnp.stack([-b * ia * ic, ic, z], -2),
            jnp.stack([(b * f - c * e) * ia * ic * ig, -f * ic * ig, ig], -2),
        ], -3)
    k = 3 if d <= 6 else (d + 1) // 2
    a_i = _tri_inv_tl(l[..., :k, :k, :])
    d_i = _tri_inv_tl(l[..., k:, k:, :])
    bl = -_mm_tl(d_i, _mm_tl(l[..., k:, :k, :], a_i))
    z = jnp.zeros(l.shape[:-3] + (k, d - k) + l.shape[-1:], l.dtype)
    top = jnp.concatenate([a_i, z], axis=-2)
    bot = jnp.concatenate([bl, d_i], axis=-2)
    return jnp.concatenate([top, bot], axis=-3)


def _chol_tl(m):
    """Cholesky of symmetric PD [..., d, d, N] over the matrix dims.

    Unrolled closed forms for d <= 3; recursive block form (Schur
    complement on the trailing block) above.  Pure elementwise lane ops —
    the batched LAPACK path relayouts every tiny block to a time-middle
    (8, 128) tile on TPU and is unimplemented there for f64.
    """
    d = m.shape[-3]
    if not _unrolled_lane_ops():
        return _to_tl(jnp.linalg.cholesky(_from_tl(m)))
    if d == 1:
        return jnp.sqrt(m)
    if d == 2:
        a = jnp.sqrt(m[..., 0, 0, :])
        b = m[..., 1, 0, :] / a
        c = jnp.sqrt(m[..., 1, 1, :] - b * b)
        z = jnp.zeros_like(a)
        return jnp.stack([
            jnp.stack([a, z], -2),
            jnp.stack([b, c], -2),
        ], -3)
    if d == 3:
        l11 = jnp.sqrt(m[..., 0, 0, :])
        l21 = m[..., 1, 0, :] / l11
        l31 = m[..., 2, 0, :] / l11
        l22 = jnp.sqrt(m[..., 1, 1, :] - l21 * l21)
        l32 = (m[..., 2, 1, :] - l31 * l21) / l22
        l33 = jnp.sqrt(m[..., 2, 2, :] - l31 * l31 - l32 * l32)
        z = jnp.zeros_like(l11)
        return jnp.stack([
            jnp.stack([l11, z, z], -2),
            jnp.stack([l21, l22, z], -2),
            jnp.stack([l31, l32, l33], -2),
        ], -3)
    k = 3 if d <= 6 else (d + 1) // 2
    l11 = _chol_tl(m[..., :k, :k, :])
    l21 = _mm_tl(m[..., k:, :k, :], _t_tl(_tri_inv_tl(l11)))
    s = m[..., k:, k:, :] - _mm_tl(l21, _t_tl(l21))
    l22 = _chol_tl(_sym_tl(s))
    z = jnp.zeros(m.shape[:-3] + (k, d - k) + m.shape[-1:], m.dtype)
    top = jnp.concatenate([l11, z], axis=-2)
    bot = jnp.concatenate([l21, l22], axis=-2)
    return jnp.concatenate([top, bot], axis=-3)


def _combine_filter_tl(x, y):
    """TL-layout version of the Lemma-8 combination (x earlier, y later)."""
    xa, xb, xc, xj, xe = x
    ya, yb, yc, yj, ye = y
    d = xa.shape[-3]
    eye = jnp.eye(d, dtype=xa.dtype)[..., None]
    m_inv = _inv_tl(eye + _mm_tl(xc, yj))
    m_inv_t = _t_tl(m_inv)
    a = _mm_tl(ya, _mm_tl(m_inv, xa))
    b = _mm_tl(ya, _mm_tl(m_inv, xb + _mm_tl(xc, ye))) + yb
    c = _mm_tl(ya, _mm_tl(_mm_tl(m_inv, xc), _t_tl(ya))) + yc
    eta = _mm_tl(_t_tl(xa), _mm_tl(m_inv_t, ye - _mm_tl(yj, xb))) + xe
    j = _mm_tl(_t_tl(xa), _mm_tl(m_inv_t, _mm_tl(yj, xa))) + xj
    return a, b, _sym_tl(c), _sym_tl(j), eta


def _combine_smoother_tl(later, earlier):
    le, lg, ll = later
    ee, eg, el = earlier
    e = _mm_tl(ee, le)
    g = _mm_tl(ee, lg) + eg
    ell = _mm_tl(ee, _mm_tl(ll, _t_tl(ee))) + el
    return e, g, _sym_tl(ell)


def _smoother_identity_like(e):
    """Identity of the smoothing composition: (I, 0, 0)."""
    ee, g, ell = e
    d = ee.shape[-3]
    eye = jnp.broadcast_to(jnp.eye(d, dtype=ee.dtype)[..., None],
                           ee.shape[:-1] + (1,))
    zl = lambda x: jnp.zeros(x.shape[:-1] + (1,), x.dtype)
    return (eye, zl(g), zl(ell))


def _det_tl(m):
    """Determinant over the leading matrix dims of [..., d, d, N], d <= 3."""
    d = m.shape[-3]
    if d == 1:
        return m[..., 0, 0, :]
    if not _unrolled_lane_ops():
        return jnp.linalg.det(_from_tl(m))
    if d == 2:
        return (m[..., 0, 0, :] * m[..., 1, 1, :]
                - m[..., 0, 1, :] * m[..., 1, 0, :])
    if d == 3:
        c = lambda i1, j1, i2, j2: (m[..., i1, j1, :] * m[..., i2, j2, :]
                                    - m[..., i1, j2, :] * m[..., i2, j1, :])
        return (m[..., 0, 0, :] * c(1, 1, 2, 2)
                - m[..., 0, 1, :] * c(1, 0, 2, 2)
                + m[..., 0, 2, :] * c(1, 0, 2, 1))
    if d <= 6:
        # det = det(A) det(D - C A^-1 B), same blocking as _inv_tl
        k = d // 2
        a = m[..., :k, :k, :]
        s = m[..., k:, k:, :] - _mm_tl(
            m[..., k:, :k, :], _mm_tl(_inv_tl(a), m[..., :k, k:, :]))
        return _det_tl(a) * _det_tl(s)
    return jnp.moveaxis(jnp.linalg.det(_from_tl(m)), -1, -1)


def _eye_tl(d, dtype):
    return jnp.eye(d, dtype=dtype)[..., None]


def make_filter_elements_tl(F, c, Q, H, nu, lam) -> Tuple:
    """TL-layout element construction (see :func:`make_filter_elements`).

    F [..., d, d, N]; c [..., d, 1, N]; Q [..., d, d, N];
    H [..., o, d, N]; nu [..., o, 1, N]; lam [..., o, o, N].
    The whole pipeline stays in time-last layout so every intermediate keeps
    the long axis on the TPU lanes (time-middle [N, d, d] intermediates
    tile-pad to (8, 128) per step and were measured ~1000x slower).
    """
    o = lam.shape[-3]
    d = F.shape[-3]
    eye_o = _eye_tl(o, F.dtype)
    qht = _mm_tl(Q, _t_tl(H))                       # [d, o, N]
    hqht = _mm_tl(H, qht)                           # [o, o, N]
    z = _inv_tl(eye_o + _mm_tl(hqht, lam))
    lam_z = _sym_tl(_mm_tl(lam, z))                 # S^{-1}
    gain = _mm_tl(qht, lam_z)                       # [d, o, N]
    i_gh = _eye_tl(d, F.dtype) - _mm_tl(gain, H)
    a_e = _mm_tl(i_gh, F)
    b_e = _mm_tl(i_gh, c) + _mm_tl(qht, _mm_tl(_t_tl(z), nu))
    c_e = _sym_tl(_mm_tl(i_gh, Q))
    hc = _mm_tl(H, c)                               # [o, 1, N]
    resid = _mm_tl(_t_tl(z), nu) - _mm_tl(lam_z, hc)
    eta = _mm_tl(_t_tl(F), _mm_tl(_t_tl(H), resid))
    hf = _mm_tl(H, F)                               # [o, d, N]
    j_e = _sym_tl(_mm_tl(_t_tl(hf), _mm_tl(lam_z, hf)))
    return (a_e, b_e, c_e, j_e, eta)


def filter_pipeline_tl(F, c, Q, H, nu, lam, mask=None, engine: str = "xla"):
    """Full TL pipeline: elements -> parallel filter -> predicted moments ->
    site log-likelihood.  All inputs in TL layout (see
    :func:`make_filter_elements_tl`); ``mask`` is [..., N] or None.

    Returns (m_f [..., d, 1, N], P_f [..., d, d, N], loglik [...]).
    """
    # Materialize the inputs once: fusing their producer chains (kernel
    # discretization) into the scan/likelihood consumers hangs XLA's
    # forward-only TPU compile for >15 min (see ops.scans.scan_tl).
    F, c, Q, H, nu, lam = jax.lax.optimization_barrier(
        (F, c, Q, H, nu, lam))
    if engine == "pallas":
        # fused kernel: element construction + scan + likelihood in one
        # pallas call — no element/predicted-moment arrays in HBM.
        from .pallas_scan import pallas_filter_pipeline

        maskf = None if mask is None else jnp.broadcast_to(
            mask, F.shape[:-3] + (F.shape[-1],)
        ).astype(F.dtype)[..., None, None, :]
        return pallas_filter_pipeline(F, c, Q, H, nu, lam, maskf)
    elems = make_filter_elements_tl(F, c, Q, H, nu, lam)
    res = scan_tl(_combine_filter_tl, _filter_identity_like, elems)
    m_f, p_f = res[1], res[2]
    # predicted moments: index 0 is the prior (c_0, Q_0)
    fm = _mm_tl(F[..., 1:], m_f[..., :-1]) + c[..., 1:]
    fp = _mm_tl(F[..., 1:], _mm_tl(p_f[..., :-1], _t_tl(F[..., 1:]))) + \
        Q[..., 1:]
    m_pred = jnp.concatenate([c[..., :1], fm], axis=-1)
    p_pred = _sym_tl(jnp.concatenate([Q[..., :1], fp], axis=-1))
    # site log-likelihood in lam form
    o = lam.shape[-3]
    hm = _mm_tl(H, m_pred)                          # [o, 1, N]
    hpht = _mm_tl(H, _mm_tl(p_pred, _t_tl(H)))      # [o, o, N]
    w = nu - _mm_tl(lam, hm)
    m_mat = lam + _mm_tl(lam, _mm_tl(hpht, lam))
    eye_o = _eye_tl(o, F.dtype)
    if mask is not None:
        keep = mask[..., None, None, :]
        m_mat = jnp.where(keep, m_mat, eye_o)
        lam_safe = jnp.where(keep, lam, eye_o)
    else:
        lam_safe = lam
    sol = _mm_tl(_inv_tl(m_mat), w)
    quad = jnp.sum(w * sol, axis=(-3, -2))
    log_det_s = jnp.log(jnp.abs(_det_tl(eye_o + _mm_tl(hpht, lam_safe)))) - \
        jnp.log(jnp.abs(_det_tl(lam_safe)))
    ll = -0.5 * (quad + log_det_s
                 + o * jnp.log(jnp.asarray(2.0 * jnp.pi, F.dtype)))
    if mask is not None:
        ll = jnp.where(mask, ll, 0.0)
    return m_f, p_f, jnp.sum(ll, axis=-1)


def smoother_pipeline_tl(F, c, Q, m_f, p_f, engine: str = "xla"):
    """TL smoother: returns (m_s [..., d, 1, N], P_s [..., d, d, N],
    gains [..., d, d, N-1]).

    ``engine="pallas"`` uses the hand-written TPU kernel (no autodiff
    through the kernel itself; batched, d <= 6, f32, TPU backend — see
    ``pallas_scan.pick_scan_engine``) — for serving paths.  Training
    reaches the same kernel through the analytic custom VJPs.
    """
    fn, cn, qn = F[..., 1:], c[..., 1:], Q[..., 1:]
    mk, pk = m_f[..., :-1], p_f[..., :-1]
    p_pred = _sym_tl(_mm_tl(fn, _mm_tl(pk, _t_tl(fn))) + qn)
    pft = _mm_tl(pk, _t_tl(fn))
    gains = _t_tl(_mm_tl(_inv_tl(p_pred), _t_tl(pft)))
    g = mk - _mm_tl(gains, _mm_tl(fn, mk) + cn)
    ell = _sym_tl(pk - _mm_tl(gains, _mm_tl(fn, pk)))
    d = F.shape[-3]
    zero = jnp.zeros_like(p_f[..., -1:])
    e_all = jnp.concatenate([gains, zero], axis=-1)
    g_all = jnp.concatenate([g, m_f[..., -1:]], axis=-1)
    l_all = jnp.concatenate([ell, p_f[..., -1:]], axis=-1)
    if engine == "pallas":
        from .pallas_scan import pallas_smoother_scan

        m_s, p_s = pallas_smoother_scan((e_all, g_all, l_all))
        return m_s, p_s, gains
    res = scan_tl(_combine_smoother_tl, _smoother_identity_like,
                  (e_all, g_all, l_all), reverse=True)
    return res[1], res[2], gains


def prior_step_arrays(ssm) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(F, c, Q) arrays of length N = T+1 from a StateSpaceModel."""
    return ssm._prefix_elements()


def make_filter_elements(F, c, Q, H, nu, lam) -> FilterElements:
    """Build per-step elements from prior steps + sites, fully vectorized.

    F [..., N, d, d], c [..., N, d], Q [..., N, d, d];
    H [..., N, o, d] (or broadcastable), nu [..., N, o], lam [..., N, o, o].

    Lam-form update (exact for singular lam):
        Z   = (I + H Q H^T lam)^{-1}
        S^{-1} = lam Z            (symmetric)
        G   = Q H^T lam Z          (Kalman gain)
        A_e = (I - G H) F,  b_e = (I - G H) c + Q H^T Z^T nu
        C_e = (I - G H) Q
        eta = F^T H^T (Z^T nu - lam Z H c)
        J   = F^T H^T lam Z H F
    """
    o = lam.shape[-1]
    eye_o = jnp.eye(o, dtype=F.dtype)
    qht = jnp.einsum("...nij,...noj->...nio", Q, H)  # Q H^T [N, d, o]
    hqht = jnp.einsum("...noi,...nip->...nop", H, qht)  # [N, o, o]
    z = small_inv(eye_o + hqht @ lam)
    lam_z = symmetrize(lam @ z)  # S^{-1}
    gain = qht @ lam_z  # Q H^T lam Z  [N, d, o]
    gh = gain @ H  # [N, d, d]
    i_gh = jnp.eye(F.shape[-1], dtype=F.dtype) - gh
    a_e = i_gh @ F
    b_e = (
        jnp.einsum("...nij,...nj->...ni", i_gh, c)
        + jnp.einsum("...nio,...npo,...np->...ni", qht, z, nu)
    )
    c_e = symmetrize(i_gh @ Q)
    hc = jnp.einsum("...noi,...ni->...no", H, c)
    resid = jnp.einsum("...npo,...np->...no", z, nu) - jnp.einsum(
        "...nop,...np->...no", lam_z, hc
    )
    eta = jnp.einsum("...nji,...noj,...no->...ni", F, H, resid)
    hf = H @ F  # [N, o, d]
    j_e = symmetrize(jnp.einsum("...noi,...nop,...npj->...nij", hf, lam_z, hf))
    return FilterElements(a_e, b_e[..., None], c_e, j_e, eta[..., None])


def _combine_filter(x: FilterElements, y: FilterElements) -> FilterElements:
    """x (earlier) combined with y (later) — Lemma 8 of the parallel-smoother
    paper; one small-matrix solve per pair."""
    d = x.A.shape[-1]
    eye = jnp.eye(d, dtype=x.A.dtype)
    m = eye + x.C @ y.J
    rhs = jnp.concatenate([x.A, x.b + x.C @ y.eta, x.C], axis=-1)
    sol = small_solve(m, rhs)
    s_a, s_b, s_c = sol[..., :d], sol[..., d : d + 1], sol[..., d + 1 :]
    a = y.A @ s_a
    b = y.A @ s_b + y.b
    c = y.A @ s_c @ tlt(y.A) + y.C
    rhs2 = jnp.concatenate([y.eta - y.J @ x.b, y.J @ x.A], axis=-1)
    sol2 = small_solve(tlt(m), rhs2)
    eta = tlt(x.A) @ sol2[..., :1] + x.eta
    j = tlt(x.A) @ sol2[..., 1:] + x.J
    return FilterElements(a, b, symmetrize(c), symmetrize(j), eta)


def _filter_identity_like(e):
    """Identity element of the filtering composition: (I, 0, 0, 0, 0)."""
    a, b, c, j, eta = e
    d = a.shape[-3]
    eye = jnp.broadcast_to(jnp.eye(d, dtype=a.dtype)[..., None],
                           a.shape[:-1] + (1,))
    zl = lambda x: jnp.zeros(x.shape[:-1] + (1,), x.dtype)
    return (eye, zl(b), zl(c), zl(j), zl(eta))


def parallel_filter(elems: FilterElements):
    """Filtered means/covs [..., N, d] / [..., N, d, d] via associative scan.

    Runs in time-last layout internally (see above); the boundary transposes
    fuse with neighbouring ops under jit.
    """
    tl = tuple(_to_tl(a) for a in elems)
    res = scan_tl(_combine_filter_tl, _filter_identity_like, tl)
    m_f = jnp.moveaxis(res[1][..., 0, :], -1, -2)  # [..., d, N] -> [..., N, d]
    p_f = _from_tl(res[2])
    return m_f, p_f


def sequential_filter(elems: FilterElements):
    """Same result as :func:`parallel_filter` via lax.scan (O(T) depth).

    Used for testing and as a low-memory fallback.
    """
    axis = elems.A.ndim - 3
    elems_t = jax.tree_util.tree_map(lambda a: jnp.moveaxis(a, axis, 0), elems)
    first = jax.tree_util.tree_map(lambda a: a[0], elems_t)
    rest = jax.tree_util.tree_map(lambda a: a[1:], elems_t)

    def step(carry, e):
        new = _combine_filter(carry, e)
        return new, (new.b[..., 0], new.C)

    _, (ms, ps) = jax.lax.scan(step, first, rest)
    ms = jnp.concatenate([first.b[None, ..., 0], ms], axis=0)
    ps = jnp.concatenate([first.C[None], ps], axis=0)
    return jnp.moveaxis(ms, 0, axis), jnp.moveaxis(ps, 0, axis)


def predicted_moments(F, c, Q, m_f, P_f):
    """One-step-ahead predictive moments m_k|k-1, P_k|k-1 for every k.

    Index 0 is the prior (c_0 = mu0, Q_0 = P0).
    """
    m_pred = jnp.einsum(
        "...nij,...nj->...ni", F[..., 1:, :, :], m_f[..., :-1, :]
    ) + c[..., 1:, :]
    p_pred = (
        F[..., 1:, :, :] @ P_f[..., :-1, :, :] @ tlt(F[..., 1:, :, :])
        + Q[..., 1:, :, :]
    )
    m_pred = jnp.concatenate([c[..., :1, :], m_pred], axis=-2)
    p_pred = jnp.concatenate([Q[..., :1, :, :], p_pred], axis=-3)
    return m_pred, symmetrize(p_pred)


def log_likelihood_sites(H, nu, lam, m_pred, p_pred, mask=None):
    """Sum_k log N(y_k; H m_k|k-1, H P_k|k-1 H^T + lam^{-1}) with y = lam^{-1} nu.

    Lam-form evaluation (one obs-dim solve per step):
        w = nu - lam H m,   quad = w^T (lam + lam H P H^T lam)^{-1} w
        logdet S = log|I + H P H^T lam| - log|lam|
    ``mask`` [..., N] excludes steps (sparse sites).  This matches the
    reference's site-model marginal likelihood
    (reference: markovflow/kalman_filter.py:184-255).
    """
    o = lam.shape[-1]
    hm = jnp.einsum("...noi,...ni->...no", H, m_pred)
    hpht = jnp.einsum(
        "...noi,...nij,...npj->...nop", H, p_pred, H
    )
    w = nu - jnp.einsum("...nop,...np->...no", lam, hm)
    m_mat = lam + lam @ hpht @ lam
    # Guard unobserved (lam = 0) steps: substitute identity, mask later.
    if mask is not None:
        eye_o = jnp.eye(o, dtype=lam.dtype)
        m_mat = jnp.where(mask[..., None, None], m_mat, eye_o)
        lam_safe = jnp.where(mask[..., None, None], lam, eye_o)
    else:
        lam_safe = lam
    quad = jnp.einsum(
        "...no,...no->...n", w, small_solve(m_mat, w[..., None])[..., 0]
    )
    eye_o = jnp.eye(o, dtype=lam.dtype)
    log_det_s = jnp.log(jnp.abs(small_det(eye_o + hpht @ lam_safe))) - \
        jnp.log(jnp.abs(small_det(lam_safe)))
    ll = -0.5 * (quad + log_det_s + o * jnp.log(
        jnp.asarray(2.0 * jnp.pi, m_pred.dtype)))
    if mask is not None:
        ll = jnp.where(mask, ll, 0.0)
    return jnp.sum(ll, axis=-1)


class SmootherElements(NamedTuple):
    E: jnp.ndarray  # [..., N, d, d]
    g: jnp.ndarray  # [..., N, d, 1]
    L: jnp.ndarray  # [..., N, d, d]


def _make_smoother_elements(F, c, Q, m_f, P_f) -> SmootherElements:
    """Elements for the parallel RTS smoother (Lemma 9).

    For k < N-1:  E_k = P_k F_{k+1}^T (F_{k+1} P_k F_{k+1}^T + Q_{k+1})^{-1}
                  g_k = m_k - E_k (F_{k+1} m_k + c_{k+1})
                  L_k = P_k - E_k F_{k+1} P_k
    Last element: (0, m_{N-1}, P_{N-1}).
    """
    fn = F[..., 1:, :, :]
    cn = c[..., 1:, :]
    qn = Q[..., 1:, :, :]
    mk = m_f[..., :-1, :]
    pk = P_f[..., :-1, :, :]
    p_pred = symmetrize(fn @ pk @ tlt(fn) + qn)
    pfT = pk @ tlt(fn)
    # E = pfT @ p_pred^{-1}  ->  E^T = p_pred^{-1} pfT^T (p_pred symmetric)
    gains = tlt(small_solve(p_pred, tlt(pfT)))
    g = mk - jnp.einsum(
        "...nij,...nj->...ni", gains,
        jnp.einsum("...nij,...nj->...ni", fn, mk) + cn,
    )
    ell = symmetrize(pk - gains @ fn @ pk)
    d = F.shape[-1]
    zero = jnp.zeros_like(P_f[..., -1:, :, :])
    e_all = jnp.concatenate([gains, zero], axis=-3)
    g_all = jnp.concatenate([g, m_f[..., -1:, :]], axis=-2)
    l_all = jnp.concatenate([ell, P_f[..., -1:, :, :]], axis=-3)
    return SmootherElements(e_all, g_all[..., None], l_all), gains


def _combine_smoother(later: SmootherElements, earlier: SmootherElements):
    """Reverse-scan combination: result = earlier (x) later."""
    e = earlier.E @ later.E
    g = earlier.E @ later.g + earlier.g
    ell = earlier.E @ later.L @ tlt(earlier.E) + earlier.L
    return SmootherElements(e, g, symmetrize(ell))


def parallel_smoother(F, c, Q, m_f, P_f):
    """Smoothed means/covs + RTS gains via reverse associative scan.

    Returns (m_s [..., N, d], P_s [..., N, d, d], gains [..., N-1, d, d]).
    Runs in time-last layout internally.
    """
    elems, gains = _make_smoother_elements(F, c, Q, m_f, P_f)
    tl = tuple(_to_tl(a) for a in elems)
    res = scan_tl(_combine_smoother_tl, _smoother_identity_like, tl,
                  reverse=True)
    m_s = jnp.moveaxis(res[1][..., 0, :], -1, -2)
    return m_s, _from_tl(res[2]), gains


def sequential_smoother(F, c, Q, m_f, P_f):
    """Classic backward RTS recursion via lax.scan (test oracle / fallback)."""
    elems, gains = _make_smoother_elements(F, c, Q, m_f, P_f)
    axis = elems.E.ndim - 3
    elems_t = jax.tree_util.tree_map(lambda a: jnp.moveaxis(a, axis, 0), elems)
    last = jax.tree_util.tree_map(lambda a: a[-1], elems_t)
    rest = jax.tree_util.tree_map(lambda a: a[:-1], elems_t)

    def step(carry, e):
        new = _combine_smoother(carry, e)
        return new, (new.g[..., 0], new.L)

    _, (ms, ps) = jax.lax.scan(step, last, rest, reverse=True)
    ms = jnp.concatenate([ms, last.g[None, ..., 0]], axis=0)
    ps = jnp.concatenate([ps, last.L[None]], axis=0)
    return jnp.moveaxis(ms, 0, axis), jnp.moveaxis(ps, 0, axis), gains


def posterior_ssm_params_tl(m_s, p_s, gains):
    """TL-layout :func:`posterior_ssm_params`.

    m_s [..., d, 1, N]; p_s [..., d, d, N]; gains [..., d, d, N-1].
    Returns (mu0 [..., d, 1], P0 [..., d, d], A [..., d, d, N-1],
    b [..., d, 1, N-1], Q [..., d, d, N-1]) — all but the first two still in
    TL layout over the transition axis.
    """
    cross = _mm_tl(gains, p_s[..., 1:])              # Cov(x_k, x_{k+1})
    a_post = _t_tl(_mm_tl(_inv_tl(p_s[..., :-1]), cross))
    b_post = m_s[..., 1:] - _mm_tl(a_post, m_s[..., :-1])
    q_post = _sym_tl(p_s[..., 1:] - _mm_tl(a_post, cross))
    return (m_s[..., 0], p_s[..., 0], a_post, b_post, q_post)


def posterior_ssm_params(m_s, P_s, gains):
    """Forward-SSM parameters of the smoothing posterior.

    The posterior over states is itself Markov; with pairwise covariance
    Cov(x_k, x_{k+1} | Y) = G_k P^s_{k+1} the forward representation is
        A_k = (P^s_k^{-1} G_k P^s_{k+1})^T,  b_k = m^s_{k+1} - A_k m^s_k,
        Q_k = P^s_{k+1} - A_k G_k P^s_{k+1}.
    Replaces the reference's UDU while_loop + banded solves
    (reference: markovflow/kalman_filter.py:109-182).
    Returns (mu0, P0, A_s, b_s, Q_s, subsequent_covs).
    """
    cross = gains @ P_s[..., 1:, :, :]  # Cov(x_k, x_{k+1})
    a_post = tlt(small_solve(P_s[..., :-1, :, :], cross))
    b_post = m_s[..., 1:, :] - jnp.einsum(
        "...nij,...nj->...ni", a_post, m_s[..., :-1, :]
    )
    q_post = symmetrize(P_s[..., 1:, :, :] - a_post @ cross)
    return m_s[..., 0, :], P_s[..., 0, :, :], a_post, b_post, q_post, tlt(cross)
