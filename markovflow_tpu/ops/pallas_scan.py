"""Pallas TPU kernels: fused parallel Kalman filter / smoother scans.

The TPU-native analogue of the reference's C++ ``banded_matrices`` hot ops
(reference: markovflow/block_tri_diag.py:22-31): the block-tridiagonal
Cholesky/solve pipeline collapses, in scan form, to a prefix composition of
filtering elements.  XLA's associative_scan executes O(log C) HBM round
trips per chunk; these kernels keep each chunk resident in VMEM and thread
the cross-chunk carry through VMEM scratch across sequential grid steps —
one HBM read and one write per element.

In-chunk algorithm (v2, work-efficient "block-sequential" scan).  The chunk
of C time steps is viewed as (R, L) = (block, lane): each of the L lanes owns
a *contiguous* run of R time steps (R = 8 matches the f32 sublane count, so
the (R, L) tail of every leaf tiles the (8, 128) VPU grid exactly):

1. an R-step sequential pass (vectorized across all L lanes) produces the
   within-block prefixes — left-to-right bracketing, exactly the sequential
   recursion's roundoff behaviour;
2. a Hillis-Steele pass over the L block *totals* (log2 L levels);
3. one final combine folds the lane-exclusive prefix + cross-chunk carry
   into each of the R within-block prefixes.

Total combine work is 2 + (log2 L)/R per element vs log2 C for the v1
Hillis-Steele kernel (~3.3 vs 11 at C = 8192) and the bracketing is mostly
sequential, so float32 roundoff at T ~ 1e6 matches the XLA chunked
Blelloch scan (measured; v1's pure Hillis-Steele drifted above it).

The kernels define no JAX derivatives themselves; training reaches them
through the analytic custom VJPs (:mod:`markovflow_tpu.ops.adjoint` — the
default grad engine — and :mod:`markovflow_tpu.ops.fisher`), whose forward
runs :func:`pallas_filter_pipeline` (elements + scan + likelihood fused in
one kernel) and whose backward runs the reverse suffix scan kernel.
Autodiff-through-the-scan paths use the XLA scans in
:mod:`markovflow_tpu.ops.scans` instead.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pallas_filter_scan", "pallas_filter_pipeline",
           "pallas_smoother_scan", "pick_scan_engine",
           "PALLAS_CHUNK", "PALLAS_BLOCK"]


def pick_scan_engine(F, engine: str, lam=None) -> str:
    """Resolve an engine request against kernel eligibility.

    The Pallas kernels support arbitrary leading batch dims (a batch grid
    axis), d <= 6 (closed-form inverses up to 3, Schur-complement blocking
    above), float32, the TPU backend only; any ineligible request silently
    resolves to the XLA scans so library code can default to
    ``engine="pallas"`` safely (e.g. the CPU/x64 test suite, GPU backends).

    ``lam`` (site precisions, [..., o, o, N]) is checked when given: the
    in-kernel innovation inverse also requires o <= 6 / float32.
    """
    if engine != "pallas":
        return "xla"
    if F.ndim < 3 or F.shape[-3] > 6 or F.dtype != jnp.float32:
        return "xla"
    if lam is not None and (lam.ndim < 3 or lam.shape[-3] > 6
                            or lam.dtype != jnp.float32):
        return "xla"
    if jax.default_backend() != "tpu":
        return "xla"
    return "pallas"

#: time steps per grid step (must be divisible by PALLAS_BLOCK)
PALLAS_CHUNK = 4096
#: contiguous time steps owned by one lane (the sublane axis).  32 makes
#: lanes = PALLAS_CHUNK / 32 = 128 — exactly one hardware lane tile, which
#: measured 7-9x faster than r_blk = 8 / lanes = 512 at T = 1e6 (0.7-0.9 ms
#: vs 6.2 ms for the forward filter scan; accuracy unchanged, and the
#: longer sequential in-block runs only improve the roundoff bracketing).
PALLAS_BLOCK = 32


def _mm(a, b):
    """[d1, d2, L] @ [d2, d3, L] with the matmul unrolled to elementwise
    lane ops (Mosaic requires batch dims at position 0, so no dot_general)."""
    d1, d2 = a.shape[0], a.shape[1]
    d3 = b.shape[1]
    rows = []
    for i in range(d1):
        cols = []
        for k in range(d3):
            acc = a[i, 0] * b[0, k]
            for j in range(1, d2):
                acc = acc + a[i, j] * b[j, k]
            cols.append(acc)
        rows.append(jnp.stack(cols))
    return jnp.stack(rows)


def _t(a):
    return jnp.swapaxes(a, 0, 1)


def _inv(m):
    d = m.shape[0]
    if d == 1:
        return 1.0 / m
    if d == 2:
        det = m[0, 0] * m[1, 1] - m[0, 1] * m[1, 0]
        row0 = jnp.stack([m[1, 1], -m[0, 1]])
        row1 = jnp.stack([-m[1, 0], m[0, 0]])
        return jnp.stack([row0, row1]) / det[None, None]
    if d == 3:
        c = lambda i1, j1, i2, j2: m[i1, j1] * m[i2, j2] - m[i1, j2] * m[i2, j1]
        det = (m[0, 0] * c(1, 1, 2, 2) - m[0, 1] * c(1, 0, 2, 2)
               + m[0, 2] * c(1, 0, 2, 1))
        adj = jnp.stack([
            jnp.stack([c(1, 1, 2, 2), -c(0, 1, 2, 2), c(0, 1, 1, 2)]),
            jnp.stack([-c(1, 0, 2, 2), c(0, 0, 2, 2), -c(0, 0, 1, 2)]),
            jnp.stack([c(1, 0, 2, 1), -c(0, 0, 2, 1), c(0, 0, 1, 1)]),
        ])
        return adj / det[None, None]
    if d <= 6:
        # Schur-complement block reduction onto the d <= 3 closed forms:
        # inv([[A, B], [C, D]]) with S = D - C A^-1 B.
        k = d // 2
        a_i = _inv(m[:k, :k])
        b, c_, dd = m[:k, k:], m[k:, :k], m[k:, k:]
        aib = _mm(a_i, b)
        s_i = _inv(dd - _mm(c_, aib))
        cai = _mm(c_, a_i)
        tl_blk = a_i + _mm(aib, _mm(s_i, cai))
        tr = -_mm(aib, s_i)
        bl = -_mm(s_i, cai)
        top = jnp.concatenate([tl_blk, tr], axis=1)
        bot = jnp.concatenate([bl, s_i], axis=1)
        return jnp.concatenate([top, bot], axis=0)
    raise NotImplementedError("pallas filter scan supports d <= 6")


def _det(m):
    """Determinant over leading dims of [d, d, L], d <= 6 (mirrors _inv)."""
    d = m.shape[0]
    if d == 1:
        return m[0, 0]
    if d == 2:
        return m[0, 0] * m[1, 1] - m[0, 1] * m[1, 0]
    if d == 3:
        c = lambda i1, j1, i2, j2: m[i1, j1] * m[i2, j2] - m[i1, j2] * m[i2, j1]
        return (m[0, 0] * c(1, 1, 2, 2) - m[0, 1] * c(1, 0, 2, 2)
                + m[0, 2] * c(1, 0, 2, 1))
    k = d // 2
    s = m[k:, k:] - _mm(m[k:, :k], _mm(_inv(m[:k, :k]), m[:k, k:]))
    return _det(m[:k, :k]) * _det(s)


def _sym(a):
    return 0.5 * (a + _t(a))


def _make_elem_slice(f, cv, q, h, nu, lam):
    """Filter element from one (r)-slice of the raw inputs — the in-kernel
    version of kalman.make_filter_elements_tl (shapes [dim1, dim2, L])."""
    d = f.shape[0]
    o = lam.shape[0]
    eye_o = jnp.eye(o, dtype=f.dtype)[..., None]
    eye_d = jnp.eye(d, dtype=f.dtype)[..., None]
    qht = _mm(q, _t(h))
    hqht = _mm(h, qht)
    z = _inv(eye_o + _mm(hqht, lam))
    lam_z = _sym(_mm(lam, z))
    gain = _mm(qht, lam_z)
    i_gh = eye_d - _mm(gain, h)
    a_e = _mm(i_gh, f)
    b_e = _mm(i_gh, cv) + _mm(qht, _mm(_t(z), nu))
    c_e = _sym(_mm(i_gh, q))
    hc = _mm(h, cv)
    resid = _mm(_t(z), nu) - _mm(lam_z, hc)
    eta = _mm(_t(f), _mm(_t(h), resid))
    hf = _mm(h, f)
    j_e = _sym(_mm(_t(hf), _mm(lam_z, hf)))
    return (a_e, b_e, c_e, j_e, eta)


def _ll_slice(f, cv, q, h, nu, lam, maskf, pm, pp):
    """Per-element site log-likelihood given the previous filtered moments
    (pm, pp) — the in-kernel version of the lam-form likelihood in
    kalman.filter_pipeline_tl.  Returns [L]."""
    o = lam.shape[0]
    eye_o = jnp.eye(o, dtype=f.dtype)[..., None]
    m_pred = _mm(f, pm) + cv
    p_pred = _sym(_mm(f, _mm(pp, _t(f))) + q)
    hm = _mm(h, m_pred)
    hpht = _mm(h, _mm(p_pred, _t(h)))
    w = nu - _mm(lam, hm)
    keep = maskf > 0.5                               # [1, 1, L]
    m_mat = jnp.where(keep, lam + _mm(lam, _mm(hpht, lam)), eye_o)
    lam_safe = jnp.where(keep, lam, eye_o)
    sol = _mm(_inv(m_mat), w)
    quad = jnp.sum(w * sol, axis=(0, 1))             # [L]
    log_det_s = jnp.log(jnp.abs(_det(eye_o + _mm(hpht, lam_safe)))) - \
        jnp.log(jnp.abs(_det(lam_safe)))
    ll = -0.5 * (quad + log_det_s
                 + o * jnp.log(jnp.asarray(2.0 * jnp.pi, f.dtype)))
    return jnp.where(keep[0, 0], ll, 0.0)


def _combine(x, y):
    """x (earlier) (x) y (later) — filtering composition, [d, *, L] leaves."""
    xa, xb, xc, xj, xe = x
    ya, yb, yc, yj, ye = y
    d = xa.shape[0]
    eye = jnp.eye(d, dtype=xa.dtype)[..., None]
    m_inv = _inv(eye + _mm(xc, yj))
    m_inv_t = _t(m_inv)
    a = _mm(ya, _mm(m_inv, xa))
    b = _mm(ya, _mm(m_inv, xb + _mm(xc, ye))) + yb
    c = _mm(ya, _mm(_mm(m_inv, xc), _t(ya))) + yc
    eta = _mm(_t(xa), _mm(m_inv_t, ye - _mm(yj, xb))) + xe
    j = _mm(_t(xa), _mm(m_inv_t, _mm(yj, xa))) + xj
    return a, b, c, j, eta


def _identity_elem(d, db, lanes, dtype):
    eye = jnp.broadcast_to(jnp.eye(d, dtype=dtype)[..., None], (d, d, lanes))
    zb = jnp.zeros((d, db, lanes), dtype)
    zm = jnp.zeros((d, d, lanes), dtype)
    return (eye, zb, zm, zm, zb)


def _combine_smoother(later, earlier):
    """Smoothing composition (reverse scan): result = earlier (x) later."""
    le, lg, ll = later
    ee, eg, el = earlier
    e = _mm(ee, le)
    g = _mm(ee, lg) + eg
    ell = _mm(ee, _mm(ll, _t(ee))) + el
    return e, g, ell


def _smoother_identity(d, db, lanes, dtype):
    eye = jnp.broadcast_to(jnp.eye(d, dtype=dtype)[..., None], (d, d, lanes))
    return (eye, jnp.zeros((d, db, lanes), dtype),
            jnp.zeros((d, d, lanes), dtype))


# --------------------------------------------------------------------------
# Layout: (d, *, N) <-> (d, *, R, NB) with lane b owning times [bR, (b+1)R).
# The transpose has to happen on the XLA side: a (d, *, NB, R) array is
# tile-padded 16x in HBM (T(8,128) pads the minor dim R = 8 to 128), and
# Mosaic cannot shape-cast (d, *, C) -> (d, *, L, R) in-kernel.  Under jit
# the transposes fuse into the element-producer / consumer chains.
# --------------------------------------------------------------------------
def _to_blocked(x, r_blk):
    bdim, d0, d1, n = x.shape
    return jnp.swapaxes(x.reshape(bdim, d0, d1, n // r_blk, r_blk), -1, -2)


def _from_blocked(x):
    bdim, d0, d1, r_blk, nb = x.shape
    return jnp.swapaxes(x, -1, -2).reshape(bdim, d0, d1, nb * r_blk)


def _filter_kernel(a_ref, b_ref, c_ref, j_ref, e_ref, mb_ref, pc_ref,
                   carry_a, carry_b, carry_c, carry_j, carry_e,
                   *, r_blk, lanes):
    d = a_ref.shape[1]
    db = b_ref.shape[2]
    dtype = a_ref.dtype
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        ident = _identity_elem(d, db, 1, dtype)
        carry_a[...] = ident[0]
        carry_b[...] = ident[1]
        carry_c[...] = ident[2]
        carry_j[...] = ident[3]
        carry_e[...] = ident[4]

    def elem(r):
        return (a_ref[0, :, :, r, :], b_ref[0, :, :, r, :],
                c_ref[0, :, :, r, :], j_ref[0, :, :, r, :],
                e_ref[0, :, :, r, :])

    # 1. within-block sequential prefixes (vectorized over the L lanes)
    pref = [elem(0)]
    for r in range(1, r_blk):
        pref.append(_combine(pref[-1], elem(r)))

    # 2. Hillis-Steele inclusive scan over the L block totals
    ident = _identity_elem(d, db, lanes, dtype)
    lane = jax.lax.broadcasted_iota(jnp.int32, (d, d, lanes), dimension=2)
    lane_b = jax.lax.broadcasted_iota(jnp.int32, (d, db, lanes), dimension=2)
    masks = (lane, lane_b, lane, lane, lane_b)
    tot = pref[-1]
    k = 1
    while k < lanes:
        shifted = tuple(pltpu.roll(t, k, 2) for t in tot)
        shifted = tuple(jnp.where(m < k, idl, s)
                        for m, idl, s in zip(masks, ident, shifted))
        tot = _combine(shifted, tot)
        k *= 2
    # exclusive lane prefix, then fold in the cross-chunk carry
    excl = tuple(pltpu.roll(t, 1, 2) for t in tot)
    excl = tuple(jnp.where(m < 1, idl, s)
                 for m, idl, s in zip(masks, ident, excl))
    carry = (carry_a[...], carry_b[...], carry_c[...], carry_j[...],
             carry_e[...])
    carry_bcast = tuple(jnp.broadcast_to(cc, x.shape)
                        for cc, x in zip(carry, excl))
    exc = _combine(carry_bcast, excl)

    # 3. fold the exclusive prefix into each within-block prefix
    for r in range(r_blk):
        out_r = _combine(exc, pref[r])
        mb_ref[0, :, :, r, :] = out_r[1]
        pc_ref[0, :, :, r, :] = out_r[2]

    # 4. new carry: the full prefix at the last element of the chunk
    exc_last = tuple(x[..., -1:] for x in exc)
    pref_last = tuple(x[..., -1:] for x in pref[-1])
    new_carry = _combine(exc_last, pref_last)
    carry_a[...] = new_carry[0]
    carry_b[...] = new_carry[1]
    carry_c[...] = new_carry[2]
    carry_j[...] = new_carry[3]
    carry_e[...] = new_carry[4]


def _pipeline_kernel(f_ref, c_ref, q_ref, h_ref, nu_ref, lam_ref, mk_ref,
                     mb_ref, pc_ref, ll_ref,
                     carry_a, carry_b, carry_c, carry_j, carry_e,
                     *, r_blk, lanes):
    """Fused forward pipeline: element construction + prefix scan + site
    log-likelihood, one HBM read of the raw inputs and one write of the
    filtered moments.  The cross-chunk carry doubles as the "previous
    filtered state" at the chunk boundary (its b/C legs ARE the filtered
    mean/cov of the last earlier element; zeros for the first chunk are
    exact because the global element 0 has F_0 = 0)."""
    d = f_ref.shape[1]
    db = c_ref.shape[2]
    dtype = f_ref.dtype
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        ident = _identity_elem(d, db, 1, dtype)
        carry_a[...] = ident[0]
        carry_b[...] = ident[1]
        carry_c[...] = ident[2]
        carry_j[...] = ident[3]
        carry_e[...] = ident[4]
        ll_ref[0, 0] = jnp.zeros((), dtype)

    def raw(r):
        return (f_ref[0, :, :, r, :], c_ref[0, :, :, r, :],
                q_ref[0, :, :, r, :], h_ref[0, :, :, r, :],
                nu_ref[0, :, :, r, :], lam_ref[0, :, :, r, :],
                mk_ref[0, :, :, r, :])

    elems = [_make_elem_slice(*raw(r)[:-1]) for r in range(r_blk)]

    # 1. within-block sequential prefixes
    pref = [elems[0]]
    for r in range(1, r_blk):
        pref.append(_combine(pref[-1], elems[r]))

    # 2. Hillis-Steele over the block totals
    ident = _identity_elem(d, db, lanes, dtype)
    lane = jax.lax.broadcasted_iota(jnp.int32, (d, d, lanes), dimension=2)
    lane_b = jax.lax.broadcasted_iota(jnp.int32, (d, db, lanes), dimension=2)
    masks = (lane, lane_b, lane, lane, lane_b)
    tot = pref[-1]
    k = 1
    while k < lanes:
        shifted = tuple(pltpu.roll(t, k, 2) for t in tot)
        shifted = tuple(jnp.where(m < k, idl, s)
                        for m, idl, s in zip(masks, ident, shifted))
        tot = _combine(shifted, tot)
        k *= 2
    excl = tuple(pltpu.roll(t, 1, 2) for t in tot)
    excl = tuple(jnp.where(m < 1, idl, s)
                 for m, idl, s in zip(masks, ident, excl))
    carry = (carry_a[...], carry_b[...], carry_c[...], carry_j[...],
             carry_e[...])
    carry_bcast = tuple(jnp.broadcast_to(cc, x.shape)
                        for cc, x in zip(carry, excl))
    exc = _combine(carry_bcast, excl)

    # 3. filtered moments per r + likelihood with the previous filtered state
    outs = [_combine(exc, pref[r]) for r in range(r_blk)]
    # previous filtered state for r = 0: last row of the previous lane,
    # lane 0 taken from the cross-chunk carry (b/C of the carry element)
    last_m = pltpu.roll(outs[r_blk - 1][1], 1, 2)
    last_p = pltpu.roll(outs[r_blk - 1][2], 1, 2)
    lane0 = lane_b[:1] < 1                           # [1, db, lanes]
    prev_m0 = jnp.where(lane0, jnp.broadcast_to(carry[1], last_m.shape),
                        last_m)
    prev_p0 = jnp.where(lane[:1] < 1,
                        jnp.broadcast_to(carry[2], last_p.shape), last_p)
    ll_acc = jnp.zeros((lanes,), dtype)
    for r in range(r_blk):
        pm = prev_m0 if r == 0 else outs[r - 1][1]
        pp = prev_p0 if r == 0 else outs[r - 1][2]
        f, cv, q, h, nu, lam, mk = raw(r)
        ll_acc = ll_acc + _ll_slice(f, cv, q, h, nu, lam, mk, pm, pp)
        mb_ref[0, :, :, r, :] = outs[r][1]
        pc_ref[0, :, :, r, :] = outs[r][2]
    ll_ref[0, 0] += jnp.sum(ll_acc)

    # 4. new carry
    exc_last = tuple(x[..., -1:] for x in exc)
    pref_last = tuple(x[..., -1:] for x in pref[-1])
    new_carry = _combine(exc_last, pref_last)
    carry_a[...] = new_carry[0]
    carry_b[...] = new_carry[1]
    carry_c[...] = new_carry[2]
    carry_j[...] = new_carry[3]
    carry_e[...] = new_carry[4]


def _smoother_kernel(e_ref, g_ref, l_ref, mg_ref, pl_ref,
                     carry_e, carry_g, carry_l, *, r_blk, lanes):
    d = e_ref.shape[1]
    db = g_ref.shape[2]
    dtype = e_ref.dtype
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        ident = _smoother_identity(d, db, 1, dtype)
        carry_e[...] = ident[0]
        carry_g[...] = ident[1]
        carry_l[...] = ident[2]

    def elem(r):
        return (e_ref[0, :, :, r, :], g_ref[0, :, :, r, :],
                l_ref[0, :, :, r, :])

    # 1. within-block sequential suffixes (r_blk-1 ... 0)
    suf = [elem(r_blk - 1)]
    for r in range(r_blk - 2, -1, -1):
        suf.append(_combine_smoother(suf[-1], elem(r)))
    suf = suf[::-1]  # suf[r] = e_r (x) ... (x) e_{R-1}

    # 2. Hillis-Steele suffix scan over the L block totals (roll left by k
    # == circular roll right by lanes - k; pltpu.roll needs shifts >= 0)
    ident = _smoother_identity(d, db, lanes, dtype)
    lane = jax.lax.broadcasted_iota(jnp.int32, (d, d, lanes), dimension=2)
    lane_b = jax.lax.broadcasted_iota(jnp.int32, (d, db, lanes), dimension=2)
    masks = (lane, lane_b, lane)
    tot = suf[0]
    k = 1
    while k < lanes:
        shifted = tuple(pltpu.roll(t, lanes - k, 2) for t in tot)
        shifted = tuple(jnp.where(m >= lanes - k, idl, s)
                        for m, idl, s in zip(masks, ident, shifted))
        tot = _combine_smoother(shifted, tot)
        k *= 2
    # exclusive lane suffix, then fold in the cross-chunk (later) carry
    excl = tuple(pltpu.roll(t, lanes - 1, 2) for t in tot)
    excl = tuple(jnp.where(m >= lanes - 1, idl, s)
                 for m, idl, s in zip(masks, ident, excl))
    carry = (carry_e[...], carry_g[...], carry_l[...])
    carry_bcast = tuple(jnp.broadcast_to(cc, x.shape)
                        for cc, x in zip(carry, excl))
    exc = _combine_smoother(carry_bcast, excl)

    # 3. fold the exclusive suffix into each within-block suffix
    for r in range(r_blk):
        out_r = _combine_smoother(exc, suf[r])
        mg_ref[0, :, :, r, :] = out_r[1]
        pl_ref[0, :, :, r, :] = out_r[2]

    # 4. new carry: the full suffix at the first element of the chunk
    exc_first = tuple(x[..., :1] for x in exc)
    suf_first = tuple(x[..., :1] for x in suf[0])
    new_carry = _combine_smoother(exc_first, suf_first)
    carry_e[...] = new_carry[0]
    carry_g[...] = new_carry[1]
    carry_l[...] = new_carry[2]


def _adjoint_elem_slice(f, cv, q, h, nu, lam, f_next, pm, pp_prev):
    """Stage 1 of the Koopman adjoint for one (r)-slice (in-kernel version
    of ops.adjoint.adjoint_scan_elements).  Returns
    (a, pp, l_mat, g_elem, v_elem)."""
    d = f.shape[0]
    o = lam.shape[0]
    eye_o = jnp.eye(o, dtype=f.dtype)[..., None]
    eye_d = jnp.eye(d, dtype=f.dtype)[..., None]
    a = _mm(f, pm) + cv
    pp = _sym(_mm(f, _mm(pp_prev, _t(f))) + q)
    hpht = _mm(h, _mm(pp, _t(h)))
    zt = _inv(eye_o + _mm(lam, hpht))
    w = _sym(_mm(zt, lam))
    e = _mm(zt, nu - _mm(lam, _mm(h, a)))
    kh = _mm(pp, _mm(_t(h), _mm(w, h)))
    l_mat = _mm(f_next, eye_d - kh)
    g_elem = _mm(_t(h), e)
    v_elem = _sym(_mm(_t(h), _mm(w, h)))
    return a, pp, l_mat, g_elem, v_elem


def _adjoint_grads_slice(f, h, nu, lam, mk, pm, pp_prev, a, pp, r, ndk):
    """Stage 2: the six gradients for one (r)-slice (in-kernel version of
    ops.adjoint.adjoint_grads_from_scan)."""
    o = lam.shape[0]
    eye_o = jnp.eye(o, dtype=f.dtype)[..., None]
    n_mat = 0.5 * (_mm(r, _t(r)) - ndk)
    g_q = n_mat
    g_c = r
    g_f = _mm(r, _t(pm)) + 2.0 * _mm(n_mat, _mm(f, pp_prev))
    m_s = a + _mm(pp, r)
    p_s = _sym(pp - _mm(pp, _mm(ndk, pp)))
    keep = mk > 0.5
    lam_safe = jnp.where(keep, lam, eye_o)
    lam_inv = _inv(lam_safe)
    y = _mm(lam_inv, nu)
    a_k = p_s + _mm(m_s, _t(m_s))
    g_nu = _mm(h, m_s) - y
    g_lam = 0.5 * (_mm(y, _t(y)) - _mm(h, _mm(a_k, _t(h))) + lam_inv)
    g_h = _mm(nu, _t(m_s)) - _mm(lam, _mm(h, a_k))
    zero = jnp.zeros((), f.dtype)
    g_nu = jnp.where(keep, g_nu, zero)
    g_lam = jnp.where(keep, g_lam, zero)
    g_h = jnp.where(keep, g_h, zero)
    return g_f, g_c, g_q, g_h, g_nu, g_lam


def _adjoint_kernel(f_ref, c_ref, q_ref, h_ref, nu_ref, lam_ref, mk_ref,
                    mp_ref, pp_ref, fn_ref, gs_ref,
                    gf_ref, gc_ref, gq_ref, gh_ref, gnu_ref, glam_ref,
                    carry_e, carry_g, carry_l, *, r_blk, lanes):
    """Fused Koopman backward: adjoint elements + reverse suffix scan +
    gradient assembly, one HBM round trip.  Grid runs back-to-front over
    chunks; mp/pp are the globally-shifted filtered moments (m_{k-1},
    P_{k-1}) and fn is F_{k+1}, all supplied pre-shifted."""
    d = f_ref.shape[1]
    dtype = f_ref.dtype
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        ident = _smoother_identity(d, 1, 1, dtype)
        carry_e[...] = ident[0]
        carry_g[...] = ident[1]
        carry_l[...] = ident[2]

    def raw(r):
        return (f_ref[0, :, :, r, :], c_ref[0, :, :, r, :],
                q_ref[0, :, :, r, :], h_ref[0, :, :, r, :],
                nu_ref[0, :, :, r, :], lam_ref[0, :, :, r, :],
                mk_ref[0, :, :, r, :], mp_ref[0, :, :, r, :],
                pp_ref[0, :, :, r, :], fn_ref[0, :, :, r, :])

    stage1 = []
    elems = []
    for r in range(r_blk):
        f, cv, q, h, nu, lam, mk, pm, ppv, fnx = raw(r)
        a, pp, l_mat, g_elem, v_elem = _adjoint_elem_slice(
            f, cv, q, h, nu, lam, fnx, pm, ppv)
        stage1.append((a, pp))
        elems.append((_t(l_mat), g_elem, v_elem))

    # reverse suffix scan over the chunk (as in _smoother_kernel)
    suf = [elems[r_blk - 1]]
    for r in range(r_blk - 2, -1, -1):
        suf.append(_combine_smoother(suf[-1], elems[r]))
    suf = suf[::-1]
    ident = _smoother_identity(d, 1, lanes, dtype)
    lane = jax.lax.broadcasted_iota(jnp.int32, (d, d, lanes), dimension=2)
    lane_b = jax.lax.broadcasted_iota(jnp.int32, (d, 1, lanes), dimension=2)
    masks = (lane, lane_b, lane)
    tot = suf[0]
    k = 1
    while k < lanes:
        shifted = tuple(pltpu.roll(t, lanes - k, 2) for t in tot)
        shifted = tuple(jnp.where(m >= lanes - k, idl, s)
                        for m, idl, s in zip(masks, ident, shifted))
        tot = _combine_smoother(shifted, tot)
        k *= 2
    excl = tuple(pltpu.roll(t, lanes - 1, 2) for t in tot)
    excl = tuple(jnp.where(m >= lanes - 1, idl, s)
                 for m, idl, s in zip(masks, ident, excl))
    carry = (carry_e[...], carry_g[...], carry_l[...])
    carry_bcast = tuple(jnp.broadcast_to(cc, x.shape)
                        for cc, x in zip(carry, excl))
    exc = _combine_smoother(carry_bcast, excl)

    gs = gs_ref[0, 0]
    for r in range(r_blk):
        out_r = _combine_smoother(exc, suf[r])
        rr, ndk = out_r[1], out_r[2]
        f, cv, q, h, nu, lam, mk, pm, ppv, fnx = raw(r)
        a, pp = stage1[r]
        g_f, g_c, g_q, g_h, g_nu, g_lam = _adjoint_grads_slice(
            f, h, nu, lam, mk, pm, ppv, a, pp, rr, ndk)
        gf_ref[0, :, :, r, :] = gs * g_f
        gc_ref[0, :, :, r, :] = gs * g_c
        gq_ref[0, :, :, r, :] = gs * g_q
        gh_ref[0, :, :, r, :] = gs * g_h
        gnu_ref[0, :, :, r, :] = gs * g_nu
        glam_ref[0, :, :, r, :] = gs * g_lam

    exc_first = tuple(x[..., :1] for x in exc)
    suf_first = tuple(x[..., :1] for x in suf[0])
    new_carry = _combine_smoother(exc_first, suf_first)
    carry_e[...] = new_carry[0]
    carry_g[...] = new_carry[1]
    carry_l[...] = new_carry[2]


def pallas_adjoint_pipeline(F, c, Q, H, nu, lam, maskf, m_f, p_f, gscale, *,
                            chunk: int = PALLAS_CHUNK, r_blk: int = None,
                            interpret: bool = False):
    """Fused Koopman backward pass: raw TL inputs + saved filtered moments
    -> the six gradients, scaled by the upstream cotangent ``gscale``
    ([...]-shaped, one scalar per batch row).

    ``maskf`` is [..., 1, 1, N] floats (>0.5 = observed) or None.
    """
    lead = F.shape[:-3]
    n = F.shape[-1]
    if maskf is None:
        maskf = jnp.ones(lead + (1, 1, n), F.dtype)
    # global boundary shifts (XLA side: two cheap copies)
    zfirst = lambda x: jnp.concatenate(
        [jnp.zeros_like(x[..., :1]), x[..., :-1]], axis=-1)
    m_prev = zfirst(m_f)
    p_prev = zfirst(p_f)
    f_next = jnp.concatenate(
        [F[..., 1:], jnp.zeros_like(F[..., :1])], axis=-1)
    flat = lambda x: x.reshape((-1,) + x.shape[-3:])
    arrs = [flat(x) for x in (F, c, Q, H, nu, lam, maskf,
                              m_prev, p_prev, f_next)]
    bdim = arrs[0].shape[0]
    d = arrs[0].shape[1]
    o = arrs[5].shape[1]
    gs = jnp.broadcast_to(gscale, lead).reshape(bdim, 1).astype(F.dtype)
    r_blk, lanes = _split_chunk(chunk, r_blk)
    num_chunks = -(-n // chunk)
    pad = num_chunks * chunk - n
    if pad:
        # front-pad (reverse scan): identity adjoint elements need
        # f_next = I, everything else 0 except Q = I (keeps zt invertible)
        eye_d = jnp.broadcast_to(jnp.eye(d, dtype=F.dtype)[..., None],
                                 (bdim, d, d, pad))

        def fpad(x, fill=None):
            f = jnp.zeros(x.shape[:-1] + (pad,), x.dtype) if fill is None \
                else fill
            return jnp.concatenate([f, x], axis=-1)

        arrs = [fpad(arrs[0]), fpad(arrs[1]), fpad(arrs[2], eye_d),
                fpad(arrs[3]), fpad(arrs[4]), fpad(arrs[5]), fpad(arrs[6]),
                fpad(arrs[7]), fpad(arrs[8]), fpad(arrs[9], eye_d)]
    blk = functools.partial(_to_blocked, r_blk=r_blk)
    arrs = [blk(x) for x in arrs]

    rev = lambda bi, i: (bi, 0, 0, 0, pl.num_programs(1) - 1 - i)
    spec = lambda d1, d2: pl.BlockSpec((1, d1, d2, r_blk, lanes), rev,
                                       memory_space=pltpu.VMEM)
    nb_tot = num_chunks * lanes
    shp = lambda d1, d2: jax.ShapeDtypeStruct(
        (bdim, d1, d2, r_blk, nb_tot), F.dtype)
    out = pl.pallas_call(
        functools.partial(_adjoint_kernel, r_blk=r_blk, lanes=lanes),
        grid=(bdim, num_chunks),
        in_specs=[spec(d, d), spec(d, 1), spec(d, d), spec(o, d),
                  spec(o, 1), spec(o, o), spec(1, 1), spec(d, 1),
                  spec(d, d), spec(d, d),
                  pl.BlockSpec((1, 1), lambda bi, i: (bi, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=(spec(d, d), spec(d, 1), spec(d, d), spec(o, d),
                   spec(o, 1), spec(o, o)),
        out_shape=(shp(d, d), shp(d, 1), shp(d, d), shp(o, d),
                   shp(o, 1), shp(o, o)),
        scratch_shapes=[
            pltpu.VMEM((d, d, 1), F.dtype),
            pltpu.VMEM((d, 1, 1), F.dtype),
            pltpu.VMEM((d, d, 1), F.dtype),
        ],
        interpret=interpret,
    )(*arrs, gs)
    unblk = lambda x, d1, d2: _from_blocked(x)[..., pad:].reshape(
        lead + (d1, d2, n))
    return (unblk(out[0], d, d), unblk(out[1], d, 1), unblk(out[2], d, d),
            unblk(out[3], o, d), unblk(out[4], o, 1), unblk(out[5], o, o))


def _split_chunk(chunk, r_blk=None):
    r_blk = PALLAS_BLOCK if r_blk is None else r_blk
    while r_blk > 1 and chunk % r_blk:
        r_blk //= 2
    return r_blk, chunk // r_blk


def _flatten_batch(x):
    """[..., d, db, N] -> [B, d, db, N] (B = prod of leading dims, >= 1)."""
    lead = x.shape[:-3]
    return x.reshape((-1,) + x.shape[-3:]), lead


def pallas_filter_scan(elems, *, chunk: int = PALLAS_CHUNK,
                       r_blk: int = None, interpret: bool = False):
    """Filtered means/covs from TL-layout FilterElements.

    elems: (A [..., d,d,N], b [..., d,1,N], C [..., d,d,N], J [..., d,d,N],
    eta [..., d,1,N]) with arbitrary (possibly empty) leading batch dims —
    batches become a leading grid dimension (the carry resets at chunk 0 of
    every batch row).  Returns (m_f [..., d,1,N], P_f [..., d,d,N]).
    """
    lead = elems[0].shape[:-3]
    a, b, c, j, e = (x.reshape((-1,) + x.shape[-3:]) for x in elems)
    bdim = a.shape[0]
    d = a.shape[1]
    db = b.shape[2]
    n = a.shape[-1]
    r_blk, lanes = _split_chunk(chunk, r_blk)
    num_chunks = -(-n // chunk)
    pad = num_chunks * chunk - n
    if pad:
        ident = _identity_elem(d, db, pad, a.dtype)
        cat = lambda x, i: jnp.concatenate(
            [x, jnp.broadcast_to(i, (bdim,) + i.shape)], axis=-1)
        a, b, c = cat(a, ident[0]), cat(b, ident[1]), cat(c, ident[2])
        j, e = cat(j, ident[3]), cat(e, ident[4])
    blk = functools.partial(_to_blocked, r_blk=r_blk)
    a, b, c, j, e = blk(a), blk(b), blk(c), blk(j), blk(e)

    idx = lambda bi, i: (bi, 0, 0, 0, i)
    mat_spec = pl.BlockSpec((1, d, d, r_blk, lanes), idx,
                            memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, d, db, r_blk, lanes), idx,
                            memory_space=pltpu.VMEM)
    nb_tot = num_chunks * lanes
    out = pl.pallas_call(
        functools.partial(_filter_kernel, r_blk=r_blk, lanes=lanes),
        grid=(bdim, num_chunks),
        in_specs=[mat_spec, vec_spec, mat_spec, mat_spec, vec_spec],
        out_specs=(vec_spec, mat_spec),
        out_shape=(
            jax.ShapeDtypeStruct((bdim, d, db, r_blk, nb_tot), a.dtype),
            jax.ShapeDtypeStruct((bdim, d, d, r_blk, nb_tot), a.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((d, d, 1), a.dtype),
            pltpu.VMEM((d, db, 1), a.dtype),
            pltpu.VMEM((d, d, 1), a.dtype),
            pltpu.VMEM((d, d, 1), a.dtype),
            pltpu.VMEM((d, db, 1), a.dtype),
        ],
        interpret=interpret,
    )(a, b, c, j, e)
    m_f, p_f = _from_blocked(out[0]), _from_blocked(out[1])
    return (m_f[..., :n].reshape(lead + (d, db, n)),
            p_f[..., :n].reshape(lead + (d, d, n)))


def pallas_filter_pipeline(F, c, Q, H, nu, lam, maskf=None, *,
                           chunk: int = PALLAS_CHUNK, r_blk: int = None,
                           interpret: bool = False):
    """Fused forward pipeline: raw TL inputs -> (m_f, p_f, loglik).

    One Pallas call builds the filter elements in VMEM, runs the prefix
    scan, and accumulates the site log-likelihood — no element or
    predicted-moment arrays ever touch HBM.  Input shapes as in
    ``kalman.make_filter_elements_tl`` (arbitrary leading batch dims);
    ``maskf`` is [..., 1, 1, N] (floats, >0.5 = observed) or None.
    """
    lead = F.shape[:-3]
    n = F.shape[-1]
    if maskf is None:
        maskf = jnp.ones(lead + (1, 1, n), F.dtype)
    flat = lambda x: x.reshape((-1,) + x.shape[-3:])
    F, c, Q, H, nu, lam, maskf = (flat(x) for x in
                                  (F, c, Q, H, nu, lam, maskf))
    bdim = F.shape[0]
    d = F.shape[1]
    o = lam.shape[1]
    r_blk, lanes = _split_chunk(chunk, r_blk)
    num_chunks = -(-n // chunk)
    pad = num_chunks * chunk - n
    if pad:
        # (F = I, rest = 0) constructs exact identity elements; mask = 0
        # zeroes the likelihood there.
        eye = jnp.broadcast_to(jnp.eye(d, dtype=F.dtype)[..., None],
                               (bdim, d, d, pad))
        zpad = lambda x: jnp.concatenate(
            [x, jnp.zeros(x.shape[:-1] + (pad,), x.dtype)], axis=-1)
        F = jnp.concatenate([F, eye], axis=-1)
        c, Q, H, nu, lam, maskf = (zpad(x) for x in (c, Q, H, nu, lam, maskf))
    blk = functools.partial(_to_blocked, r_blk=r_blk)
    F, c, Q, H, nu, lam, maskf = (blk(x) for x in
                                  (F, c, Q, H, nu, lam, maskf))

    idx = lambda bi, i: (bi, 0, 0, 0, i)
    spec = lambda d1, d2: pl.BlockSpec((1, d1, d2, r_blk, lanes), idx,
                                       memory_space=pltpu.VMEM)
    nb_tot = num_chunks * lanes
    out = pl.pallas_call(
        functools.partial(_pipeline_kernel, r_blk=r_blk, lanes=lanes),
        grid=(bdim, num_chunks),
        in_specs=[spec(d, d), spec(d, 1), spec(d, d), spec(o, d),
                  spec(o, 1), spec(o, o), spec(1, 1)],
        out_specs=(spec(d, 1), spec(d, d),
                   pl.BlockSpec((1, 1), lambda bi, i: (bi, 0),
                                memory_space=pltpu.SMEM)),
        out_shape=(
            jax.ShapeDtypeStruct((bdim, d, 1, r_blk, nb_tot), F.dtype),
            jax.ShapeDtypeStruct((bdim, d, d, r_blk, nb_tot), F.dtype),
            jax.ShapeDtypeStruct((bdim, 1), F.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((d, d, 1), F.dtype),
            pltpu.VMEM((d, 1, 1), F.dtype),
            pltpu.VMEM((d, d, 1), F.dtype),
            pltpu.VMEM((d, d, 1), F.dtype),
            pltpu.VMEM((d, 1, 1), F.dtype),
        ],
        interpret=interpret,
    )(F, c, Q, H, nu, lam, maskf)
    m_f, p_f = _from_blocked(out[0]), _from_blocked(out[1])
    return (m_f[..., :n].reshape(lead + (d, 1, n)),
            p_f[..., :n].reshape(lead + (d, d, n)),
            out[2][:, 0].reshape(lead))


def pallas_smoother_scan(elems, *, chunk: int = PALLAS_CHUNK,
                         r_blk: int = None, interpret: bool = False):
    """Reverse (suffix) smoothing scan: elems = (E [..., d,d,N],
    g [..., d,1,N], L [..., d,d,N]) in TL layout, arbitrary leading batch
    dims.  Returns (m_s [..., d,1,N], P_s [..., d,d,N]).

    Grid runs back-to-front over chunks (with a leading batch grid axis);
    the carry holds the suffix combination of all later chunks and resets
    at the start of each batch row.
    """
    lead = elems[0].shape[:-3]
    e, g, l = (x.reshape((-1,) + x.shape[-3:]) for x in elems)
    bdim = e.shape[0]
    d = e.shape[1]
    db = g.shape[2]
    n = e.shape[-1]
    r_blk, lanes = _split_chunk(chunk, r_blk)
    num_chunks = -(-n // chunk)
    pad = num_chunks * chunk - n
    if pad:
        ident = _smoother_identity(d, db, pad, e.dtype)
        # pad at the FRONT for a reverse scan
        cat = lambda x, i: jnp.concatenate(
            [jnp.broadcast_to(i, (bdim,) + i.shape), x], axis=-1)
        e, g, l = cat(e, ident[0]), cat(g, ident[1]), cat(l, ident[2])
    blk = functools.partial(_to_blocked, r_blk=r_blk)
    e, g, l = blk(e), blk(g), blk(l)

    rev = lambda bi, i: (bi, 0, 0, 0, pl.num_programs(1) - 1 - i)
    mat_spec = pl.BlockSpec((1, d, d, r_blk, lanes), rev,
                            memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, d, db, r_blk, lanes), rev,
                            memory_space=pltpu.VMEM)
    nb_tot = num_chunks * lanes
    out = pl.pallas_call(
        functools.partial(_smoother_kernel, r_blk=r_blk, lanes=lanes),
        grid=(bdim, num_chunks),
        in_specs=[mat_spec, vec_spec, mat_spec],
        out_specs=(vec_spec, mat_spec),
        out_shape=(
            jax.ShapeDtypeStruct((bdim, d, db, r_blk, nb_tot), e.dtype),
            jax.ShapeDtypeStruct((bdim, d, d, r_blk, nb_tot), e.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((d, d, 1), e.dtype),
            pltpu.VMEM((d, db, 1), e.dtype),
            pltpu.VMEM((d, d, 1), e.dtype),
        ],
        interpret=interpret,
    )(e, g, l)
    m_s, p_s = _from_blocked(out[0]), _from_blocked(out[1])
    return (m_s[..., pad:].reshape(lead + (d, db, n)),
            p_s[..., pad:].reshape(lead + (d, d, n)))
