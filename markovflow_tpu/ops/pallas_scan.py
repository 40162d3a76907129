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
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pallas_filter_scan", "pallas_filter_pipeline",
           "pallas_smoother_scan", "pick_scan_engine",
           "PALLAS_CHUNK", "PALLAS_BLOCK"]


def pick_scan_engine(F, engine: str, lam=None) -> str:
    """Resolve an engine request against kernel eligibility.

    The Pallas kernels support arbitrary leading batch dims (a batch grid
    axis), d <= 12 (closed-form inverses up to 3, recursive Schur-complement
    blocking above — two Matern52 summands is d = 6, three is d = 9),
    float32, the TPU backend only; any ineligible request silently
    resolves to the XLA scans so library code can default to
    ``engine="pallas"`` safely (e.g. the CPU/x64 test suite, GPU backends).

    ``lam`` (site precisions, [..., o, o, N]) is checked when given: the
    in-kernel innovation inverse also requires o <= 12 / float32.
    """
    # MFTPU_FORCE_XLA_SCANS=1 disables the hand-written kernels globally
    # (read at trace time): escape hatch for Mosaic compile pathologies —
    # observed: the d = 9 recursive-Schur kernel's backend compile outruns
    # any practical budget on the remote-compile runtime.
    import os as _os

    if engine != "pallas" or _os.environ.get("MFTPU_FORCE_XLA_SCANS") == "1":
        return "xla"
    if F.ndim < 3 or F.shape[-3] > 12 or F.dtype != jnp.float32:
        return "xla"
    if lam is not None and (lam.ndim < 3 or lam.shape[-3] > 12
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


def _roll(t, k, axis):
    """pltpu.roll with the shift pinned to i32.  Under jax_enable_x64 a bare
    Python-int shift traces as i64 and Mosaic's tpu.dynamic_rotate requires a
    32-bit signless shift — so every in-kernel roll goes through here."""
    return pltpu.roll(t, np.int32(k), axis)


def _c(val, like):
    """Dtype-matched scalar constant.  Weak-typed Python floats inside the
    kernels promote to f64 under jax_enable_x64, and Mosaic cannot lower the
    resulting f64->f32 casts — so every in-kernel literal goes through here."""
    return jnp.asarray(val, like.dtype)


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
        return _c(1.0, m) / m
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
    if d <= 12:
        # Recursive Schur-complement block reduction onto the d <= 3 closed
        # forms: inv([[A, B], [C, D]]) with S = D - C A^-1 B.  One level
        # covers d <= 6; d <= 12 recurses once more (the operands here are
        # innovation/posterior covariances — PSD plus observation noise —
        # so the unpivoted reduction is well-conditioned in practice; grad
        # parity vs the XLA engine is tested at d = 9).
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
    raise NotImplementedError("pallas filter scan supports d <= 12")


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
    return _c(0.5, a) * (a + _t(a))


def _eye(d, like):
    """Identity matrix shaped [d, d] + (1,)*trailing, broadcastable against
    ``like`` ([d, d, L] slices and [d, d, R, L] full blocks alike).

    Built from broadcasted_iota at the target rank: reshaping a 2-D
    ``jnp.eye`` constant to a higher rank lowers to a ``tpu.reshape`` that
    appends unit dims after the (sublane, lane) pair, which Mosaic's
    infer-vector-layout rejects ("unsupported shape cast")."""
    shape = (d, d) + (1,) * (like.ndim - 2)
    r = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    c = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return (r == c).astype(like.dtype)


def _make_elem_slice(f, cv, q, h, nu, lam):
    """Filter element from the raw inputs — the in-kernel version of
    kalman.make_filter_elements_tl.  Pure elementwise over every axis past
    the first two, so it accepts [dim1, dim2, L] single-r slices and
    [dim1, dim2, R, L] full blocks alike (full blocks tile the (8, 128)
    VPU grid completely; single-r slices waste 5/8 sublanes at d = 3)."""
    d = f.shape[0]
    o = lam.shape[0]
    eye_o = _eye(o, f)
    eye_d = _eye(d, f)
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
    kalman.filter_pipeline_tl.  Elementwise past the first two axes
    (accepts [*, *, L] slices and [*, *, R, L] blocks); returns [L] / [R, L]."""
    o = lam.shape[0]
    eye_o = _eye(o, f)
    m_pred = _mm(f, pm) + cv
    p_pred = _sym(_mm(f, _mm(pp, _t(f))) + q)
    hm = _mm(h, m_pred)
    hpht = _mm(h, _mm(p_pred, _t(h)))
    w = nu - _mm(lam, hm)
    keep = maskf > _c(0.5, maskf)                    # [1, 1, (R,) L]
    m_mat = jnp.where(keep, lam + _mm(lam, _mm(hpht, lam)), eye_o)
    lam_safe = jnp.where(keep, lam, eye_o)
    sol = _mm(_inv(m_mat), w)
    quad = jnp.sum(w * sol, axis=(0, 1))             # [(R,) L]
    log_det_s = jnp.log(jnp.abs(_det(eye_o + _mm(hpht, lam_safe)))) - \
        jnp.log(jnp.abs(_det(lam_safe)))
    ll = _c(-0.5, f) * (quad + log_det_s
                        + _c(o * math.log(2.0 * math.pi), f))
    return jnp.where(keep[0, 0], ll, _c(0.0, f))


def _combine(x, y):
    """x (earlier) (x) y (later) — filtering composition.  Elementwise past
    the first two axes ([d, *, L] slices or [d, *, R, L] blocks; legs may
    broadcast against each other)."""
    xa, xb, xc, xj, xe = x
    ya, yb, yc, yj, ye = y
    d = xa.shape[0]
    eye = _eye(d, xa)
    m_inv = _inv(eye + _mm(xc, yj))
    m_inv_t = _t(m_inv)
    a = _mm(ya, _mm(m_inv, xa))
    b = _mm(ya, _mm(m_inv, xb + _mm(xc, ye))) + yb
    c = _mm(ya, _mm(_mm(m_inv, xc), _t(ya))) + yc
    eta = _mm(_t(xa), _mm(m_inv_t, ye - _mm(yj, xb))) + xe
    j = _mm(_t(xa), _mm(m_inv_t, _mm(yj, xa))) + xj
    return a, b, c, j, eta


def _eye3(d, lanes, dtype):
    """[d, d, lanes] identity stack via iota (no rank-changing reshape of a
    2-D constant — see _eye for why Mosaic requires this form)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (d, d, lanes), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (d, d, lanes), 1)
    return (r == c).astype(dtype)


def _identity_elem(d, db, lanes, dtype):
    eye = _eye3(d, lanes, dtype)
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
    return (_eye3(d, lanes, dtype), jnp.zeros((d, db, lanes), dtype),
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
        shifted = tuple(_roll(t, k, 2) for t in tot)
        shifted = tuple(jnp.where(m < k, idl, s)
                        for m, idl, s in zip(masks, ident, shifted))
        tot = _combine(shifted, tot)
        k *= 2
    # exclusive lane prefix, then fold in the cross-chunk carry
    excl = tuple(_roll(t, 1, 2) for t in tot)
    excl = tuple(jnp.where(m < 1, idl, s)
                 for m, idl, s in zip(masks, ident, excl))
    carry = (carry_a[...], carry_b[...], carry_c[...], carry_j[...],
             carry_e[...])
    carry_bcast = tuple(jnp.broadcast_to(cc, x.shape)
                        for cc, x in zip(carry, excl))
    exc = _combine(carry_bcast, excl)

    # 3. fold the exclusive prefix into all within-block prefixes at once
    pref_blk = tuple(jnp.stack([p[i] for p in pref], axis=2)
                     for i in range(5))
    exc_b = tuple(x[:, :, None, :] for x in exc)
    out_blk = _combine(exc_b, pref_blk)
    mb_ref[0] = out_blk[1]
    pc_ref[0] = out_blk[2]

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

    fb, cb, qb, hb, nub, lamb, mkb = (f_ref[0], c_ref[0], q_ref[0],
                                      h_ref[0], nu_ref[0], lam_ref[0],
                                      mk_ref[0])
    # element construction on the full [*, *, R, L] block — tiles the
    # (8, 128) VPU grid completely (per-r [*, *, L] slices waste 5/8
    # sublanes at d = 3; measured: the fused kernels were elementwise-bound)
    eblk = _make_elem_slice(fb, cb, qb, hb, nub, lamb)

    def elem(r):
        return tuple(x[:, :, r, :] for x in eblk)

    # 1. within-block sequential prefixes
    pref = [elem(0)]
    for r in range(1, r_blk):
        pref.append(_combine(pref[-1], elem(r)))

    # 2. Hillis-Steele over the block totals
    ident = _identity_elem(d, db, lanes, dtype)
    lane = jax.lax.broadcasted_iota(jnp.int32, (d, d, lanes), dimension=2)
    lane_b = jax.lax.broadcasted_iota(jnp.int32, (d, db, lanes), dimension=2)
    masks = (lane, lane_b, lane, lane, lane_b)
    tot = pref[-1]
    k = 1
    while k < lanes:
        shifted = tuple(_roll(t, k, 2) for t in tot)
        shifted = tuple(jnp.where(m < k, idl, s)
                        for m, idl, s in zip(masks, ident, shifted))
        tot = _combine(shifted, tot)
        k *= 2
    excl = tuple(_roll(t, 1, 2) for t in tot)
    excl = tuple(jnp.where(m < 1, idl, s)
                 for m, idl, s in zip(masks, ident, excl))
    carry = (carry_a[...], carry_b[...], carry_c[...], carry_j[...],
             carry_e[...])
    carry_bcast = tuple(jnp.broadcast_to(cc, x.shape)
                        for cc, x in zip(carry, excl))
    exc = _combine(carry_bcast, excl)

    # 3. filtered moments + likelihood, one block combine (full VPU tiles):
    # stack the within-block prefixes along r, broadcast exc over r
    pref_blk = tuple(jnp.stack([p[i] for p in pref], axis=2)
                     for i in range(5))
    exc_b = tuple(x[:, :, None, :] for x in exc)
    out_blk = _combine(exc_b, pref_blk)
    outs_m, outs_p = out_blk[1], out_blk[2]           # [d, 1/d, R, L]
    # previous filtered state for r = 0: last row of the previous lane,
    # lane 0 taken from the cross-chunk carry (b/C of the carry element)
    # NB: bare negative int indices on kernel *values* lower to
    # dynamic_slice, which Mosaic does not implement — use positive ones.
    last_m = _roll(outs_m[:, :, r_blk - 1, :], 1, 2)
    last_p = _roll(outs_p[:, :, r_blk - 1, :], 1, 2)
    lane0 = lane_b[:1] < 1                           # [1, db, lanes]
    prev_m0 = jnp.where(lane0, jnp.broadcast_to(carry[1], last_m.shape),
                        last_m)
    prev_p0 = jnp.where(lane[:1] < 1,
                        jnp.broadcast_to(carry[2], last_p.shape), last_p)
    prev_m = jnp.concatenate([prev_m0[:, :, None, :], outs_m[:, :, :-1, :]],
                             axis=2)
    prev_p = jnp.concatenate([prev_p0[:, :, None, :], outs_p[:, :, :-1, :]],
                             axis=2)
    # likelihood on the full block (one call, full VPU tiles)
    ll_blk = _ll_slice(fb, cb, qb, hb, nub, lamb, mkb, prev_m, prev_p)
    mb_ref[0] = outs_m
    pc_ref[0] = outs_p
    ll_ref[0, 0] += jnp.sum(ll_blk)

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
        shifted = tuple(_roll(t, lanes - k, 2) for t in tot)
        shifted = tuple(jnp.where(m >= lanes - k, idl, s)
                        for m, idl, s in zip(masks, ident, shifted))
        tot = _combine_smoother(shifted, tot)
        k *= 2
    # exclusive lane suffix, then fold in the cross-chunk (later) carry
    excl = tuple(_roll(t, lanes - 1, 2) for t in tot)
    excl = tuple(jnp.where(m >= lanes - 1, idl, s)
                 for m, idl, s in zip(masks, ident, excl))
    carry = (carry_e[...], carry_g[...], carry_l[...])
    carry_bcast = tuple(jnp.broadcast_to(cc, x.shape)
                        for cc, x in zip(carry, excl))
    exc = _combine_smoother(carry_bcast, excl)

    # 3. fold the exclusive suffix into all within-block suffixes at once
    suf_blk = tuple(jnp.stack([s[i] for s in suf], axis=2) for i in range(3))
    exc_b = tuple(x[:, :, None, :] for x in exc)
    out_blk = _combine_smoother(exc_b, suf_blk)
    mg_ref[0] = out_blk[1]
    pl_ref[0] = out_blk[2]

    # 4. new carry: the full suffix at the first element of the chunk
    exc_first = tuple(x[..., :1] for x in exc)
    suf_first = tuple(x[..., :1] for x in suf[0])
    new_carry = _combine_smoother(exc_first, suf_first)
    carry_e[...] = new_carry[0]
    carry_g[...] = new_carry[1]
    carry_l[...] = new_carry[2]


def _adjoint_elem_slice(f, cv, q, h, nu, lam, f_next, pm, pp_prev):
    """Stage 1 of the Koopman adjoint (in-kernel version of
    ops.adjoint.adjoint_scan_elements).  Elementwise past the first two
    axes — accepts [*, *, L] slices and [*, *, R, L] blocks.  Returns
    (a, pp, l_mat, g_elem, v_elem)."""
    d = f.shape[0]
    o = lam.shape[0]
    eye_o = _eye(o, f)
    eye_d = _eye(d, f)
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
    """Stage 2: the six gradients (in-kernel version of
    ops.adjoint.adjoint_grads_from_scan).  Elementwise past the first two
    axes — accepts [*, *, L] slices and [*, *, R, L] blocks."""
    o = lam.shape[0]
    eye_o = _eye(o, f)
    n_mat = _c(0.5, f) * (_mm(r, _t(r)) - ndk)
    g_q = n_mat
    g_c = r
    g_f = _mm(r, _t(pm)) + _c(2.0, f) * _mm(n_mat, _mm(f, pp_prev))
    m_s = a + _mm(pp, r)
    p_s = _sym(pp - _mm(pp, _mm(ndk, pp)))
    keep = mk > _c(0.5, mk)
    lam_safe = jnp.where(keep, lam, eye_o)
    lam_inv = _inv(lam_safe)
    y = _mm(lam_inv, nu)
    a_k = p_s + _mm(m_s, _t(m_s))
    g_nu = _mm(h, m_s) - y
    g_lam = _c(0.5, f) * (_mm(y, _t(y)) - _mm(h, _mm(a_k, _t(h))) + lam_inv)
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

    fb, cb, qb, hb, nub, lamb, mkb, mpb, ppb, fnb = (
        f_ref[0], c_ref[0], q_ref[0], h_ref[0], nu_ref[0], lam_ref[0],
        mk_ref[0], mp_ref[0], pp_ref[0], fn_ref[0])
    # stage 1 on the full [*, *, R, L] block (full VPU tiles; per-r slices
    # waste 5/8 sublanes at d = 3 — the reason the fused kernel originally
    # measured slower than the split XLA-elementwise form)
    a_blk, pp_blk, l_blk, g_blk, v_blk = _adjoint_elem_slice(
        fb, cb, qb, hb, nub, lamb, fnb, mpb, ppb)
    lt_blk = _t(l_blk)

    def elem(r):
        return (lt_blk[:, :, r, :], g_blk[:, :, r, :], v_blk[:, :, r, :])

    # reverse suffix scan over the chunk (as in _smoother_kernel)
    suf = [elem(r_blk - 1)]
    for r in range(r_blk - 2, -1, -1):
        suf.append(_combine_smoother(suf[-1], elem(r)))
    suf = suf[::-1]
    ident = _smoother_identity(d, 1, lanes, dtype)
    lane = jax.lax.broadcasted_iota(jnp.int32, (d, d, lanes), dimension=2)
    lane_b = jax.lax.broadcasted_iota(jnp.int32, (d, 1, lanes), dimension=2)
    masks = (lane, lane_b, lane)
    tot = suf[0]
    k = 1
    while k < lanes:
        shifted = tuple(_roll(t, lanes - k, 2) for t in tot)
        shifted = tuple(jnp.where(m >= lanes - k, idl, s)
                        for m, idl, s in zip(masks, ident, shifted))
        tot = _combine_smoother(shifted, tot)
        k *= 2
    excl = tuple(_roll(t, lanes - 1, 2) for t in tot)
    excl = tuple(jnp.where(m >= lanes - 1, idl, s)
                 for m, idl, s in zip(masks, ident, excl))
    carry = (carry_e[...], carry_g[...], carry_l[...])
    carry_bcast = tuple(jnp.broadcast_to(cc, x.shape)
                        for cc, x in zip(carry, excl))
    exc = _combine_smoother(carry_bcast, excl)

    gs = gs_ref[0, 0]
    suf_blk = tuple(jnp.stack([s[i] for s in suf], axis=2) for i in range(3))
    exc_b = tuple(x[:, :, None, :] for x in exc)
    out_blk = _combine_smoother(exc_b, suf_blk)
    r_stack, ndk_stack = out_blk[1], out_blk[2]        # [d, 1/d, R, L]
    # stage 2 on the full block (one call, full VPU tiles)
    g_f, g_c, g_q, g_h, g_nu, g_lam = _adjoint_grads_slice(
        fb, hb, nub, lamb, mkb, mpb, ppb, a_blk, pp_blk, r_stack, ndk_stack)
    gf_ref[0] = gs * g_f
    gc_ref[0] = gs * g_c
    gq_ref[0] = gs * g_q
    gh_ref[0] = gs * g_h
    gnu_ref[0] = gs * g_nu
    glam_ref[0] = gs * g_lam

    exc_first = tuple(x[..., :1] for x in exc)
    suf_first = tuple(x[..., :1] for x in suf[0])
    new_carry = _combine_smoother(exc_first, suf_first)
    carry_e[...] = new_carry[0]
    carry_g[...] = new_carry[1]
    carry_l[...] = new_carry[2]


def pallas_adjoint_pipeline(F, c, Q, H, nu, lam, maskf, m_f, p_f, gscale, *,
                            chunk: int = None, r_blk: int = None,
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
    chunk, r_blk, lanes = _resolve_chunk(d, chunk, r_blk)
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


def _resolve_chunk(d, chunk, r_blk):
    """(chunk, r_blk, lanes) with VMEM-aware defaults.

    The in-kernel working set is O(d^2 * chunk) f32 against ~16 MB of VMEM:
    4096 fits d <= 6; larger state dims halve the chunk (d <= 9 -> 2048,
    d <= 12 -> 1024) while r_blk shrinks in step so lanes = chunk / r_blk
    stays at the 128-lane hardware tile.  Explicit ``chunk`` wins (tests
    pass tiny chunks in interpret mode)."""
    if chunk is None:
        if d <= 6:
            chunk = PALLAS_CHUNK
        elif d <= 9:
            chunk, r_blk = PALLAS_CHUNK // 2, (
                16 if r_blk is None else r_blk)
        else:
            chunk, r_blk = PALLAS_CHUNK // 4, (
                8 if r_blk is None else r_blk)
    r_blk, lanes = _split_chunk(chunk, r_blk)
    return chunk, r_blk, lanes


def _flatten_batch(x):
    """[..., d, db, N] -> [B, d, db, N] (B = prod of leading dims, >= 1)."""
    lead = x.shape[:-3]
    return x.reshape((-1,) + x.shape[-3:]), lead


def pallas_filter_scan(elems, *, chunk: int = None,
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
    chunk, r_blk, lanes = _resolve_chunk(d, chunk, r_blk)
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
                           chunk: int = None, r_blk: int = None,
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
    chunk, r_blk, lanes = _resolve_chunk(d, chunk, r_blk)
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


# --------------------------------------------------------------------------
# Uniform-grid (stationary) fast path.
#
# On a uniform time grid with a stationary kernel, the prior-step arrays are
# constant across time: F_k = A(dt), c_k = (I - A) m, Q_k = Q(dt) for every
# k >= 1, with element 0 encoding the prior (F_0 = 0, c_0 = mu0, Q_0 = P0),
# and the emission H is constant.  The d^2-sized [d, d, N] arrays (~36 MB
# each at T = 1e6, d = 3) dominate the fused kernels' HBM traffic; here they
# enter as [d, d, 1] constants broadcast in VMEM, and the backward kernel
# accumulates their (broadcast-VJP) gradient SUMS in VMEM so no d^2-sized
# gradient array ever touches HBM.  Sites (nu, lam, mask) stay per-step —
# they are o^2-sized (tiny for o = 1) and genuinely data-dependent — so the
# same kernels serve GPR (constant lam), CVI/PEP sites, and sparse masks.
# --------------------------------------------------------------------------
def _uniform_pipeline_kernel(fc_ref, cc_ref, qc_ref, m0_ref, p0_ref, h_ref,
                             nu_ref, lam_ref, mk_ref,
                             mb_ref, pc_ref, ll_ref,
                             carry_a, carry_b, carry_c, carry_j, carry_e,
                             *, r_blk, lanes):
    """Fused forward pipeline with constant (F, c, Q, H): the prior-step
    constants are broadcast in VMEM; element 0 (the prior) is substituted
    in-register via the global-index mask.  Tail padding is handled on the
    XLA side with (nu = 0, lam = 0, mask = 0) steps — a site-free prediction
    step is a valid element whose prefix leaves earlier results unchanged."""
    d = fc_ref.shape[1]
    dtype = fc_ref.dtype
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        ident = _identity_elem(d, 1, 1, dtype)
        carry_a[...] = ident[0]
        carry_b[...] = ident[1]
        carry_c[...] = ident[2]
        carry_j[...] = ident[3]
        carry_e[...] = ident[4]
        ll_ref[0, 0] = jnp.zeros((), dtype)

    c4 = lambda ref: ref[0]                           # [d1, d2, 1, 1]
    fc, ccst, qc = c4(fc_ref), c4(cc_ref), c4(qc_ref)
    m0, p0, hb = c4(m0_ref), c4(p0_ref), c4(h_ref)
    nub, lamb, mkb = nu_ref[0], lam_ref[0], mk_ref[0]  # [o, *, R, L]

    rl = (jax.lax.broadcasted_iota(jnp.int32, (1, 1, r_blk, lanes), 3)
          * r_blk
          + jax.lax.broadcasted_iota(jnp.int32, (1, 1, r_blk, lanes), 2))
    first = (i == 0) & (rl == 0)                      # global element 0
    zero = jnp.zeros((), dtype)
    f_in = jnp.where(first, zero, fc)
    c_in = jnp.where(first, m0, ccst)
    q_in = jnp.where(first, p0, qc)

    eblk = _make_elem_slice(f_in, c_in, q_in, hb, nub, lamb)

    def elem(r):
        return tuple(x[:, :, r, :] for x in eblk)

    # 1. within-block sequential prefixes
    pref = [elem(0)]
    for r in range(1, r_blk):
        pref.append(_combine(pref[-1], elem(r)))

    # 2. Hillis-Steele over the block totals
    db = 1
    ident = _identity_elem(d, db, lanes, dtype)
    lane = jax.lax.broadcasted_iota(jnp.int32, (d, d, lanes), dimension=2)
    lane_b = jax.lax.broadcasted_iota(jnp.int32, (d, db, lanes), dimension=2)
    masks = (lane, lane_b, lane, lane, lane_b)
    tot = pref[-1]
    k = 1
    while k < lanes:
        shifted = tuple(_roll(t, k, 2) for t in tot)
        shifted = tuple(jnp.where(m < k, idl, s)
                        for m, idl, s in zip(masks, ident, shifted))
        tot = _combine(shifted, tot)
        k *= 2
    excl = tuple(_roll(t, 1, 2) for t in tot)
    excl = tuple(jnp.where(m < 1, idl, s)
                 for m, idl, s in zip(masks, ident, excl))
    carry = (carry_a[...], carry_b[...], carry_c[...], carry_j[...],
             carry_e[...])
    carry_bcast = tuple(jnp.broadcast_to(cc, x.shape)
                        for cc, x in zip(carry, excl))
    exc = _combine(carry_bcast, excl)

    # 3. filtered moments + likelihood, one block combine
    pref_blk = tuple(jnp.stack([p[j] for p in pref], axis=2)
                     for j in range(5))
    exc_b = tuple(x[:, :, None, :] for x in exc)
    out_blk = _combine(exc_b, pref_blk)
    outs_m, outs_p = out_blk[1], out_blk[2]
    last_m = _roll(outs_m[:, :, r_blk - 1, :], 1, 2)
    last_p = _roll(outs_p[:, :, r_blk - 1, :], 1, 2)
    lane0 = lane_b[:1] < 1
    prev_m0 = jnp.where(lane0, jnp.broadcast_to(carry[1], last_m.shape),
                        last_m)
    prev_p0 = jnp.where(lane[:1] < 1,
                        jnp.broadcast_to(carry[2], last_p.shape), last_p)
    prev_m = jnp.concatenate([prev_m0[:, :, None, :], outs_m[:, :, :-1, :]],
                             axis=2)
    prev_p = jnp.concatenate([prev_p0[:, :, None, :], outs_p[:, :, :-1, :]],
                             axis=2)
    ll_blk = _ll_slice(f_in, c_in, q_in, hb, nub, lamb, mkb, prev_m, prev_p)
    mb_ref[0] = outs_m
    pc_ref[0] = outs_p
    ll_ref[0, 0] += jnp.sum(ll_blk)

    # 4. new carry
    exc_last = tuple(x[..., -1:] for x in exc)
    pref_last = tuple(x[..., -1:] for x in pref[-1])
    new_carry = _combine(exc_last, pref_last)
    carry_a[...] = new_carry[0]
    carry_b[...] = new_carry[1]
    carry_c[...] = new_carry[2]
    carry_j[...] = new_carry[3]
    carry_e[...] = new_carry[4]


def pallas_filter_pipeline_uniform(Fc, cc, Qc, mu0, P0, Hc, nu, lam,
                                   maskf=None, *, chunk: int = None,
                                   r_blk: int = None,
                                   interpret: bool = False):
    """Fused forward pipeline for a uniform grid: constant prior steps
    (Fc, cc, Qc [..., d, d/1, 1]), prior (mu0 [..., d, 1, 1],
    P0 [..., d, d, 1]), constant emission Hc [..., o, d, 1]; per-step sites
    nu [..., o, 1, N], lam [..., o, o, N], optional maskf [..., 1, 1, N].
    Returns (m_f, p_f, loglik) exactly as :func:`pallas_filter_pipeline`
    on the materialized arrays."""
    lead = nu.shape[:-3]
    n = nu.shape[-1]
    d = Fc.shape[-3]
    o = lam.shape[-3]
    if maskf is None:
        maskf = jnp.ones(lead + (1, 1, n), nu.dtype)
    bc = lambda x, d1, d2: jnp.broadcast_to(
        x, lead + (d1, d2, 1)).reshape((-1, d1, d2, 1, 1))
    fc = bc(Fc, d, d)
    ccst = bc(cc, d, 1)
    qc = bc(Qc, d, d)
    m0 = bc(mu0, d, 1)
    p0 = bc(P0, d, d)
    hc = bc(Hc, o, d)
    flat = lambda x: x.reshape((-1,) + x.shape[-3:])
    nu, lam, maskf = flat(nu), flat(lam), flat(maskf)
    bdim = nu.shape[0]
    chunk, r_blk, lanes = _resolve_chunk(d, chunk, r_blk)
    num_chunks = -(-n // chunk)
    pad = num_chunks * chunk - n
    if pad:
        zpad = lambda x: jnp.concatenate(
            [x, jnp.zeros(x.shape[:-1] + (pad,), x.dtype)], axis=-1)
        nu, lam, maskf = zpad(nu), zpad(lam), zpad(maskf)
    blk = functools.partial(_to_blocked, r_blk=r_blk)
    nu, lam, maskf = blk(nu), blk(lam), blk(maskf)

    cspec = lambda d1, d2: pl.BlockSpec((1, d1, d2, 1, 1),
                                        lambda bi, i: (bi, 0, 0, 0, 0),
                                        memory_space=pltpu.VMEM)
    idx = lambda bi, i: (bi, 0, 0, 0, i)
    spec = lambda d1, d2: pl.BlockSpec((1, d1, d2, r_blk, lanes), idx,
                                       memory_space=pltpu.VMEM)
    nb_tot = num_chunks * lanes
    out = pl.pallas_call(
        functools.partial(_uniform_pipeline_kernel, r_blk=r_blk,
                          lanes=lanes),
        grid=(bdim, num_chunks),
        in_specs=[cspec(d, d), cspec(d, 1), cspec(d, d), cspec(d, 1),
                  cspec(d, d), cspec(o, d),
                  spec(o, 1), spec(o, o), spec(1, 1)],
        out_specs=(spec(d, 1), spec(d, d),
                   pl.BlockSpec((1, 1), lambda bi, i: (bi, 0),
                                memory_space=pltpu.SMEM)),
        out_shape=(
            jax.ShapeDtypeStruct((bdim, d, 1, r_blk, nb_tot), nu.dtype),
            jax.ShapeDtypeStruct((bdim, d, d, r_blk, nb_tot), nu.dtype),
            jax.ShapeDtypeStruct((bdim, 1), nu.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((d, d, 1), nu.dtype),
            pltpu.VMEM((d, 1, 1), nu.dtype),
            pltpu.VMEM((d, d, 1), nu.dtype),
            pltpu.VMEM((d, d, 1), nu.dtype),
            pltpu.VMEM((d, 1, 1), nu.dtype),
        ],
        interpret=interpret,
    )(fc, ccst, qc, m0, p0, hc, nu, lam, maskf)
    m_f, p_f = _from_blocked(out[0]), _from_blocked(out[1])
    return (m_f[..., :n].reshape(lead + (d, 1, n)),
            p_f[..., :n].reshape(lead + (d, d, n)),
            out[2][:, 0].reshape(lead))


def _uniform_adjoint_kernel(fc_ref, cc_ref, qc_ref, m0_ref, p0_ref, h_ref,
                            nu_ref, lam_ref, mk_ref, mp_ref, pp_ref, gs_ref,
                            gnu_ref, glam_ref,
                            gf_ref, gc_ref, gq_ref, gm0_ref, gp0_ref, gh_ref,
                            carry_e, carry_g, carry_l,
                            *, r_blk, lanes, pad):
    """Fused Koopman backward for the uniform grid: constant raw inputs are
    broadcast in VMEM, per-step (nu, lam) gradients are written out, and the
    constant-input gradients are accumulated as SUMS (the broadcast VJP) in
    VMEM-resident output blocks — no d^2-sized gradient array in HBM.

    Front padding (reverse grid): pad slots have lam = mask = 0, which makes
    their scan elements benign; their (g_f, g_c, g_q) values are garbage and
    are excluded from the sums via the global-index mask."""
    d = fc_ref.shape[1]
    dtype = fc_ref.dtype
    i = pl.program_id(1)
    nprog = pl.num_programs(1)

    @pl.when(i == 0)
    def _init():
        ident = _smoother_identity(d, 1, 1, dtype)
        carry_e[...] = ident[0]
        carry_g[...] = ident[1]
        carry_l[...] = ident[2]
        gf_ref[...] = jnp.zeros(gf_ref.shape, dtype)
        gc_ref[...] = jnp.zeros(gc_ref.shape, dtype)
        gq_ref[...] = jnp.zeros(gq_ref.shape, dtype)
        gm0_ref[...] = jnp.zeros(gm0_ref.shape, dtype)
        gp0_ref[...] = jnp.zeros(gp0_ref.shape, dtype)
        gh_ref[...] = jnp.zeros(gh_ref.shape, dtype)

    c4 = lambda ref: ref[0]
    fc, ccst, qc = c4(fc_ref), c4(cc_ref), c4(qc_ref)
    m0, p0, hb = c4(m0_ref), c4(p0_ref), c4(h_ref)
    nub, lamb, mkb = nu_ref[0], lam_ref[0], mk_ref[0]
    mpb, ppb = mp_ref[0], pp_ref[0]

    # reverse grid: at step i the loaded block is chunk (nprog - 1 - i)
    chunk_idx = nprog - 1 - i
    rl = (jax.lax.broadcasted_iota(jnp.int32, (1, 1, r_blk, lanes), 3)
          * r_blk
          + jax.lax.broadcasted_iota(jnp.int32, (1, 1, r_blk, lanes), 2))
    g = chunk_idx * (r_blk * lanes) + rl              # global padded index
    ntot = nprog * r_blk * lanes
    first = g == pad                                  # global element 0
    last = g == ntot - 1                              # global last element
    zero = jnp.zeros((), dtype)
    f_in = jnp.where(first, zero, fc)
    c_in = jnp.where(first, m0, ccst)
    q_in = jnp.where(first, p0, qc)
    fn_in = jnp.where(last, zero, fc)                 # F_{k+1}

    a_blk, pp_blk, l_blk, g_blk, v_blk = _adjoint_elem_slice(
        f_in, c_in, q_in, hb, nub, lamb, fn_in, mpb, ppb)
    lt_blk = _t(l_blk)

    def elem(r):
        return (lt_blk[:, :, r, :], g_blk[:, :, r, :], v_blk[:, :, r, :])

    suf = [elem(r_blk - 1)]
    for r in range(r_blk - 2, -1, -1):
        suf.append(_combine_smoother(suf[-1], elem(r)))
    suf = suf[::-1]
    ident = _smoother_identity(d, 1, lanes, dtype)
    lane = jax.lax.broadcasted_iota(jnp.int32, (d, d, lanes), dimension=2)
    lane_b = jax.lax.broadcasted_iota(jnp.int32, (d, 1, lanes), dimension=2)
    masks = (lane, lane_b, lane)
    tot = suf[0]
    k = 1
    while k < lanes:
        shifted = tuple(_roll(t, lanes - k, 2) for t in tot)
        shifted = tuple(jnp.where(m >= lanes - k, idl, s)
                        for m, idl, s in zip(masks, ident, shifted))
        tot = _combine_smoother(shifted, tot)
        k *= 2
    excl = tuple(_roll(t, lanes - 1, 2) for t in tot)
    excl = tuple(jnp.where(m >= lanes - 1, idl, s)
                 for m, idl, s in zip(masks, ident, excl))
    carry = (carry_e[...], carry_g[...], carry_l[...])
    carry_bcast = tuple(jnp.broadcast_to(cc, x.shape)
                        for cc, x in zip(carry, excl))
    exc = _combine_smoother(carry_bcast, excl)

    gs = gs_ref[0, 0]
    suf_blk = tuple(jnp.stack([s[j] for s in suf], axis=2) for j in range(3))
    exc_b = tuple(x[:, :, None, :] for x in exc)
    out_blk = _combine_smoother(exc_b, suf_blk)
    r_stack, ndk_stack = out_blk[1], out_blk[2]
    g_f, g_c, g_q, g_h, g_nu, g_lam = _adjoint_grads_slice(
        f_in, hb, nub, lamb, mkb, mpb, ppb, a_blk, pp_blk,
        r_stack, ndk_stack)
    gnu_ref[0] = gs * g_nu
    glam_ref[0] = gs * g_lam
    # constant-input gradients: broadcast VJP = sum over real steps.
    # Mosaic cannot lower a (d, d, R, L) -> (d, d) multi_reduction (the
    # leading dims would have to move into the tiled pair); keepdims
    # reductions one axis at a time lower fine and the ref slot keeps its
    # (d, d, 1, 1) block shape.
    valid = g >= pad
    sel = valid & jnp.logical_not(first)
    ssum = lambda x, m: gs * jnp.sum(
        jnp.sum(jnp.where(m, x, zero), axis=3, keepdims=True),
        axis=2, keepdims=True)
    gf_ref[0] += ssum(g_f, sel)
    gc_ref[0] += ssum(g_c, sel)
    gq_ref[0] += ssum(g_q, sel)
    gm0_ref[0] += ssum(g_c, first)
    gp0_ref[0] += ssum(g_q, first)
    gh_ref[0] += ssum(g_h, valid)

    exc_first = tuple(x[..., :1] for x in exc)
    suf_first = tuple(x[..., :1] for x in suf[0])
    new_carry = _combine_smoother(exc_first, suf_first)
    carry_e[...] = new_carry[0]
    carry_g[...] = new_carry[1]
    carry_l[...] = new_carry[2]


def pallas_adjoint_pipeline_uniform(Fc, cc, Qc, mu0, P0, Hc, nu, lam, maskf,
                                    m_f, p_f, gscale, *,
                                    chunk: int = None,
                                    r_blk: int = None,
                                    interpret: bool = False):
    """Fused Koopman backward for the uniform grid.  Returns
    (gFc, gcc, gQc, gmu0, gP0, gHc, gnu, glam) where the constant-input
    gradients are the broadcast-VJP sums over their real steps (k >= 1 for
    F/c/Q; all k for H) and the element-0 slots of (c, Q) land in
    (gmu0, gP0); (gnu, glam) are per-step."""
    lead = nu.shape[:-3]
    n = nu.shape[-1]
    d = Fc.shape[-3]
    o = lam.shape[-3]
    if maskf is None:
        maskf = jnp.ones(lead + (1, 1, n), nu.dtype)
    zfirst = lambda x: jnp.concatenate(
        [jnp.zeros_like(x[..., :1]), x[..., :-1]], axis=-1)
    m_prev = zfirst(m_f)
    p_prev = zfirst(p_f)
    bc = lambda x, d1, d2: jnp.broadcast_to(
        x, lead + (d1, d2, 1)).reshape((-1, d1, d2, 1, 1))
    fc = bc(Fc, d, d)
    ccst = bc(cc, d, 1)
    qc = bc(Qc, d, d)
    m0 = bc(mu0, d, 1)
    p0 = bc(P0, d, d)
    hc = bc(Hc, o, d)
    flat = lambda x: x.reshape((-1,) + x.shape[-3:])
    arrs = [flat(x) for x in (nu, lam, maskf, m_prev, p_prev)]
    bdim = arrs[0].shape[0]
    gsarr = jnp.broadcast_to(gscale, lead).reshape(bdim, 1).astype(nu.dtype)
    chunk, r_blk, lanes = _resolve_chunk(d, chunk, r_blk)
    num_chunks = -(-n // chunk)
    pad = num_chunks * chunk - n
    if pad:
        fpad = lambda x: jnp.concatenate(
            [jnp.zeros(x.shape[:-1] + (pad,), x.dtype), x], axis=-1)
        arrs = [fpad(x) for x in arrs]
    blk = functools.partial(_to_blocked, r_blk=r_blk)
    arrs = [blk(x) for x in arrs]

    cspec = lambda d1, d2: pl.BlockSpec((1, d1, d2, 1, 1),
                                        lambda bi, i: (bi, 0, 0, 0, 0),
                                        memory_space=pltpu.VMEM)
    rev = lambda bi, i: (bi, 0, 0, 0, pl.num_programs(1) - 1 - i)
    spec = lambda d1, d2: pl.BlockSpec((1, d1, d2, r_blk, lanes), rev,
                                       memory_space=pltpu.VMEM)
    nb_tot = num_chunks * lanes
    shp = lambda d1, d2: jax.ShapeDtypeStruct(
        (bdim, d1, d2, r_blk, nb_tot), nu.dtype)
    cshp = lambda d1, d2: jax.ShapeDtypeStruct((bdim, d1, d2, 1, 1),
                                               nu.dtype)
    out = pl.pallas_call(
        functools.partial(_uniform_adjoint_kernel, r_blk=r_blk, lanes=lanes,
                          pad=pad),
        grid=(bdim, num_chunks),
        in_specs=[cspec(d, d), cspec(d, 1), cspec(d, d), cspec(d, 1),
                  cspec(d, d), cspec(o, d),
                  spec(o, 1), spec(o, o), spec(1, 1), spec(d, 1),
                  spec(d, d),
                  pl.BlockSpec((1, 1), lambda bi, i: (bi, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=(spec(o, 1), spec(o, o),
                   cspec(d, d), cspec(d, 1), cspec(d, d), cspec(d, 1),
                   cspec(d, d), cspec(o, d)),
        out_shape=(shp(o, 1), shp(o, o),
                   cshp(d, d), cshp(d, 1), cshp(d, d), cshp(d, 1),
                   cshp(d, d), cshp(o, d)),
        scratch_shapes=[
            pltpu.VMEM((d, d, 1), nu.dtype),
            pltpu.VMEM((d, 1, 1), nu.dtype),
            pltpu.VMEM((d, d, 1), nu.dtype),
        ],
        interpret=interpret,
    )(fc, ccst, qc, m0, p0, hc, *arrs, gsarr)
    unblk = lambda x, d1, d2: _from_blocked(x)[..., pad:].reshape(
        lead + (d1, d2, n))
    unc = lambda x, d1, d2: x.reshape(lead + (d1, d2, 1))
    return (unc(out[2], d, d), unc(out[3], d, 1), unc(out[4], d, d),
            unc(out[5], d, 1), unc(out[6], d, d), unc(out[7], o, d),
            unblk(out[0], o, 1), unblk(out[1], o, o))


def pallas_smoother_scan(elems, *, chunk: int = None,
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
    chunk, r_blk, lanes = _resolve_chunk(d, chunk, r_blk)
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


def _uniform_smoother_kernel(fc_ref, cc_ref, qc_ref, mf_ref, pf_ref,
                             ms_ref, ps_ref,
                             carry_e, carry_g, carry_l, *, r_blk, lanes):
    """Fused reverse smoother with constant (F, c, Q): the RTS element
    (E = gain, g, L) is built in-kernel from the filtered moments, so the
    only HBM streams are (m_f, p_f) in and (m_s, P_s) out — the measured
    element-construction "glue" (roofline: 132 B/step with glue vs 64
    kernel-only) never touches HBM.  The LAST global slot substitutes the
    boundary element (0, m_f[-1], p_f[-1]); front padding is zeros, whose
    constructed element (E = 0 Fᵀ (Q)⁻¹ = 0, g = 0, L = 0) annihilates the
    (discarded) padded prefix without extra masking."""
    d = fc_ref.shape[1]
    dtype = fc_ref.dtype
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        ident = _smoother_identity(d, 1, 1, dtype)
        carry_e[...] = ident[0]
        carry_g[...] = ident[1]
        carry_l[...] = ident[2]

    fc, ccst, qc = fc_ref[0], cc_ref[0], qc_ref[0]  # [d, d/1, 1, 1]
    mkb, pkb = mf_ref[0], pf_ref[0]                 # [d, 1/d, R, L]

    # RTS element construction, vectorized over the full [.., R, L] block
    p_pred = _sym(_mm(fc, _mm(pkb, _t(fc))) + qc)
    gains = _mm(_mm(pkb, _t(fc)), _inv(p_pred))
    g = mkb - _mm(gains, _mm(fc, mkb) + ccst)
    ell = _sym(pkb - _mm(gains, _mm(fc, pkb)))

    # boundary: the final global slot (reverse grid => i == 0 reads the
    # last chunk) carries (0, m_f[-1], p_f[-1])
    rl = (jax.lax.broadcasted_iota(jnp.int32, (1, 1, r_blk, lanes), 3)
          * r_blk
          + jax.lax.broadcasted_iota(jnp.int32, (1, 1, r_blk, lanes), 2))
    last = (i == 0) & (rl == r_blk * lanes - 1)
    zero = jnp.zeros((), dtype)
    e_blk = jnp.where(last, zero, gains)
    g_blk = jnp.where(last, mkb, g)
    l_blk = jnp.where(last, pkb, ell)

    def elem(r):
        return (e_blk[:, :, r, :], g_blk[:, :, r, :], l_blk[:, :, r, :])

    # 1. within-block sequential suffixes (r_blk-1 ... 0)
    suf = [elem(r_blk - 1)]
    for r in range(r_blk - 2, -1, -1):
        suf.append(_combine_smoother(suf[-1], elem(r)))
    suf = suf[::-1]

    # 2. Hillis-Steele suffix scan over the lane block totals
    db = 1
    ident = _smoother_identity(d, db, lanes, dtype)
    lane = jax.lax.broadcasted_iota(jnp.int32, (d, d, lanes), dimension=2)
    lane_b = jax.lax.broadcasted_iota(jnp.int32, (d, db, lanes), dimension=2)
    masks = (lane, lane_b, lane)
    tot = suf[0]
    k = 1
    while k < lanes:
        shifted = tuple(_roll(t, lanes - k, 2) for t in tot)
        shifted = tuple(jnp.where(m >= lanes - k, idl, s)
                        for m, idl, s in zip(masks, ident, shifted))
        tot = _combine_smoother(shifted, tot)
        k *= 2
    excl = tuple(_roll(t, lanes - 1, 2) for t in tot)
    excl = tuple(jnp.where(m >= lanes - 1, idl, s)
                 for m, idl, s in zip(masks, ident, excl))
    carry = (carry_e[...], carry_g[...], carry_l[...])
    carry_bcast = tuple(jnp.broadcast_to(cc, x.shape)
                        for cc, x in zip(carry, excl))
    exc = _combine_smoother(carry_bcast, excl)

    # 3. fold the exclusive suffix into all within-block suffixes at once
    suf_blk = tuple(jnp.stack([s[j] for s in suf], axis=2) for j in range(3))
    exc_b = tuple(x[:, :, None, :] for x in exc)
    out_blk = _combine_smoother(exc_b, suf_blk)
    ms_ref[0] = out_blk[1]
    ps_ref[0] = out_blk[2]

    # 4. new carry: the full suffix at the first element of the chunk
    exc_first = tuple(x[..., :1] for x in exc)
    suf_first = tuple(x[..., :1] for x in suf[0])
    new_carry = _combine_smoother(exc_first, suf_first)
    carry_e[...] = new_carry[0]
    carry_g[...] = new_carry[1]
    carry_l[...] = new_carry[2]


def pallas_smoother_pipeline_uniform(Fc, cc, Qc, m_f, p_f, *,
                                     chunk: int = None, r_blk: int = None,
                                     interpret: bool = False):
    """Fused RTS smoother for a uniform grid: constant prior steps
    (Fc [..., d, d, 1], cc [..., d, 1, 1], Qc [..., d, d, 1]) plus the
    filtered moments (m_f [..., d, 1, N], p_f [..., d, d, N]).  Returns
    (m_s, P_s) exactly as :func:`markovflow_tpu.ops.kalman.
    smoother_pipeline_tl` — but with element construction inside the
    kernel, so per-step HBM traffic is 48 B (d = 2) instead of 132."""
    lead = m_f.shape[:-3]
    n = m_f.shape[-1]
    d = Fc.shape[-3]
    bc = lambda x, d1, d2: jnp.broadcast_to(
        x, lead + (d1, d2, 1)).reshape((-1, d1, d2, 1, 1))
    fc = bc(Fc, d, d)
    ccst = bc(cc, d, 1)
    qc = bc(Qc, d, d)
    flat = lambda x: x.reshape((-1,) + x.shape[-3:])
    m_f, p_f = flat(m_f), flat(p_f)
    bdim = m_f.shape[0]
    chunk, r_blk, lanes = _resolve_chunk(d, chunk, r_blk)
    num_chunks = -(-n // chunk)
    pad = num_chunks * chunk - n
    if pad:
        # FRONT padding (reverse scan); zeros construct an annihilating
        # (0, 0, 0) element — see the kernel docstring
        zcat = lambda x: jnp.concatenate(
            [jnp.zeros(x.shape[:-1] + (pad,), x.dtype), x], axis=-1)
        m_f, p_f = zcat(m_f), zcat(p_f)
    blk = functools.partial(_to_blocked, r_blk=r_blk)
    m_f, p_f = blk(m_f), blk(p_f)

    cspec = lambda d1, d2: pl.BlockSpec((1, d1, d2, 1, 1),
                                        lambda bi, i: (bi, 0, 0, 0, 0),
                                        memory_space=pltpu.VMEM)
    rev = lambda bi, i: (bi, 0, 0, 0, pl.num_programs(1) - 1 - i)
    spec = lambda d1, d2: pl.BlockSpec((1, d1, d2, r_blk, lanes), rev,
                                       memory_space=pltpu.VMEM)
    nb_tot = num_chunks * lanes
    out = pl.pallas_call(
        functools.partial(_uniform_smoother_kernel, r_blk=r_blk,
                          lanes=lanes),
        grid=(bdim, num_chunks),
        in_specs=[cspec(d, d), cspec(d, 1), cspec(d, d),
                  spec(d, 1), spec(d, d)],
        out_specs=(spec(d, 1), spec(d, d)),
        out_shape=(
            jax.ShapeDtypeStruct((bdim, d, 1, r_blk, nb_tot), m_f.dtype),
            jax.ShapeDtypeStruct((bdim, d, d, r_blk, nb_tot), m_f.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((d, d, 1), m_f.dtype),
            pltpu.VMEM((d, 1, 1), m_f.dtype),
            pltpu.VMEM((d, d, 1), m_f.dtype),
        ],
        interpret=interpret,
    )(fc, ccst, qc, m_f, p_f)
    m_s, p_s = _from_blocked(out[0]), _from_blocked(out[1])
    return (m_s[..., pad:].reshape(lead + (d, 1, n)),
            p_s[..., pad:].reshape(lead + (d, d, n)))
