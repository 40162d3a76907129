"""Pallas TPU kernel: fused parallel Kalman filter scan.

The TPU-native analogue of the reference's C++ ``banded_matrices`` hot ops
(reference: markovflow/block_tri_diag.py:22-31): the block-tridiagonal
Cholesky/solve pipeline collapses, in scan form, to a prefix composition of
filtering elements.  XLA's associative_scan executes O(log C) HBM round
trips per chunk; this kernel keeps each chunk resident in VMEM, runs the
in-chunk Hillis-Steele scan entirely on the VPU, and threads the cross-chunk
carry through VMEM scratch across sequential grid steps — one HBM read and
one write per element.

Forward (inference/serving) path only; training uses the autodiff-friendly
XLA scan in :mod:`markovflow_tpu.ops.scans`.

Accuracy note: the in-chunk Hillis-Steele scan performs O(C log C) combines
(vs O(C) for the XLA Blelloch scan), so float32 roundoff accumulates faster;
exact in float64 (interpret-mode parity tests), but at T ~ 1e6 in float32 the
XLA engine is preferred (and measured equally fast end-to-end).  A
work-efficient in-kernel Blelloch variant is the planned fix.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pallas_filter_scan", "pallas_smoother_scan", "PALLAS_CHUNK"]

PALLAS_CHUNK = 2048


def _mm(a, b):
    """[d1, d2, C] @ [d2, d3, C] with the matmul unrolled to elementwise
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
    raise NotImplementedError("pallas filter scan supports d <= 3")


def _combine(x, y):
    """x (earlier) (x) y (later) — filtering composition, [d, *, C] leaves."""
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


def _identity_elem(d, db, chunk, dtype):
    eye = jnp.broadcast_to(jnp.eye(d, dtype=dtype)[..., None], (d, d, chunk))
    zb = jnp.zeros((d, db, chunk), dtype)
    zm = jnp.zeros((d, d, chunk), dtype)
    return (eye, zb, zm, zm, zb)


def _kernel(a_ref, b_ref, c_ref, j_ref, e_ref, mb_ref, pc_ref,
            carry_a, carry_b, carry_c, carry_j, carry_e, *, chunk):
    d = a_ref.shape[0]
    db = b_ref.shape[1]
    dtype = a_ref.dtype
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        ident = _identity_elem(d, db, 1, dtype)
        carry_a[...] = ident[0]
        carry_b[...] = ident[1]
        carry_c[...] = ident[2]
        carry_j[...] = ident[3]
        carry_e[...] = ident[4]

    run = (a_ref[...], b_ref[...], c_ref[...], j_ref[...], e_ref[...])
    ident = _identity_elem(d, db, chunk, dtype)
    lane = jax.lax.broadcasted_iota(jnp.int32, (d, d, chunk), dimension=2)
    lane_b = jax.lax.broadcasted_iota(jnp.int32, (d, db, chunk), dimension=2)

    # Hillis-Steele inclusive scan within the chunk (lanes axis)
    k = 1
    while k < chunk:
        shifted = tuple(pltpu.roll(r, k, 2) for r in run)
        masks = (lane < k, lane_b < k, lane < k, lane < k, lane_b < k)
        shifted = tuple(jnp.where(m, idl, s)
                        for m, idl, s in zip(masks, ident, shifted))
        run = _combine(shifted, run)
        k *= 2

    carry = (carry_a[...], carry_b[...], carry_c[...], carry_j[...],
             carry_e[...])
    carry_bcast = tuple(jnp.broadcast_to(cc, r.shape)
                        for cc, r in zip(carry, run))
    out = _combine(carry_bcast, run)
    mb_ref[...] = out[1]
    pc_ref[...] = out[2]
    carry_a[...] = out[0][..., -1:]
    carry_b[...] = out[1][..., -1:]
    carry_c[...] = out[2][..., -1:]
    carry_j[...] = out[3][..., -1:]
    carry_e[...] = out[4][..., -1:]


def _combine_smoother(later, earlier):
    """Smoothing composition (reverse scan): result = earlier (x) later."""
    le, lg, ll = later
    ee, eg, el = earlier
    e = _mm(ee, le)
    g = _mm(ee, lg) + eg
    ell = _mm(ee, _mm(ll, _t(ee))) + el
    return e, g, ell


def _smoother_identity(d, db, chunk, dtype):
    eye = jnp.broadcast_to(jnp.eye(d, dtype=dtype)[..., None], (d, d, chunk))
    return (eye, jnp.zeros((d, db, chunk), dtype),
            jnp.zeros((d, d, chunk), dtype))


def _smoother_kernel(e_ref, g_ref, l_ref, mg_ref, pl_ref,
                     carry_e, carry_g, carry_l, *, chunk):
    d = e_ref.shape[0]
    db = g_ref.shape[1]
    dtype = e_ref.dtype
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        ident = _smoother_identity(d, db, 1, dtype)
        carry_e[...] = ident[0]
        carry_g[...] = ident[1]
        carry_l[...] = ident[2]

    run = (e_ref[...], g_ref[...], l_ref[...])
    ident = _smoother_identity(d, db, chunk, dtype)
    lane = jax.lax.broadcasted_iota(jnp.int32, (d, d, chunk), dimension=2)
    lane_b = jax.lax.broadcasted_iota(jnp.int32, (d, db, chunk), dimension=2)

    # reverse Hillis-Steele: suffix scan within the chunk
    # (roll left by k == circular roll right by chunk - k; pltpu.roll
    # requires non-negative shifts)
    k = 1
    while k < chunk:
        shifted = tuple(pltpu.roll(r, chunk - k, 2) for r in run)
        masks = (lane >= chunk - k, lane_b >= chunk - k, lane >= chunk - k)
        shifted = tuple(jnp.where(m, idl, s)
                        for m, idl, s in zip(masks, ident, shifted))
        run = _combine_smoother(shifted, run)
        k *= 2

    carry = (carry_e[...], carry_g[...], carry_l[...])
    carry_b = tuple(jnp.broadcast_to(cc, r.shape)
                    for cc, r in zip(carry, run))
    out = _combine_smoother(carry_b, run)
    mg_ref[...] = out[1]
    pl_ref[...] = out[2]
    carry_e[...] = out[0][..., :1]
    carry_g[...] = out[1][..., :1]
    carry_l[...] = out[2][..., :1]


def pallas_smoother_scan(elems, *, chunk: int = PALLAS_CHUNK,
                         interpret: bool = False):
    """Reverse (suffix) smoothing scan: elems = (E [d,d,N], g [d,1,N],
    L [d,d,N]) in TL layout, unbatched.  Returns (m_s [d,1,N], P_s [d,d,N]).

    Grid runs back-to-front; the carry holds the suffix combination of all
    later chunks.
    """
    e, g, l = elems
    d = e.shape[0]
    db = g.shape[1]
    n = e.shape[-1]
    num_chunks = -(-n // chunk)
    pad = num_chunks * chunk - n
    if pad:
        ident = _smoother_identity(d, db, pad, e.dtype)
        # pad at the FRONT for a reverse scan
        e = jnp.concatenate([ident[0], e], axis=-1)
        g = jnp.concatenate([ident[1], g], axis=-1)
        l = jnp.concatenate([ident[2], l], axis=-1)

    mat_spec = pl.BlockSpec((d, d, chunk),
                            lambda i: (0, 0, pl.num_programs(0) - 1 - i),
                            memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((d, db, chunk),
                            lambda i: (0, 0, pl.num_programs(0) - 1 - i),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_smoother_kernel, chunk=chunk),
        grid=(num_chunks,),
        in_specs=[mat_spec, vec_spec, mat_spec],
        out_specs=(vec_spec, mat_spec),
        out_shape=(
            jax.ShapeDtypeStruct((d, db, num_chunks * chunk), e.dtype),
            jax.ShapeDtypeStruct((d, d, num_chunks * chunk), e.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((d, d, 1), e.dtype),
            pltpu.VMEM((d, db, 1), e.dtype),
            pltpu.VMEM((d, d, 1), e.dtype),
        ],
        interpret=interpret,
    )(e, g, l)
    m_s, p_s = out
    return m_s[..., pad:], p_s[..., pad:]


def pallas_filter_scan(elems, *, chunk: int = PALLAS_CHUNK,
                       interpret: bool = False):
    """Filtered means/covs from TL-layout FilterElements.

    elems: (A [d,d,N], b [d,1,N], C [d,d,N], J [d,d,N], eta [d,1,N])
    (unbatched).  Returns (m_f [d,1,N], P_f [d,d,N]).
    """
    a, b, c, j, e = elems
    d = a.shape[0]
    db = b.shape[1]
    n = a.shape[-1]
    num_chunks = -(-n // chunk)
    pad = num_chunks * chunk - n
    if pad:
        ident = _identity_elem(d, db, pad, a.dtype)
        a = jnp.concatenate([a, ident[0]], axis=-1)
        b = jnp.concatenate([b, ident[1]], axis=-1)
        c = jnp.concatenate([c, ident[2]], axis=-1)
        j = jnp.concatenate([j, ident[3]], axis=-1)
        e = jnp.concatenate([e, ident[4]], axis=-1)

    mat_spec = pl.BlockSpec((d, d, chunk), lambda i: (0, 0, i),
                            memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((d, db, chunk), lambda i: (0, 0, i),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, chunk=chunk),
        grid=(num_chunks,),
        in_specs=[mat_spec, vec_spec, mat_spec, mat_spec, vec_spec],
        out_specs=(vec_spec, mat_spec),
        out_shape=(
            jax.ShapeDtypeStruct((d, db, num_chunks * chunk), a.dtype),
            jax.ShapeDtypeStruct((d, d, num_chunks * chunk), a.dtype),
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
    m_f, p_f = out
    return m_f[..., :n], p_f[..., :n]
