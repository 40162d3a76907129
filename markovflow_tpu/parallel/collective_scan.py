"""Explicit-collective sequence-parallel Kalman scans over a device mesh.

XLA SPMD already partitions the chunked associative scans over a
sequence-sharded time axis (tests/parallel/test_sharding.py), but it is free
to insert collectives at every scan level.  This module implements the
communication-optimal pattern explicitly with ``shard_map``:

1. each device runs the LOCAL chunked scan on its time shard;
2. the per-device totals (one Gaussian-message element each) are
   ``all_gather``-ed along the sequence axis — P tiny [d, d] / [d, 1]
   tensors, ONE collective per scan;
3. each device folds the exclusive prefix (suffix, for reverse scans) of
   the other devices' totals into its local results — O(P) tiny combines,
   replicated compute, no further communication.

The cross-shard boundary terms of the *pipelines* (predicted moments need
``m_f[k-1]``; smoother elements need ``F[k+1]``) travel by one
``ppermute`` each.  Device 0's zero fill is harmless for the filter because
element 0 encodes the prior with ``F_0 = 0`` (the boundary term is
multiplied away); the last smoother element is overwritten explicitly.

This is the TPU-native replacement for a distributed runtime the reference
does not have (SURVEY.md section 2.7): sequence scaling rides ICI
collectives, with communication O(P * d^2) per scan independent of T.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import kalman as K
from ..ops.scans import scan_tl

__all__ = [
    "sharded_scan_tl",
    "sharded_filter_pipeline_tl",
    "sharded_smoother_pipeline_tl",
    "sharded_log_likelihood_koopman",
]


def _where_tree(cond, a, b):
    return tuple(jnp.where(cond, x, y) for x, y in zip(a, b))


def sharded_scan_tl(combine, identity_like, elems, axis_name: str,
                    reverse: bool = False):
    """Sequence-sharded prefix/suffix scan over the trailing (time) axis.

    Must run inside ``shard_map`` with ``elems`` holding the local time
    shard.  ``combine`` takes the accumulated side first (as in
    :func:`markovflow_tpu.ops.scans.scan_tl`).
    """
    local = scan_tl(combine, identity_like, elems, reverse=reverse)
    edge = (lambda x: x[..., :1]) if reverse else (lambda x: x[..., -1:])
    total = tuple(edge(x) for x in local)
    # ONE collective: gather every device's total (tiny [d, d, 1] leaves).
    gathered = tuple(jax.lax.all_gather(t, axis_name) for t in total)
    idx = jax.lax.axis_index(axis_name)
    num = gathered[0].shape[0]
    carry = identity_like(elems)
    if reverse:
        for p in range(num - 1, -1, -1):
            tp = tuple(g[p] for g in gathered)
            carry = _where_tree(p > idx, combine(carry, tp), carry)
    else:
        for p in range(num):
            tp = tuple(g[p] for g in gathered)
            carry = _where_tree(p < idx, combine(carry, tp), carry)
    carry_b = tuple(jnp.broadcast_to(cc, x.shape)
                    for cc, x in zip(carry, local))
    return combine(carry_b, local)


def _shift_from_prev(x, axis_name):
    """[..., N_local] -> value shifted right by one across the global time
    axis: element 0 receives the previous device's last element (zeros on
    device 0)."""
    num = jax.lax.psum(1, axis_name)
    recv = jax.lax.ppermute(x[..., -1:], axis_name,
                            [(i, i + 1) for i in range(num - 1)])
    return jnp.concatenate([recv, x[..., :-1]], axis=-1)


def _shift_from_next(x, axis_name):
    """Element N_local-1 receives the next device's first element (zeros on
    the last device)."""
    num = jax.lax.psum(1, axis_name)
    recv = jax.lax.ppermute(x[..., :1], axis_name,
                            [(i + 1, i) for i in range(num - 1)])
    return jnp.concatenate([x[..., 1:], recv], axis=-1)


def _filter_body(F, c, Q, H, nu, lam, maskf, axis_name):
    mask = None if maskf is None else maskf > 0.5
    elems = K.make_filter_elements_tl(F, c, Q, H, nu, lam)
    res = sharded_scan_tl(K._combine_filter_tl, K._filter_identity_like,
                          elems, axis_name)
    m_f, p_f = res[1], res[2]
    # predicted moments: boundary m/P from the previous shard; global
    # element 0 has F_0 = 0, so device 0's zero fill drops out and
    # m_pred_0 = c_0, P_pred_0 = Q_0 — uniform math across shards.
    m_prev = _shift_from_prev(m_f, axis_name)
    p_prev = _shift_from_prev(p_f, axis_name)
    m_pred = K._mm_tl(F, m_prev) + c
    p_pred = K._sym_tl(K._mm_tl(F, K._mm_tl(p_prev, K._t_tl(F))) + Q)
    o = lam.shape[-3]
    hm = K._mm_tl(H, m_pred)
    hpht = K._mm_tl(H, K._mm_tl(p_pred, K._t_tl(H)))
    w = nu - K._mm_tl(lam, hm)
    m_mat = lam + K._mm_tl(lam, K._mm_tl(hpht, lam))
    eye_o = K._eye_tl(o, F.dtype)
    if mask is not None:
        keep = mask[..., None, None, :]
        m_mat = jnp.where(keep, m_mat, eye_o)
        lam_safe = jnp.where(keep, lam, eye_o)
    else:
        lam_safe = lam
    sol = K._mm_tl(K._inv_tl(m_mat), w)
    quad = jnp.sum(w * sol, axis=(-3, -2))
    log_det_s = jnp.log(jnp.abs(K._det_tl(eye_o + K._mm_tl(hpht, lam_safe)))) \
        - jnp.log(jnp.abs(K._det_tl(lam_safe)))
    ll = -0.5 * (quad + log_det_s
                 + o * jnp.log(jnp.asarray(2.0 * jnp.pi, F.dtype)))
    if mask is not None:
        ll = jnp.where(mask, ll, 0.0)
    ll = jax.lax.psum(jnp.sum(ll, axis=-1), axis_name)
    return m_f, p_f, ll


def _smoother_body(F, c, Q, m_f, p_f, axis_name):
    # element k needs (F, c, Q)[k+1]: fetch the next shard's first entries.
    fn = _shift_from_next(F, axis_name)
    cn = _shift_from_next(c, axis_name)
    qn = _shift_from_next(Q, axis_name)
    # On the last shard the shifted boundary entries are zero-filled, making
    # p_pred singular there; the forward pass discards those lanes via
    # jnp.where below, but inf/NaN from _inv_tl would still poison reverse-
    # mode cotangents (NaN * 0).  Pad the boundary qn with identity so
    # p_pred stays invertible on the discarded lanes.
    num0 = jax.lax.psum(1, axis_name)
    on_last = jax.lax.axis_index(axis_name) == num0 - 1
    at_end = jnp.arange(F.shape[-1]) == F.shape[-1] - 1
    qn = jnp.where(on_last & at_end, qn + K._eye_tl(F.shape[-3], F.dtype), qn)
    p_pred = K._sym_tl(K._mm_tl(fn, K._mm_tl(p_f, K._t_tl(fn))) + qn)
    pft = K._mm_tl(p_f, K._t_tl(fn))
    gains = K._t_tl(K._mm_tl(K._inv_tl(p_pred), K._t_tl(pft)))
    g = m_f - K._mm_tl(gains, K._mm_tl(fn, m_f) + cn)
    ell = K._sym_tl(p_f - K._mm_tl(gains, K._mm_tl(fn, p_f)))
    # the LAST global element is (0, m_f, p_f): overwrite on the last shard
    num = jax.lax.psum(1, axis_name)
    is_last = jax.lax.axis_index(axis_name) == num - 1
    lastcol = jnp.arange(F.shape[-1]) == F.shape[-1] - 1
    sel = is_last & lastcol
    e_all = jnp.where(sel, jnp.zeros_like(gains), gains)
    g_all = jnp.where(sel, m_f, g)
    l_all = jnp.where(sel, p_f, ell)
    res = sharded_scan_tl(K._combine_smoother_tl, K._smoother_identity_like,
                          (e_all, g_all, l_all), axis_name, reverse=True)
    return res[1], res[2], e_all


def _time_spec(x, axis: str):
    return P(*([None] * (x.ndim - 1) + [axis]))


def sharded_filter_pipeline_tl(F, c, Q, H, nu, lam, mask=None, *,
                               mesh: Mesh, axis: str = "sp"):
    """:func:`markovflow_tpu.ops.kalman.filter_pipeline_tl` with explicit
    collectives, for TL inputs sharded over the time (last) axis on the
    ``axis`` mesh dimension.  Returns (m_f, p_f, loglik) with the moments
    sharded like the inputs and the log likelihood replicated.
    """
    n = F.shape[-1]
    maskf = None if mask is None else jnp.broadcast_to(
        mask, F.shape[:-3] + (n,)).astype(F.dtype)
    args = (F, c, Q, H, nu, lam)
    in_specs = tuple(_time_spec(x, axis) for x in args)
    out_specs = (_time_spec(F, axis), _time_spec(F, axis), P())
    if maskf is None:
        fn = jax.shard_map(
            functools.partial(_filter_body, maskf=None, axis_name=axis),
            mesh=mesh, in_specs=in_specs, out_specs=out_specs)
        return fn(*args)
    fn = jax.shard_map(
        functools.partial(_filter_body, axis_name=axis),
        mesh=mesh, in_specs=in_specs + (_time_spec(maskf, axis),),
        out_specs=out_specs)
    return fn(*args, maskf)


def _koopman_bwd_body(F, c, Q, H, nu, lam, maskf, m_f, p_f, g, axis_name):
    from ..ops.adjoint import adjoint_grads_from_scan, adjoint_scan_elements

    m_prev = _shift_from_prev(m_f, axis_name)
    p_prev = _shift_from_prev(p_f, axis_name)
    f_next = _shift_from_next(F, axis_name)
    a, pp, e, l_mat, g_elem, v_elem = adjoint_scan_elements(
        F, c, Q, H, nu, lam, m_prev, p_prev, f_next)
    res = sharded_scan_tl(K._combine_smoother_tl, K._smoother_identity_like,
                          (K._t_tl(l_mat), g_elem, v_elem), axis_name,
                          reverse=True)
    r, ndk = res[1], res[2]
    grads = adjoint_grads_from_scan(F, c, Q, H, nu, lam, maskf,
                                    m_prev, p_prev, a, pp, r, ndk)
    gg = g[..., None, None, None]
    return tuple(gg * x for x in grads) + (jnp.zeros_like(maskf),)


def sharded_log_likelihood_koopman(F, c, Q, H, nu, lam, mask=None, *,
                                   mesh: Mesh, axis: str = "sp"):
    """Sequence-sharded site-form log marginal likelihood with the analytic
    Koopman VJP (:mod:`markovflow_tpu.ops.adjoint`) — both the forward
    filter and the backward adjoint run as explicit-collective scans, so a
    training step over P sequence shards communicates O(P d^2) per scan
    plus two boundary ppermutes, independent of T.
    """
    n = F.shape[-1]
    maskf = jnp.ones(F.shape[:-3] + (n,), F.dtype) if mask is None else \
        jnp.broadcast_to(mask, F.shape[:-3] + (n,)).astype(F.dtype)

    t_spec = functools.partial(_time_spec, axis=axis)
    arg_specs = tuple(t_spec(x) for x in (F, c, Q, H, nu, lam)) + \
        (t_spec(maskf),)

    @jax.custom_vjp
    def ll(F, c, Q, H, nu, lam, maskf):
        return sharded_filter_pipeline_tl(
            F, c, Q, H, nu, lam, mask=maskf > 0.5, mesh=mesh, axis=axis)[2]

    def fwd(F, c, Q, H, nu, lam, maskf):
        m_f, p_f, out = sharded_filter_pipeline_tl(
            F, c, Q, H, nu, lam, mask=maskf > 0.5, mesh=mesh, axis=axis)
        return out, (F, c, Q, H, nu, lam, maskf, m_f, p_f)

    def bwd(res, g):
        F = res[0]
        body = jax.shard_map(
            functools.partial(_koopman_bwd_body, axis_name=axis),
            mesh=mesh,
            in_specs=arg_specs + (t_spec(F), t_spec(F), P()),
            out_specs=arg_specs)
        return body(*res, g)

    ll.defvjp(fwd, bwd)
    return ll(F, c, Q, H, nu, lam, maskf)


def sharded_smoother_pipeline_tl(F, c, Q, m_f, p_f, *, mesh: Mesh,
                                 axis: str = "sp"):
    """:func:`markovflow_tpu.ops.kalman.smoother_pipeline_tl` with explicit
    collectives (same sharding contract as the filter).  Returns
    (m_s, p_s, gains) sharded over time; ``gains`` here is length N with the
    (unused) last element zeroed, unlike the unsharded N-1 convention.
    """
    args = (F, c, Q, m_f, p_f)
    in_specs = tuple(_time_spec(x, axis) for x in args)
    out_specs = tuple(_time_spec(F, axis) for _ in range(3))
    fn = jax.shard_map(
        functools.partial(_smoother_body, axis_name=axis),
        mesh=mesh, in_specs=in_specs, out_specs=out_specs)
    return fn(*args)
