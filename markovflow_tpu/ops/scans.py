"""Parallel-prefix (associative-scan) primitives for affine-Gaussian recursions.

The reference's sequential recursions — marginal propagation, sampling, the
``tf.while_loop`` smoother — all compose affine-Gaussian maps
``x_k = F_k x_{k-1} + c_k + noise(Q_k)``.  Composition of such maps is
associative, so every recursion here runs as ``jax.lax.associative_scan`` with
O(log T) depth on TPU.

Layout: the scans run internally in *time-last* layout [..., d, d, N] so the
long time axis sits on the TPU vector lanes; [..., N, d, d] leaves would be
tile-padded to (8, 128) per step (~100x memory waste for the small state dims
of Markovian GPs).  Public signatures stay time-middle; boundary transposes
fuse under jit.

Used by :mod:`markovflow_tpu.state_space_model` (marginals, sampling) and
:mod:`markovflow_tpu.ops.kalman` (filter/smoother).
"""
from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp

__all__ = ["affine_scan", "affine_cov_scan", "affine_cov_scan_tl",
           "segmented_affine_cov_scan_tl", "scan_tl", "forward_mode_ad",
           "CHUNK", "CHUNK_THRESHOLD"]


#: When True (default) the affine scans differentiate via their analytic
#: custom-VJP adjoints — which makes FORWARD-mode AD (jax.jvp / jax.jacfwd
#: / jax.hessian) through them a TypeError, since custom_vjp functions
#: define no JVP rule.  See :func:`forward_mode_ad`.
_ANALYTIC_ADJOINTS = True


@contextlib.contextmanager
def forward_mode_ad():
    """Trace-time escape hatch for forward-mode AD through the affine scans.

    Inside this context :func:`affine_scan` / :func:`affine_cov_scan` trace
    as plain associative scans (no custom VJP), so ``jax.jvp`` /
    ``jax.jacfwd`` / ``jax.hessian`` work through marginals, mean-function
    coefficients, and every loss built on them.  The cost is reverse-mode:
    autodiff through the chunked scan tree unrolls its transpose to ~64x
    the forward eqn count (the reason the analytic adjoints exist), so use
    this only for Hessian/JVP work at moderate T.  The flag is read at
    TRACE time — enter the context before ``jit``/tracing, not inside a
    traced function.
    """
    global _ANALYTIC_ADJOINTS
    prev = _ANALYTIC_ADJOINTS
    _ANALYTIC_ADJOINTS = False
    try:
        yield
    finally:
        _ANALYTIC_ADJOINTS = prev


#: test hook: force the unrolled (True) or einsum/LU (False) TL forms
FORCE_UNROLLED = None


def unrolled_lane_ops() -> bool:
    """Whether TL small-matrix ops should unroll to elementwise lane ops.

    On TPU, einsum's dot_general with a trailing batch dim makes XLA
    relayout to time-middle (tiny blocks tile-padded to (8, 128)) —
    measured 223x slower at T = 1e6.  Everywhere else the unrolled
    expressions explode TRACE time instead (~1.8 ms per traced op on this
    1-core host; a d = 6 f64 ELBO was 84k jaxpr eqns / 63 s to trace via
    the unrolls, seconds via einsum).  Decided at trace time per backend.
    """
    if FORCE_UNROLLED is not None:
        return FORCE_UNROLLED
    return jax.default_backend() == "tpu"


def _mm(a, b):
    """[..., d1, d2, N] @ [..., d2, d3, N]: elementwise lane ops on TPU
    (see :func:`unrolled_lane_ops`), einsum elsewhere."""
    d1, d2 = a.shape[-3], a.shape[-2]
    d3 = b.shape[-2]
    if max(d1, d2, d3) > 6 or not unrolled_lane_ops():
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


def _t(a):
    return jnp.swapaxes(a, -3, -2)


#: Above this length, prefix scans run chunked: an outer ``lax.scan`` over
#: chunks with an inner associative scan.  XLA compile time explodes with the
#: unrolled scan depth (measured on TPU: 12-level body ~8 s, 15-level ~140 s,
#: 20 levels >15 min); chunking fixes the body size so compile is
#: T-independent while keeping within-chunk parallelism (step time at
#: T = 1e6, d = 2: ~0.04 ms).
CHUNK_THRESHOLD = 8192
CHUNK = 4096

#: float64 variants.  TPU f64 is software-emulated, so every combine op in
#: the unrolled inner scan lowers to many low-level ops and the compile
#: explosion sets in at far fewer levels than for f32 — f64 training graphs
#: (VGP natgrad, f64 parity oracles) stopped compiling inside any practical
#: budget at CHUNK=4096 (12 levels).  A shallower inner scan trades outer
#: sequential steps (cheap: the f64 runtime is emulation-bound anyway) for
#: a multiplicatively smaller compile.
#: Env-overridable (read at import) for on-chip tuning experiments:
#: MFTPU_CHUNK_F64 / MFTPU_CHUNK_THRESHOLD_F64.  Larger chunks mean fewer
#: sequential outer steps per scan (runtime) but multiplicatively larger
#: XLA compiles (the f64-emulation expansion).
import os as _os  # noqa: E402 — local alias, keeps the public surface clean

CHUNK_THRESHOLD_F64 = int(_os.environ.get("MFTPU_CHUNK_THRESHOLD_F64", 1024))
CHUNK_F64 = int(_os.environ.get("MFTPU_CHUNK_F64", 512))


def _chunk_params(dtype):
    if dtype == jnp.float64:
        return CHUNK_THRESHOLD_F64, CHUNK_F64
    return CHUNK_THRESHOLD, CHUNK


#: Escape hatch: MFTPU_SEQ_CHUNK_SCAN=1 restores the sequential outer
#: lax.scan over chunks (the pre-round-5 behaviour) for A/B measurement.
_SEQ_CHUNK_SCAN = _os.environ.get("MFTPU_SEQ_CHUNK_SCAN") == "1"


def _chunked_scan_tl(combine, identity_like, elems, reverse: bool = False):
    """Blocked 3-phase prefix scan over the last axis of TL-layout leaves.

    ``combine`` must take the accumulated side as its FIRST argument (for
    reverse scans that is the suffix).  ``identity_like(elems)`` returns the
    identity element with leaves shaped like ``elems`` but with a trailing
    axis of 1.

    Phases: (1) per-chunk local scans, vectorized over ALL chunks at once
    (the chunk axis is a leading batch dim, so every combine op processes
    num_chunks * chunk lanes); (2) one associative scan over the K chunk
    totals; (3) one broadcast combine folding the exclusive chunk carries
    into the local results.  Total combine depth is log2(chunk) +
    log2(K) + 1 — the earlier design's sequential outer ``lax.scan`` over
    chunks serialized K body executions (196 at T = 1e5 / CHUNK_F64 = 512),
    which dominated the f64 natgrad runtime (704 of 1053 ms measured
    on-chip in the naturals->SSM inversion alone) while keeping the VPU
    nearly idle on [d, d, chunk]-sized ops.  Compile stays bounded: the
    phase-1 body is one chunk-depth combine stack traced once, and the
    phase-2 scan adds log2(K) small-array combines.
    """
    n = elems[0].shape[-1]
    _, chunk = _chunk_params(elems[0].dtype)
    num_chunks = -(-n // chunk)
    pad = num_chunks * chunk - n
    ident = identity_like(elems)

    def pad_leaf(x, i):
        if pad == 0:
            return x
        fill = jnp.broadcast_to(i, x.shape[:-1] + (pad,))
        return jnp.concatenate([x, fill] if not reverse else [fill, x],
                               axis=-1)

    padded = tuple(pad_leaf(x, i) for x, i in zip(elems, ident))
    if _SEQ_CHUNK_SCAN:
        return _chunked_scan_tl_seq(combine, identity_like, padded, reverse,
                                    n, num_chunks, chunk, pad)

    def split(x):
        # [..., d1, d2, N] -> [..., K, d1, d2, C]: the chunk axis becomes a
        # leading batch dim (combines broadcast over it), lanes stay minor
        x = x.reshape(x.shape[:-1] + (num_chunks, chunk))
        return jnp.moveaxis(x, -2, -4)

    chunks = tuple(split(x) for x in padded)

    # remat: without it the backward pass persists every inner-scan level
    # (log2(chunk) * O(N) leaves); recomputing the local scans in the
    # backward pass keeps persisted residuals at O(N).
    @jax.checkpoint
    def local_scan(ch):
        return jax.lax.associative_scan(combine, ch, axis=ch[0].ndim - 1,
                                        reverse=reverse)

    local = local_scan(chunks)
    if num_chunks > 1:
        # phase 2: inclusive scan over the K chunk totals [..., K, d1, d2, 1]
        totals = tuple(l[..., :1] if reverse else l[..., -1:] for l in local)
        tot = jax.lax.associative_scan(combine, totals,
                                       axis=totals[0].ndim - 4,
                                       reverse=reverse)
        # exclusive shift along K with the identity at the boundary.  The
        # statically-false select gives the (vma-REPLICATED) identity the
        # varying type of the data under shard_map — concatenating mixed
        # types is rejected there; the select folds away everywhere else.
        idb = tuple(jnp.where(jnp.zeros((), bool), t[..., :1, :, :, :],
                              jnp.broadcast_to(i[..., None, :, :, :],
                                               t[..., :1, :, :, :].shape))
                    for i, t in zip(ident, tot))
        if reverse:
            carry = tuple(jnp.concatenate([t[..., 1:, :, :, :], ib], axis=-4)
                          for t, ib in zip(tot, idb))
        else:
            carry = tuple(jnp.concatenate([ib, t[..., :-1, :, :, :]], axis=-4)
                          for t, ib in zip(tot, idb))
        # phase 3: fold the chunk carries into every local prefix at once
        carry_b = tuple(jnp.broadcast_to(c, l.shape)
                        for c, l in zip(carry, local))
        outs = combine(carry_b, local)
    else:
        outs = local

    def merge(x):
        x = jnp.moveaxis(x, -4, -2)
        x = x.reshape(x.shape[:-2] + (num_chunks * chunk,))
        if pad == 0:
            return x
        return x[..., :n] if not reverse else x[..., pad:]

    return tuple(merge(x) for x in outs)


def _chunked_scan_tl_seq(combine, identity_like, padded, reverse, n,
                         num_chunks, chunk, pad):
    """Sequential outer lax.scan over chunks (pre-round-5 engine, kept
    behind MFTPU_SEQ_CHUNK_SCAN=1 for A/B measurement)."""

    def split(x):
        x = x.reshape(x.shape[:-1] + (num_chunks, chunk))
        return jnp.moveaxis(x, -2, 0)

    chunks = tuple(split(x) for x in padded)

    @jax.checkpoint
    def body(carry, chunk_elems):
        local = jax.lax.associative_scan(
            combine, chunk_elems, axis=chunk_elems[0].ndim - 1,
            reverse=reverse)
        carry_b = tuple(jnp.broadcast_to(c, l.shape)
                        for c, l in zip(carry, local))
        out = combine(carry_b, local)
        if reverse:
            new_carry = tuple(o[..., :1] for o in out)
        else:
            new_carry = tuple(o[..., -1:] for o in out)
        return new_carry, out

    init = identity_like(tuple(c[0] for c in chunks))
    # Under shard_map the constant identity init is vma-REPLICATED while the
    # body's output carry varies over the mapped axes, and lax.scan requires
    # the two types to match.  A statically-false select against the
    # (varying) chunk data gives the init the data's varying type without
    # changing its value (and folds away outside shard_map).
    init = tuple(jnp.where(jnp.zeros((), bool), c[0][..., :1], i)
                 for i, c in zip(init, chunks))
    _, outs = jax.lax.scan(body, init, chunks, reverse=reverse)

    def merge(x):
        x = jnp.moveaxis(x, 0, -2)
        x = x.reshape(x.shape[:-2] + (num_chunks * chunk,))
        if pad == 0:
            return x
        return x[..., :n] if not reverse else x[..., pad:]

    return tuple(merge(x) for x in outs)


def scan_tl(combine, identity_like, elems, reverse: bool = False):
    """Prefix scan over the trailing (time) axis of TL-layout leaves,
    chunked above :data:`CHUNK_THRESHOLD`.

    The optimization_barrier stops XLA from fusing the element-producer
    chain (kernel discretization etc.) into the scan: without it the
    forward-only compile of producer+scan graphs hangs for >15 minutes on
    TPU (measured; gradient graphs of the same program compile fine).  The
    barrier materializes the elements once, in TL layout, which the scan
    reads anyway.
    """
    n = elems[0].shape[-1]
    threshold, _ = _chunk_params(elems[0].dtype)
    elems = jax.lax.optimization_barrier(tuple(elems))
    if n > threshold:
        return _chunked_scan_tl(combine, identity_like, elems, reverse)
    return jax.lax.associative_scan(combine, elems, axis=elems[0].ndim - 1,
                                    reverse=reverse)


def _affine_identity_like(e):
    f = e[0]
    d = f.shape[-3]
    eye = jnp.broadcast_to(jnp.eye(d, dtype=f.dtype)[..., None],
                           f.shape[:-1] + (1,))
    rest = tuple(jnp.zeros(x.shape[:-1] + (1,), x.dtype) for x in e[1:])
    return (eye,) + rest


def _combine_adjoint(later, earlier):
    """Suffix composition of the backward accumulators
    ``r_k = g_k + E_k^T r_{k+1}``, ``M_k = ell_k + E_k^T M_{k+1} E_k``
    (the smoother composition; elements carry ``E_k^T`` directly)."""
    le, lg, ll = later
    et, eg, el = earlier
    e = _mm(et, le)
    g = _mm(et, lg) + eg
    ell = _mm(et, _mm(ll, _t(et))) + el
    return e, g, ell


def _shift_next(f_tl):
    """E_k = F_{k+1} (zero past the end): the backward coupling matrices."""
    return jnp.concatenate([f_tl[..., 1:], jnp.zeros_like(f_tl[..., :1])],
                           axis=-1)


def _affine_scan_tl_raw(f_tl, c_tl):
    def combine(e1, e2):
        f1, c1 = e1
        f2, c2 = e2
        return _mm(f2, f1), _mm(f2, c1) + c2

    _, xs = scan_tl(combine, _affine_identity_like, (f_tl, c_tl))
    return xs


@jax.custom_vjp
def _affine_scan_tl(f_tl, c_tl):
    return _affine_scan_tl_raw(f_tl, c_tl)


def _affine_scan_tl_fwd(f_tl, c_tl):
    xs = _affine_scan_tl_raw(f_tl, c_tl)
    return xs, (f_tl, xs)


def _affine_scan_tl_bwd(res, xbar):
    # Analytic transpose of the prefix recursion x_k = F_k x_{k-1} + c_k:
    #   lam_k = xbar_k + F_{k+1}^T lam_{k+1}   (one reverse affine scan)
    #   cbar_k = lam_k ;  Fbar_k = lam_k x_{k-1}^T
    # Autodiff through the chunked associative scan instead unrolls every
    # level of the scan tree into the transpose program (measured 64x the
    # forward eqn count; the f64 VGP natgrad graph stopped compiling in
    # budget) — this keeps the backward the same shape as the forward.
    f_tl, xs = res
    et = _t(_shift_next(f_tl))

    def combine(later, earlier):
        le, lg = later
        ee, eg = earlier
        return _mm(ee, le), _mm(ee, lg) + eg

    _, lam = scan_tl(combine, _affine_identity_like, (et, xbar),
                     reverse=True)
    x_prev = jnp.concatenate([jnp.zeros_like(xs[..., :1]), xs[..., :-1]],
                             axis=-1)
    fbar = _mm(lam, _t(x_prev))
    return fbar.astype(f_tl.dtype), lam.astype(f_tl.dtype)


_affine_scan_tl.defvjp(_affine_scan_tl_fwd, _affine_scan_tl_bwd)


def affine_scan(F: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """Prefix solutions of ``x_k = F_k x_{k-1} + c_k`` with ``x_{-1} = 0``.

    ``F``: [..., N, d, d], ``c``: [..., N, d].  Returns [..., N, d] of x_k.
    Encode the initial state as element 0 with ``F_0 = 0, c_0 = x_0``.
    Reverse-mode differentiates via the analytic adjoint (one extra
    reverse scan), not through the scan tree.
    """
    f_tl = jnp.moveaxis(F, -3, -1)
    c_tl = jnp.moveaxis(c[..., None], -3, -1)  # [..., d, 1, N]
    # broadcast now so the custom VJP sees equal batch shapes (its cotangent
    # reduction handles the rest)
    batch = jnp.broadcast_shapes(f_tl.shape[:-3], c_tl.shape[:-3])
    f_tl = jnp.broadcast_to(f_tl, batch + f_tl.shape[-3:])
    c_tl = jnp.broadcast_to(c_tl, batch + c_tl.shape[-3:])
    scan = _affine_scan_tl if _ANALYTIC_ADJOINTS else _affine_scan_tl_raw
    xs = scan(f_tl, c_tl)
    return jnp.moveaxis(xs[..., 0, :], -1, -2)


def _affine_cov_scan_tl_raw(f_tl, c_tl, q_tl):
    def combine(e1, e2):
        f1, c1, q1 = e1
        f2, c2, q2 = e2
        f = _mm(f2, f1)
        cc = _mm(f2, c1) + c2
        q = _mm(f2, _mm(q1, _t(f2))) + q2
        return f, cc, 0.5 * (q + _t(q))

    _, ms, ps = scan_tl(combine, _affine_identity_like, (f_tl, c_tl, q_tl))
    return ms, ps


@jax.custom_vjp
def _affine_cov_scan_tl_core(f_tl, c_tl, q_tl):
    return _affine_cov_scan_tl_raw(f_tl, c_tl, q_tl)


def _affine_cov_scan_tl_fwd(f_tl, c_tl, q_tl):
    ms, ps = _affine_cov_scan_tl_raw(f_tl, c_tl, q_tl)
    return (ms, ps), (f_tl, ms, ps)


def _affine_cov_scan_tl_bwd(res, cotangents):
    # Transpose of m_k = F_k m_{k-1} + c_k; P_k = F_k P_{k-1} F_k^T + Q_k:
    #   lam_k = mbar_k + F_{k+1}^T lam_{k+1}
    #   M_k   = sym(pbar_k) + F_{k+1}^T M_{k+1} F_{k+1}
    # (ONE reverse scan with the smoother composition), then
    #   cbar = lam ; qbar = M ; fbar_k = lam_k m_{k-1}^T + 2 M_k F_k P_{k-1}.
    f_tl, ms, ps = res
    mbar, pbar = cotangents
    pbar_s = 0.5 * (pbar + _t(pbar))
    et = _t(_shift_next(f_tl))
    _, lam, big_m = scan_tl(_combine_adjoint, _affine_identity_like,
                            (et, mbar, pbar_s), reverse=True)
    m_prev = jnp.concatenate([jnp.zeros_like(ms[..., :1]), ms[..., :-1]],
                             axis=-1)
    p_prev = jnp.concatenate([jnp.zeros_like(ps[..., :1]), ps[..., :-1]],
                             axis=-1)
    fbar = _mm(lam, _t(m_prev)) + 2.0 * _mm(big_m, _mm(f_tl, p_prev))
    dt = f_tl.dtype
    return fbar.astype(dt), lam.astype(dt), big_m.astype(dt)


_affine_cov_scan_tl_core.defvjp(_affine_cov_scan_tl_fwd,
                                _affine_cov_scan_tl_bwd)


def affine_cov_scan_tl(f_tl, c_tl, q_tl):
    """TL-layout core of :func:`affine_cov_scan`: inputs/outputs stay in
    time-last layout (``f_tl``/``q_tl`` [..., d, d, N]; ``c_tl``
    [..., d, 1, N]).  Returns (means [..., d, 1, N], covs [..., d, d, N]).

    Reverse-mode AD uses the analytic adjoint above, NOT autodiff through
    the scan tree: the transposed chunked scan unrolls to ~64x the forward
    eqn count (measured at d = 2) and pushed the f64 VGP/natgrad graphs past
    any practical XLA compile budget.  The ``Q``/covariance cotangents use
    the canonical symmetric extension (same convention as ops/adjoint.py /
    ops/fisher.py; upstream producers are symmetric maps)."""
    batch = jnp.broadcast_shapes(f_tl.shape[:-3], c_tl.shape[:-3],
                                 q_tl.shape[:-3])
    f_tl = jnp.broadcast_to(f_tl, batch + f_tl.shape[-3:])
    c_tl = jnp.broadcast_to(c_tl, batch + c_tl.shape[-3:])
    q_tl = jnp.broadcast_to(q_tl, batch + q_tl.shape[-3:])
    core = (_affine_cov_scan_tl_core if _ANALYTIC_ADJOINTS
            else _affine_cov_scan_tl_raw)
    return core(f_tl, c_tl, q_tl)


def affine_cov_scan(F: jnp.ndarray, c: jnp.ndarray, Q: jnp.ndarray):
    """Prefix means/covariances of ``x_k = F_k x_{k-1} + c_k + w_k``, w~N(0, Q_k).

    Returns ``(means [..., N, d], covs [..., N, d, d])``.  Encode the initial
    distribution as element 0 with ``F_0 = 0, c_0 = mu_0, Q_0 = P_0``.
    """
    ms, ps = affine_cov_scan_tl(
        jnp.moveaxis(F, -3, -1),
        jnp.moveaxis(c[..., None], -3, -1),
        jnp.moveaxis(Q, -3, -1),
    )
    means = jnp.moveaxis(ms[..., 0, :], -1, -2)
    return means, jnp.moveaxis(ps, -1, -3)


def segmented_affine_cov_scan_tl(f_tl, c_tl, q_tl, start):
    """Segment-wise composition of affine-Gaussian maps, time-last layout.

    ``f_tl [..., d, d, N]``, ``c_tl [..., d, 1, N]``, ``q_tl [..., d, d, N]``;
    ``start [N]`` boolean, True at element ``k`` meaning the composition
    restarts AT ``k``.  Returns TL arrays ``(F, c, Q)`` where index ``k``
    holds the composition of elements from its segment's start through ``k``
    — the standard segmented-scan trick: carrying an or-flag and discarding
    the left operand when the right one starts a segment keeps the combine
    associative, so the whole thing is ONE O(log N)-depth prefix scan.

    Used to collapse unobserved grid stretches between sparse observations
    into single transitions (``KalmanFilterWithSparseSites.condense``).
    """
    s_tl = jnp.broadcast_to(
        start.astype(f_tl.dtype), f_tl.shape[:-3] + (f_tl.shape[-1],)
    )[..., None, None, :]

    def combine(e1, e2):
        f1, c1, q1, s1 = e1
        f2, c2, q2, s2 = e2
        keep = 1.0 - s2  # e2 starts a segment -> discard the left operand
        f = _mm(f2, f1) * keep + f2 * s2
        cc = _mm(f2, c1) * keep + c2
        q = _mm(f2, _mm(q1, _t(f2))) * keep + q2
        return f, cc, 0.5 * (q + _t(q)), jnp.maximum(s1, s2)

    res = scan_tl(combine, _affine_identity_like, (f_tl, c_tl, q_tl, s_tl))
    return res[0], res[1], res[2]
