"""Gain-form analytic adjoint (Koopman score) for the LGSSM log likelihood.

Autodiff through the chunked associative scan is the slowest part of a
training step (measured ~400x the forward cost on TPU: every scan level is
re-materialized and reversed).  The Fisher-identity VJP (:mod:`.fisher`)
fixes that but contracts ``Q^{-1}`` against an ``O(Q)`` cancellation, which
is numerically unusable in float32 on dense time grids (process noise
``Q ~ dt^3`` for Matern-3/2).  This module implements the third option — the
classical *prediction-error / disturbance-smoother score* (Koopman 1992;
Durbin & Koopman section 7.3.3) — which is algebraically equal to autodiff's
gradient and works entirely in gain form: only innovation-covariance
inverses ``S^{-1}`` appear, never ``Q^{-1}``, so its float32 behaviour
matches autodiff while costing ONE extra reverse scan.

Derivation (first principles, verified against autodiff in
tests/unit/test_adjoint.py).  Forward, for k = 0..N-1 (element 0 encodes the
prior: F_0 = 0, a_0 = c_0, Pp_0 = Q_0), sites in natural form (nu, Lam):

    a_k  = F_k m_{k-1} + c_k           Pp_k = F_k P_{k-1} F_k^T + Q_k
    Zt_k = (I + Lam H Pp H^T)^{-1}     e_k = Zt_k (nu - Lam H a_k)  [= S^-1 v]
    W_k  = Zt_k Lam  [= S^{-1}]        K_k = Pp H^T W  (gain)
    m_k  = a_k + Pp H^T e_k            P_k = (I - K H) Pp
    L_k  = F_{k+1} (I - K_k H_k)       (L_{N-1} irrelevant, zero-padded)

Backward: with r_k = dL/da_k and NDK the conjugation accumulator,

    r_k   = H^T e_k + L_k^T r_{k+1}
    NDK_k = H^T W_k H + L_k^T NDK_{k+1} L_k

— both computed by ONE reverse associative scan with the smoother
composition (E = L^T, g = H^T e, ell = H^T W H).  Then

    dL/dPp_k = 1/2 (r_k r_k^T - NDK_k) =: N_k      (no cancellation vs Q)
    dL/dQ_k  = N_k                 dL/dc_k = r_k
    dL/dF_k  = r_k m_{k-1}^T + 2 N_k F_k P_{k-1}

Observation-side gradients use the smoothed moments, recovered for free:

    ms_k = a_k + Pp_k r_k          Ps_k = Pp_k - Pp_k NDK_k Pp_k
    dL/dnu_k  = H ms_k - Lam^{-1} nu_k
    dL/dLam_k = 1/2 (y y^T - H (Ps + ms ms^T) H^T + Lam^{-1}),  y = Lam^{-1} nu
    dL/dH_k   = nu ms^T - Lam H (Ps + ms ms^T)

(Lam^{-1} here is benign: sites are user-scale precisions, and the terms are
exact — no cancellation; masked steps (Lam = 0) have zero gradients by
construction.)  As with :mod:`.fisher`, the (Q, Lam) cotangents are the
canonical symmetric extensions; upstream producers are symmetric maps for
every kernel/likelihood in the library, so chain rules agree with autodiff.

Reference parity: this replaces differentiating through the reference's
banded C++ op gradients (markovflow/kalman_filter.py:184-255 under a TF
GradientTape).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .kalman import (_eye_tl, _inv_tl, _mm_tl, _sym_tl, _t_tl,
                     _smoother_identity_like, _combine_smoother_tl,
                     filter_pipeline_tl)
from .pallas_scan import pick_scan_engine
from .scans import scan_tl

__all__ = ["log_likelihood_koopman", "log_likelihood_koopman_uniform"]


def adjoint_scan_elements(F, c, Q, H, nu, lam, m_prev, p_prev, f_next):
    """Elementwise stage 1: predicted quantities + reverse-scan elements.

    ``m_prev``/``p_prev`` are the filtered moments shifted right by one
    (zeros at the global first element); ``f_next`` is F shifted left by one
    (zeros at the global last element).  Exposing the shifts as inputs lets
    the sequence-sharded path supply them via ppermute.
    Returns (a, pp, e, l_mat, g_elem, v_elem).
    """
    mm, t = _mm_tl, _t_tl
    d = F.shape[-3]
    o = lam.shape[-3]
    eye_d = _eye_tl(d, F.dtype)
    eye_o = _eye_tl(o, F.dtype)
    a = mm(F, m_prev) + c                           # a_0 = c_0 (F_0 = 0)
    pp = _sym_tl(mm(F, mm(p_prev, t(F))) + Q)       # Pp_0 = Q_0
    hpht = mm(H, mm(pp, t(H)))                      # [o, o, N]
    zt = _inv_tl(eye_o + mm(lam, hpht))             # (I + Lam H Pp H^T)^-1
    w = _sym_tl(mm(zt, lam))                        # S^{-1}
    e = mm(zt, nu - mm(lam, mm(H, a)))              # [o, 1, N]
    kh = mm(pp, mm(t(H), mm(w, H)))                 # K H  [d, d, N]
    l_mat = mm(f_next, eye_d - kh)                  # L_k = F_{k+1}(I - K H)
    g_elem = mm(t(H), e)                            # H^T e  [d, 1, N]
    v_elem = _sym_tl(mm(t(H), mm(w, H)))            # H^T S^-1 H  [d, d, N]
    return a, pp, e, l_mat, g_elem, v_elem


def adjoint_grads_from_scan(F, c, Q, H, nu, lam, maskf, m_prev, p_prev,
                            a, pp, r, ndk):
    """Elementwise stage 2: the six gradients from the adjoint scan results."""
    mm, t = _mm_tl, _t_tl
    o = lam.shape[-3]
    eye_o = _eye_tl(o, F.dtype)
    n_mat = 0.5 * (mm(r, t(r)) - ndk)               # dL/dPp_k
    g_q = n_mat
    g_c = r
    g_f = mm(r, t(m_prev)) + 2.0 * mm(n_mat, mm(F, p_prev))

    # observation-side gradients via smoothed moments
    m_s = a + mm(pp, r)
    p_s = _sym_tl(pp - mm(pp, mm(ndk, pp)))
    keep = maskf[..., None, None, :]
    lam_safe = jnp.where(keep > 0.5, lam, eye_o)
    lam_inv = _inv_tl(lam_safe)
    y = mm(lam_inv, nu)
    a_k = p_s + mm(m_s, t(m_s))
    g_nu = mm(H, m_s) - y
    g_lam = 0.5 * (mm(y, t(y)) - mm(H, mm(a_k, t(H))) + lam_inv)
    g_h = mm(nu, t(m_s)) - mm(lam, mm(H, a_k))
    g_nu = jnp.where(keep > 0.5, g_nu, 0.0)
    g_lam = jnp.where(keep > 0.5, g_lam, 0.0)
    g_h = jnp.where(keep > 0.5, g_h, 0.0)
    return g_f, g_c, g_q, g_h, g_nu, g_lam


def _adjoint_grads(F, c, Q, H, nu, lam, maskf, m_f, p_f, engine="xla"):
    """All six gradients from the saved filter results, in TL layout."""
    zpad = lambda x: jnp.concatenate(
        [jnp.zeros_like(x[..., :1]), x], axis=-1)
    m_prev = zpad(m_f[..., :-1])                    # m_{k-1} (0 at k=0)
    p_prev = zpad(p_f[..., :-1])                    # P_{k-1} (0 at k=0)
    f_next = jnp.concatenate(
        [F[..., 1:], jnp.zeros_like(F[..., :1])], axis=-1)
    a, pp, e, l_mat, g_elem, v_elem = adjoint_scan_elements(
        F, c, Q, H, nu, lam, m_prev, p_prev, f_next)
    if engine == "pallas":
        # same (E, g, ell) suffix composition as the RTS smoother kernel
        from .pallas_scan import pallas_smoother_scan

        r, ndk = pallas_smoother_scan((_t_tl(l_mat), g_elem, v_elem))
    else:
        res = scan_tl(_combine_smoother_tl, _smoother_identity_like,
                      (_t_tl(l_mat), g_elem, v_elem), reverse=True)
        r, ndk = res[1], res[2]                     # [d,1,N], [d,d,N]
    return adjoint_grads_from_scan(F, c, Q, H, nu, lam, maskf,
                                   m_prev, p_prev, a, pp, r, ndk)


def _make(engine: str):
    @jax.custom_vjp
    def ll(F, c, Q, H, nu, lam, maskf):
        mask = maskf > 0.5
        _, _, out = filter_pipeline_tl(
            F, c, Q, H, nu, lam, mask,
            engine=pick_scan_engine(F, engine, lam))
        return out

    def fwd(F, c, Q, H, nu, lam, maskf):
        mask = maskf > 0.5
        m_f, p_f, out = filter_pipeline_tl(
            F, c, Q, H, nu, lam, mask,
            engine=pick_scan_engine(F, engine, lam))
        return out, (F, c, Q, H, nu, lam, maskf, m_f, p_f)

    def bwd(res, g):
        F, c, Q, H, nu, lam, maskf, m_f, p_f = res
        # Note: a fully fused backward kernel exists
        # (pallas_scan.pallas_adjoint_pipeline) but measured ~1 ms SLOWER
        # than this split form (XLA tile-parallel elementwise + pallas
        # reverse scan) at T = 1e6 — the in-kernel per-sublane gradient
        # assembly under-utilizes the VPU.  Kept for future tuning.
        grads = _adjoint_grads(F, c, Q, H, nu, lam, maskf, m_f, p_f,
                               engine=pick_scan_engine(F, engine, lam))
        gg = g[..., None, None, None]
        return tuple(gg * x for x in grads) + (jnp.zeros_like(maskf),)

    ll.defvjp(fwd, bwd)
    return ll


_LL_XLA = _make("xla")
_LL_PALLAS = _make("pallas")


# --------------------------------------------------------------------------
# Uniform-grid (stationary) fast path: constant prior-step arrays never
# materialize as [d, d, N]; their gradients come back as broadcast-VJP sums.
# --------------------------------------------------------------------------
def _materialize_uniform(Fc, cc, Qc, mu0, P0, Hc, n):
    """Expand the constant representation to full TL arrays (XLA fallback /
    oracle): F = [0, Fc, Fc, ...], c = [mu0, cc, ...], Q = [P0, Qc, ...],
    H broadcast to all N steps."""
    rep = lambda x: jnp.broadcast_to(x, x.shape[:-1] + (n - 1,))
    F = jnp.concatenate([jnp.zeros_like(Fc), rep(Fc)], axis=-1)
    c = jnp.concatenate([mu0, rep(cc)], axis=-1)
    Q = jnp.concatenate([P0, rep(Qc)], axis=-1)
    H = jnp.broadcast_to(Hc, Hc.shape[:-1] + (n,))
    return F, c, Q, H


def _uniform_engine(Fc, lam, engine):
    """Pallas eligibility for the uniform kernels (mirrors
    pick_scan_engine: batched, d <= 6, o <= 6, float32, TPU backend)."""
    if engine != "pallas":
        return "xla"
    if Fc.shape[-3] > 6 or Fc.dtype != jnp.float32:
        return "xla"
    if lam.shape[-3] > 6 or lam.dtype != jnp.float32:
        return "xla"
    if jax.default_backend() != "tpu":
        return "xla"
    return "pallas"


def _make_uniform(engine: str):
    @jax.custom_vjp
    def ll(Fc, cc, Qc, mu0, P0, Hc, nu, lam, maskf):
        return fwd(Fc, cc, Qc, mu0, P0, Hc, nu, lam, maskf)[0]

    def fwd(Fc, cc, Qc, mu0, P0, Hc, nu, lam, maskf):
        eng = _uniform_engine(Fc, lam, engine)
        if eng == "pallas":
            from .pallas_scan import pallas_filter_pipeline_uniform

            m_f, p_f, out = pallas_filter_pipeline_uniform(
                Fc, cc, Qc, mu0, P0, Hc, nu, lam, maskf)
        else:
            # Materialized fallback — still eligible for the GENERAL fused
            # kernels (they cover d <= 12; the uniform kernels gate at 6).
            F, c, Q, H = _materialize_uniform(Fc, cc, Qc, mu0, P0, Hc,
                                              nu.shape[-1])
            m_f, p_f, out = filter_pipeline_tl(
                F, c, Q, H, nu, lam, maskf[..., 0, 0, :] > 0.5,
                engine=pick_scan_engine(F, engine, lam))
        return out, (Fc, cc, Qc, mu0, P0, Hc, nu, lam, maskf, m_f, p_f)

    def bwd(res, g):
        Fc, cc, Qc, mu0, P0, Hc, nu, lam, maskf, m_f, p_f = res
        eng = _uniform_engine(Fc, lam, engine)
        if eng == "pallas":
            from .pallas_scan import pallas_adjoint_pipeline_uniform

            (gFc, gcc, gQc, gmu0, gP0, gHc, gnu,
             glam) = pallas_adjoint_pipeline_uniform(
                Fc, cc, Qc, mu0, P0, Hc, nu, lam, maskf, m_f, p_f, g)
        else:
            F, c, Q, H = _materialize_uniform(Fc, cc, Qc, mu0, P0, Hc,
                                              nu.shape[-1])
            g_f, g_c, g_q, g_h, g_nu, g_lam = _adjoint_grads(
                F, c, Q, H, nu, lam, maskf[..., 0, 0, :], m_f, p_f,
                engine=pick_scan_engine(F, engine, lam))
            gg = g[..., None, None, None]
            red = lambda x: jnp.sum(gg * x, axis=-1, keepdims=True)
            gFc = red(g_f[..., 1:])
            gcc = red(g_c[..., 1:])
            gQc = red(g_q[..., 1:])
            gmu0 = gg * g_c[..., :1]
            gP0 = gg * g_q[..., :1]
            gHc = red(g_h)
            gnu = gg * g_nu
            glam = gg * g_lam
        return (gFc, gcc, gQc, gmu0, gP0, gHc, gnu, glam,
                jnp.zeros_like(maskf))

    ll.defvjp(fwd, bwd)
    return ll


_LL_UNI_XLA = _make_uniform("xla")
_LL_UNI_PALLAS = _make_uniform("pallas")


def log_likelihood_koopman_uniform(Fc, cc, Qc, mu0, P0, Hc, nu, lam,
                                   mask=None, engine: str = "pallas"):
    """Uniform-grid site-form log marginal likelihood with the Koopman VJP.

    The prior steps enter in CONSTANT form — Fc [..., d, d, 1],
    cc [..., d, 1, 1], Qc [..., d, d, 1] for every k >= 1, prior
    (mu0 [..., d, 1, 1], P0 [..., d, d, 1]) at element 0, constant emission
    Hc [..., o, d, 1] — so no [d, d, N] array is ever materialized; sites
    (nu [..., o, 1, N], lam [..., o, o, N or 1], mask [..., N]) stay
    per-step.  Value and gradients equal :func:`log_likelihood_koopman` on
    the materialized arrays (the constant-input gradients are the broadcast
    sums).  TPU-ineligible requests fall back to the XLA scans on the
    materialized arrays.
    """
    n = nu.shape[-1]
    lead = jnp.broadcast_shapes(nu.shape[:-3], lam.shape[:-3],
                                Fc.shape[:-3], cc.shape[:-3], Qc.shape[:-3],
                                mu0.shape[:-3], P0.shape[:-3], Hc.shape[:-3])
    d = Fc.shape[-2]
    o = lam.shape[-3]
    bcc = lambda x, d1, d2: jnp.broadcast_to(x, lead + (d1, d2, 1))
    Fc, cc, Qc = bcc(Fc, d, d), bcc(cc, d, 1), bcc(Qc, d, d)
    mu0, P0, Hc = bcc(mu0, d, 1), bcc(P0, d, d), bcc(Hc, o, d)
    nu = jnp.broadcast_to(nu, lead + (o, 1, n))
    lam = jnp.broadcast_to(lam, lead + (o, o, n))
    if mask is None:
        maskf = jnp.ones(lead + (1, 1, n), nu.dtype)
    else:
        maskf = jnp.broadcast_to(mask[..., None, None, :],
                                 lead + (1, 1, n)).astype(nu.dtype)
    fn = _LL_UNI_PALLAS if engine == "pallas" else _LL_UNI_XLA
    return fn(Fc, cc, Qc, mu0, P0, Hc, nu, lam, maskf)


def log_likelihood_koopman(F, c, Q, H, nu, lam, mask=None,
                           engine: str = "pallas"):
    """Site-form log marginal likelihood whose VJP is the analytic
    prediction-error (Koopman) score: one reverse scan, gain form only.

    Same value as ``filter_pipeline_tl(...)[2]``; gradients equal autodiff's
    to float roundoff in ALL regimes (no ``Q^{-1}``, unlike the Fisher
    identity), including exactly singular process noise and masked (sparse
    site) steps.

    ``engine="pallas"`` (default) runs both the forward filter scan and the
    backward adjoint scan as fused TPU kernels when eligible (arbitrary
    batch dims, d <= 6 and o <= 6, f32, TPU backend — see
    ``pick_scan_engine``) — the adjoint recursion has exactly the RTS
    smoother's (E, g, ell) suffix composition, so it reuses that kernel.
    Ineligible shapes fall back to the XLA scans.
    """
    n = F.shape[-1]
    if mask is None:
        maskf = jnp.ones(F.shape[:-3] + (n,), F.dtype)
    else:
        maskf = jnp.broadcast_to(mask, F.shape[:-3] + (n,)).astype(F.dtype)
    fn = _LL_PALLAS if engine == "pallas" else _LL_XLA
    return fn(F, c, Q, H, nu, lam, maskf)
