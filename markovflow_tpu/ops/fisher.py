"""Fisher-identity gradients for the LGSSM log marginal likelihood.

The reference trains by autodiff through its banded recursions (TF gradient
tapes over the C++ ``banded_matrices`` ops — reference:
markovflow/kalman_filter.py:184-255 and the hand-written C++ op gradients).
Autodiff through a parallel scan costs another full scan pass per level plus
rematerialization.  For a *linear-Gaussian* SSM there is a classical closed
form instead (Fisher's identity / the EM complete-data sufficient
statistics):

    d/dtheta log p(Y) = E_{p(x|Y)}[ d/dtheta log p(x, Y; theta) ]

so the entire backward pass is ONE smoother pass + elementwise assembly of
the expected complete-data gradients — no differentiation through the scan
at all.  With the Pallas filter/smoother kernels this makes a training step
two fused scans + elementwise maps.

With the joint (states x_0..x_{N-1}, x_{-1} := 0, F_0 := 0 so that element 0
encodes the initial distribution N(c_0, Q_0)):

    log p(x, Y) = sum_k log N(x_k; F_k x_{k-1} + c_k, Q_k)
                + sum_k [ -1/2 nu_k' lam_k^{-1} nu_k + nu_k' H_k x_k
                          - 1/2 x_k' H_k' lam_k H_k x_k + 1/2 log|lam_k| ]
                  - const

and smoothed moments m_k = E[x_k | Y], S_k = Cov(x_k | Y),
C_k = Cov(x_{k-1}, x_k | Y) = G_{k-1} S_k (RTS gains G), the gradients are

    r_k   = m_k - F_k m_{k-1} - c_k
    Shat_k = S_k - F_k C_k - (F_k C_k)' + F_k S_{k-1} F_k'
    U_k   = Shat_k + r_k r_k'
    dL/dc_k = Q_k^{-1} r_k
    dL/dF_k = Q_k^{-1} [ C_k' + m_k m_{k-1}' - F_k (S_{k-1} + m_{k-1} m_{k-1}')
                         - c_k m_{k-1}' ]
    dL/dQ_k = 1/2 (Q_k^{-1} U_k Q_k^{-1} - Q_k^{-1})
    dL/dnu_k  = H_k m_k - y_k,              y_k = lam_k^{-1} nu_k
    dL/dlam_k = 1/2 (y_k y_k' - H_k A_k H_k' + lam_k^{-1}),  A_k = S_k + m_k m_k'
    dL/dH_k   = nu_k m_k' - lam_k H_k A_k

At masked steps (lam_k = 0: unobserved grid points of
``KalmanFilterWithSparseSites``) the observation gradients are defined as 0
(those entries are structural zeros; their cotangents are dropped by the
scatter that built the site arrays).

Everything runs in time-last layout with the unrolled small-matrix products
(see ops.kalman).  Gradients match autodiff through the scan pipeline to
float roundoff (tests/unit/test_fisher.py), with one caveat: for the
symmetric-matrix inputs (Q, lam) this VJP returns the canonical *symmetric*
cotangent, while autodiff of the scan pipeline may add an antisymmetric
component (the two are different extensions of log p(Y) off the symmetric
manifold).  Upstream chain rules agree whenever Q/lam are produced by a
symmetric construction — true of every kernel and likelihood in the library.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .kalman import (_inv_tl, _mm_tl, _sym_tl, _t_tl, filter_pipeline_tl,
                     smoother_pipeline_tl)
from .pallas_scan import pick_scan_engine

__all__ = ["log_likelihood_fisher"]


def _fisher_grads(F, c, Q, H, nu, lam, maskf, m_s, p_s, gains):
    """Expected complete-data gradients, all in TL layout."""
    mm, t = _mm_tl, _t_tl
    zpad = lambda x: jnp.concatenate(
        [jnp.zeros_like(x[..., :1]), x], axis=-1)
    m_prev = zpad(m_s[..., :-1])                     # m_{k-1}, 0 at k=0
    p_prev = zpad(p_s[..., :-1])                     # S_{k-1}
    cross = zpad(_mm_tl(gains, p_s[..., 1:]))        # C_k = G_{k-1} S_k

    r = m_s - mm(F, m_prev) - c
    fc = mm(F, cross)
    shat = p_s - fc - t(fc) + mm(F, mm(p_prev, t(F)))
    u = shat + mm(r, t(r))
    qi = _inv_tl(Q)
    g_c = mm(qi, r)
    exx_prev = p_prev + mm(m_prev, t(m_prev))
    b_cross = t(cross) + mm(m_s, t(m_prev))          # E[x_k x_{k-1}']
    g_f = mm(qi, b_cross - mm(F, exx_prev) - mm(c, t(m_prev)))
    g_q = 0.5 * (mm(qi, mm(_sym_tl(u), qi)) - qi)

    o = lam.shape[-3]
    eye_o = jnp.eye(o, dtype=lam.dtype)[..., None]
    keep = maskf[..., None, None, :]
    lam_safe = jnp.where(keep > 0.5, lam, eye_o)
    lam_inv = _inv_tl(lam_safe)
    y = mm(lam_inv, nu)
    hm = mm(H, m_s)
    a_k = p_s + mm(m_s, t(m_s))
    g_nu = hm - y
    g_lam = 0.5 * (mm(y, t(y)) - mm(H, mm(a_k, t(H))) + lam_inv)
    g_h = mm(nu, t(m_s)) - mm(lam, mm(H, a_k))
    g_nu = jnp.where(keep > 0.5, g_nu, 0.0)
    g_lam = jnp.where(keep > 0.5, g_lam, 0.0)
    g_h = jnp.where(keep > 0.5, g_h, 0.0)
    return g_f, g_c, g_q, g_h, g_nu, g_lam


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
        m_s, p_s, gains = smoother_pipeline_tl(
            F, c, Q, m_f, p_f, engine=pick_scan_engine(F, engine, lam))
        grads = _fisher_grads(F, c, Q, H, nu, lam, maskf, m_s, p_s, gains)
        gg = g[..., None, None, None]
        return tuple(gg * x for x in grads) + (jnp.zeros_like(maskf),)

    ll.defvjp(fwd, bwd)
    return ll


_LL_XLA = _make("xla")
_LL_PALLAS = _make("pallas")


def log_likelihood_fisher(F, c, Q, H, nu, lam, mask=None,
                          engine: str = "pallas"):
    """Site-form log marginal likelihood with Fisher-identity gradients.

    Same value as ``filter_pipeline_tl(...)[2]``; the VJP costs one smoother
    pass + elementwise assembly instead of autodiff through the scan.
    Requires every ``Q_k`` (incl. ``Q_0 = P0``) and every unmasked ``lam_k``
    to be invertible — kernels with exactly singular process noise
    (``Constant``/``HarmonicOscillator`` without jitter) must use the
    autodiff path instead.

    Conditioning caveat: the gradient assembly contracts ``Q_k^{-1}`` against
    a difference that cancels to ``O(Q)`` as ``Q_k -> 0``, so accuracy in the
    (F, Q) gradients degrades as ``cond(Q_k)`` grows — i.e. for *nearly*
    duplicated time points (``dt -> 0`` makes the kernel's process noise
    nearly singular).  On well-separated grids (the benchmark regime) it
    matches autodiff to float roundoff; with near-duplicate inputs prefer
    the autodiff path.

    ``engine="pallas"`` uses the fused TPU kernels for the two scans when
    eligible (unbatched, d <= 3, f32); falls back to the XLA scans.
    """
    n = F.shape[-1]
    if mask is None:
        maskf = jnp.ones(F.shape[:-3] + (n,), F.dtype)
    else:
        maskf = jnp.broadcast_to(mask, F.shape[:-3] + (n,)).astype(F.dtype)
    fn = _LL_PALLAS if engine == "pallas" else _LL_XLA
    return fn(F, c, Q, H, nu, lam, maskf)
