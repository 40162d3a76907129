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

import jax
import jax.numpy as jnp

__all__ = ["affine_scan", "affine_cov_scan"]


def _mm(a, b):
    return jnp.einsum("...ijn,...jkn->...ikn", a, b)


def _t(a):
    return jnp.swapaxes(a, -3, -2)


def affine_scan(F: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """Prefix solutions of ``x_k = F_k x_{k-1} + c_k`` with ``x_{-1} = 0``.

    ``F``: [..., N, d, d], ``c``: [..., N, d].  Returns [..., N, d] of x_k.
    Encode the initial state as element 0 with ``F_0 = 0, c_0 = x_0``.
    """
    f_tl = jnp.moveaxis(F, -3, -1)
    c_tl = jnp.moveaxis(c[..., None], -3, -1)  # [..., d, 1, N]

    def combine(e1, e2):
        f1, c1 = e1
        f2, c2 = e2
        return _mm(f2, f1), _mm(f2, c1) + c2

    _, xs = jax.lax.associative_scan(combine, (f_tl, c_tl), axis=f_tl.ndim - 1)
    return jnp.moveaxis(xs[..., 0, :], -1, -2)


def affine_cov_scan(F: jnp.ndarray, c: jnp.ndarray, Q: jnp.ndarray):
    """Prefix means/covariances of ``x_k = F_k x_{k-1} + c_k + w_k``, w~N(0, Q_k).

    Returns ``(means [..., N, d], covs [..., N, d, d])``.  Encode the initial
    distribution as element 0 with ``F_0 = 0, c_0 = mu_0, Q_0 = P_0``.
    """
    f_tl = jnp.moveaxis(F, -3, -1)
    c_tl = jnp.moveaxis(c[..., None], -3, -1)
    q_tl = jnp.moveaxis(Q, -3, -1)

    def combine(e1, e2):
        f1, c1, q1 = e1
        f2, c2, q2 = e2
        f = _mm(f2, f1)
        cc = _mm(f2, c1) + c2
        q = _mm(f2, _mm(q1, _t(f2))) + q2
        return f, cc, 0.5 * (q + _t(q))

    _, ms, ps = jax.lax.associative_scan(
        combine, (f_tl, c_tl, q_tl), axis=f_tl.ndim - 1)
    means = jnp.moveaxis(ms[..., 0, :], -1, -2)
    return means, jnp.moveaxis(ps, -1, -3)
