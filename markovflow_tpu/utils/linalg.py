"""Batched small-matrix linear algebra helpers.

Replaces the reference's ``markovflow/utils.py`` helpers (block_diag,
kronecker_product, to_delta_time, augment_square_matrix/augment_matrix,
reference: markovflow/utils.py:75-257) with batch-first jnp equivalents.
Everything here vmaps/jits; state dims are small (1-10), so these lower to
vectorized VPU ops with the time/batch axes on the lanes.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

__all__ = [
    "tlt",
    "symmetrize",
    "block_diag",
    "batched_kron",
    "to_delta_time",
    "augment_square_matrix",
    "augment_matrix",
    "cholesky_or_zero",
    "safe_cholesky",
    "mvn_logpdf",
    "solve_from_chol",
    "add_jitter",
    "small_det",
    "small_inv",
    "small_solve",
    "small_cholesky",
]


def small_det(m):
    """Determinant of [..., d, d] with closed forms for d <= 3.

    Avoids LU (`jnp.linalg.det`) — faster for the tiny state/obs dims of
    Markovian GPs and works in f64 on TPU (LU is f32-only there).
    """
    d = m.shape[-1]
    if d == 1:
        return m[..., 0, 0]
    if d == 2:
        return m[..., 0, 0] * m[..., 1, 1] - m[..., 0, 1] * m[..., 1, 0]
    if d == 3:
        return (
            m[..., 0, 0] * (m[..., 1, 1] * m[..., 2, 2]
                            - m[..., 1, 2] * m[..., 2, 1])
            - m[..., 0, 1] * (m[..., 1, 0] * m[..., 2, 2]
                              - m[..., 1, 2] * m[..., 2, 0])
            + m[..., 0, 2] * (m[..., 1, 0] * m[..., 2, 1]
                              - m[..., 1, 1] * m[..., 2, 0])
        )
    return jnp.linalg.det(m)


def small_inv(m):
    """Inverse of [..., d, d] via adjugate for d <= 3, LU otherwise."""
    d = m.shape[-1]
    if d == 1:
        return 1.0 / m
    if d == 2:
        det = small_det(m)[..., None, None]
        adj = jnp.stack([
            jnp.stack([m[..., 1, 1], -m[..., 0, 1]], -1),
            jnp.stack([-m[..., 1, 0], m[..., 0, 0]], -1),
        ], -2)
        return adj / det
    if d == 3:
        det = small_det(m)[..., None, None]
        c = lambda i1, j1, i2, j2: (m[..., i1, j1] * m[..., i2, j2]
                                    - m[..., i1, j2] * m[..., i2, j1])
        adj = jnp.stack([
            jnp.stack([c(1, 1, 2, 2), -c(0, 1, 2, 2), c(0, 1, 1, 2)], -1),
            jnp.stack([-c(1, 0, 2, 2), c(0, 0, 2, 2), -c(0, 0, 1, 2)], -1),
            jnp.stack([c(1, 0, 2, 1), -c(0, 0, 2, 1), c(0, 0, 1, 1)], -1),
        ], -2)
        return adj / det
    return jnp.linalg.inv(m)


def small_solve(m, rhs):
    """Solve m @ x = rhs for tiny m (closed-form inverse), LU otherwise."""
    if m.shape[-1] <= 3:
        return small_inv(m) @ rhs
    return jnp.linalg.solve(m, rhs)


def small_cholesky(mat):
    """Closed-form Cholesky for [..., d, d] with d <= 3.

    Batched LAPACK-style ``jnp.linalg.cholesky`` on [N, d, d] arrays is a
    compile-time and runtime hazard on TPU for tiny d; these unrolled
    formulas are pure elementwise ops (and differentiable).
    """
    d = mat.shape[-1]
    if d == 1:
        return jnp.sqrt(mat)
    if d == 2:
        a = jnp.sqrt(mat[..., 0, 0])
        b = mat[..., 1, 0] / a
        c = jnp.sqrt(mat[..., 1, 1] - b * b)
        z = jnp.zeros_like(a)
        return jnp.stack([
            jnp.stack([a, z], -1),
            jnp.stack([b, c], -1),
        ], -2)
    if d == 3:
        l11 = jnp.sqrt(mat[..., 0, 0])
        l21 = mat[..., 1, 0] / l11
        l31 = mat[..., 2, 0] / l11
        l22 = jnp.sqrt(mat[..., 1, 1] - l21 * l21)
        l32 = (mat[..., 2, 1] - l31 * l21) / l22
        l33 = jnp.sqrt(mat[..., 2, 2] - l31 * l31 - l32 * l32)
        z = jnp.zeros_like(l11)
        return jnp.stack([
            jnp.stack([l11, z, z], -1),
            jnp.stack([l21, l22, z], -1),
            jnp.stack([l31, l32, l33], -1),
        ], -2)
    return jnp.linalg.cholesky(mat)


def psd_cholesky(mat):
    """Pivot-clamped Cholesky of [..., d, d]: negative pivots clamp to zero
    instead of producing NaN.

    Exact for PSD inputs; for an indefinite input whose negative part is
    roundoff (the only way one arises here), returns the factor of the
    nearest-in-pivot PSD matrix.  Needed by the posterior-SSM extraction:
    ``Q_post = P_{k+1} - A Cov(x_k, x_{k+1})`` cancels catastrophically for
    near-coincident time points (dt ~ 1e-7 on random dense grids makes the
    true Q_post ~ dt^3 ~ 1e-20, below f64 roundoff of the O(1) operands),
    so the computed difference can be ~ -1e-16 — a deterministic transition
    to machine precision, which is exactly what the clamped factor encodes.
    Subsumes the exactly-zero case of :func:`cholesky_or_zero`.
    """
    d = mat.shape[-1]
    lower = [[None] * d for _ in range(d)]
    for j in range(d):
        s = mat[..., j, j]
        for k in range(j):
            s = s - lower[j][k] * lower[j][k]
        # Double-where guard: sqrt(maximum(s, 0)) has an inf derivative at
        # the clamp (times maximum's zero cotangent -> NaN grads exactly
        # when the clamp engages, e.g. CVI dist_q inside a differentiated
        # objective on a degenerate grid).  Keeping the primal of the inner
        # where strictly positive makes both value AND gradient finite.
        pos = s > 0.0
        piv = jnp.where(pos, jnp.sqrt(jnp.where(pos, s, 1.0)), 0.0)
        lower[j][j] = piv
        safe = jnp.where(piv > 0.0, piv, 1.0)
        for i in range(j + 1, d):
            s2 = mat[..., i, j]
            for k in range(j):
                s2 = s2 - lower[i][k] * lower[j][k]
            lower[i][j] = jnp.where(piv > 0.0, s2 / safe, 0.0)
    zero = jnp.zeros_like(mat[..., 0, 0])
    rows = [
        jnp.stack([lower[i][j] if j <= i else zero for j in range(d)], -1)
        for i in range(d)
    ]
    return jnp.stack(rows, -2)


def tlt(x):
    """Transpose the last two axes."""
    return jnp.swapaxes(x, -1, -2)


def symmetrize(x):
    return 0.5 * (x + tlt(x))


def add_jitter(mat, jitter: float):
    """Add ``jitter`` to the diagonal of the last two axes."""
    d = mat.shape[-1]
    return mat + jitter * jnp.eye(d, dtype=mat.dtype)


def block_diag(mats: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Batched block-diagonal: [..., d_i, e_i] blocks -> [..., sum d, sum e].

    Batch dims must broadcast.  (Reference: markovflow/utils.py block_diag.)
    """
    mats = [jnp.asarray(m) for m in mats]
    batch = jnp.broadcast_shapes(*[m.shape[:-2] for m in mats])
    rows = sum(m.shape[-2] for m in mats)
    cols = sum(m.shape[-1] for m in mats)
    dtype = jnp.result_type(*mats)
    out = jnp.zeros(batch + (rows, cols), dtype=dtype)
    r = c = 0
    for m in mats:
        dr, dc = m.shape[-2], m.shape[-1]
        out = out.at[..., r : r + dr, c : c + dc].set(
            jnp.broadcast_to(m, batch + (dr, dc))
        )
        r += dr
        c += dc
    return out


def batched_kron(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched Kronecker product of [..., m, n] and [..., p, q] -> [..., mp, nq].

    (Reference: markovflow/utils.py kronecker_product, used by the Product
    kernel, markovflow/kernels/sde_kernel.py:691-822.)
    """
    m, n = a.shape[-2:]
    p, q = b.shape[-2:]
    out = jnp.einsum("...mn,...pq->...mpnq", a, b)
    return out.reshape(out.shape[:-4] + (m * p, n * q))


def to_delta_time(time_points: jnp.ndarray) -> jnp.ndarray:
    """Differences between successive time points, [..., N] -> [..., N-1].

    (Reference: markovflow/utils.py:88.)  Time points must be non-decreasing;
    this is not checked inside jit (use checkify at the boundary if needed).
    """
    return jnp.diff(time_points, axis=-1)


def augment_square_matrix(mat, extra_dim: int, fill_zeros: bool = False):
    """Pad [..., d, d] to [..., d+e, d+e], bottom-right block = I (or 0).

    Used by StackKernel to pad children to a common state dim
    (reference: markovflow/utils.py augment_square_matrix,
    markovflow/kernels/sde_kernel.py:945-1202).
    """
    if extra_dim == 0:
        return mat
    d = mat.shape[-1]
    batch = mat.shape[:-2]
    eye = jnp.zeros((extra_dim, extra_dim), mat.dtype) if fill_zeros else jnp.eye(
        extra_dim, dtype=mat.dtype
    )
    out = jnp.zeros(batch + (d + extra_dim, d + extra_dim), dtype=mat.dtype)
    out = out.at[..., :d, :d].set(mat)
    return out.at[..., d:, d:].set(jnp.broadcast_to(eye, batch + (extra_dim, extra_dim)))


def augment_matrix(mat, extra_dim: int):
    """Pad the last axis of [..., m, d] with ``extra_dim`` zero columns."""
    if extra_dim == 0:
        return mat
    pad = [(0, 0)] * (mat.ndim - 1) + [(0, extra_dim)]
    return jnp.pad(mat, pad)


def cholesky_or_zero(mat):
    """Cholesky of PSD [..., d, d] blocks where exactly-zero blocks map to zero.

    The reference masks zero covariances before Cholesky so that deterministic
    kernels (Constant, HarmonicOscillator, Q=0) work
    (reference: markovflow/state_space_model.py:634-656).
    """
    d = mat.shape[-1]
    diag = jnp.diagonal(mat, axis1=-2, axis2=-1)
    is_zero = jnp.all(diag == 0.0, axis=-1)[..., None, None]
    safe = jnp.where(is_zero, jnp.eye(d, dtype=mat.dtype), mat)
    chol = small_cholesky(safe)
    return jnp.where(is_zero, jnp.zeros_like(mat), chol)


def safe_cholesky(mat, jitter: float | None = None):
    """Cholesky with jitter on the diagonal."""
    if jitter is None:
        from ..config import default_jitter

        jitter = default_jitter(mat.dtype)
    return small_cholesky(add_jitter(mat, jitter))


def solve_from_chol(chol, rhs):
    """Solve (L L^T) x = rhs given lower-triangular ``chol``, batched."""
    y = jax.scipy.linalg.solve_triangular(chol, rhs, lower=True)
    return jax.scipy.linalg.solve_triangular(tlt(chol), y, lower=False)


def mvn_logpdf(x, mean, chol_cov):
    """log N(x; mean, L L^T) over the last axis, fully batched.

    Replaces TFP ``MultivariateNormalTriL.log_prob``
    (reference: markovflow/state_space_model.py:485-526).
    """
    d = x.shape[-1]
    diff = (x - mean)[..., None]
    chol_cov = jnp.broadcast_to(
        chol_cov, diff.shape[:-2] + chol_cov.shape[-2:])
    alpha = jax.scipy.linalg.solve_triangular(chol_cov, diff, lower=True)[..., 0]
    maha = jnp.sum(alpha**2, axis=-1)
    log_det = 2.0 * jnp.sum(
        jnp.log(jnp.abs(jnp.diagonal(chol_cov, axis1=-2, axis2=-1))), axis=-1
    )
    const = d * jnp.log(jnp.asarray(2.0 * jnp.pi, dtype=x.dtype))
    return -0.5 * (maha + log_det + const)
