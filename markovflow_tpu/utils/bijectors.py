"""Constraint bijectors (replaces gpflow/TFP bijectors used by the reference).

The reference constrains parameters with TFP bijectors via gpflow:
``positive()`` (softplus) for scales (reference: markovflow/kernels/matern.py:58),
``triangular()`` (FillTriangular) for Cholesky factors
(reference: markovflow/state_space_model.py:416-422) and ``Invert(Ordered())``
for inducing points (reference: markovflow/base.py:27-37).

These are tiny, stateless, hashable objects (they end up in jit cache keys via
Module static data), with just ``forward`` / ``inverse``.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

__all__ = [
    "Bijector",
    "Identity",
    "Positive",
    "positive",
    "FillTriangular",
    "triangular",
    "Ordered",
    "ordered",
    "fill_triangular",
    "fill_triangular_inverse",
]


def _tri_size_to_dim(m: int) -> int:
    """n(n+1)/2 = m  →  n."""
    n = int(round((np.sqrt(8.0 * m + 1.0) - 1.0) / 2.0))
    if n * (n + 1) // 2 != m:
        raise ValueError(f"{m} is not a triangular number")
    return n


def fill_triangular(vec):
    """Pack ``[..., n(n+1)/2]`` into a lower-triangular ``[..., n, n]`` matrix.

    Row-major lower-triangular order: (0,0), (1,0), (1,1), (2,0), ...
    """
    m = vec.shape[-1]
    n = _tri_size_to_dim(m)
    rows, cols = np.tril_indices(n)
    out = jnp.zeros(vec.shape[:-1] + (n, n), dtype=vec.dtype)
    return out.at[..., rows, cols].set(vec)


def fill_triangular_inverse(mat):
    """Inverse of :func:`fill_triangular`: extract the lower triangle as a vector."""
    n = mat.shape[-1]
    rows, cols = np.tril_indices(n)
    return mat[..., rows, cols]  # numpy fancy-indexing works for both np/jnp


def _xp(y):
    """numpy for host values, jnp for jax arrays/tracers.

    Constructors call ``inverse`` eagerly; a single eager device op
    permanently degrades dispatch latency ~500x on remote-attached TPU
    runtimes (measured on axon), so host inputs stay on the host.
    """
    import jax

    if isinstance(y, (jax.Array,)) or isinstance(y, jax.core.Tracer):
        return jnp
    return np


@dataclasses.dataclass(frozen=True)
class Bijector:
    """Base class: forward maps unconstrained -> constrained."""

    def forward(self, x):
        raise NotImplementedError

    def inverse(self, y):
        raise NotImplementedError


@dataclasses.dataclass(frozen=True)
class Identity(Bijector):
    def forward(self, x):
        return x

    def inverse(self, y):
        return y


@dataclasses.dataclass(frozen=True)
class Positive(Bijector):
    """Softplus with a small lower bound, matching gpflow's ``positive()``."""

    lower: float = 1e-6

    def forward(self, x):
        return jnp.logaddexp(x, 0.0) + self.lower

    def inverse(self, y):
        xp = _xp(y)
        y = xp.maximum(xp.asarray(y) - self.lower, 1e-20)
        # softplus^{-1}(y) = y + log(1 - exp(-y)), stable for large/small y
        return y + xp.log(-xp.expm1(-y))


def positive(lower: float = 1e-6) -> Positive:
    return Positive(lower=lower)


@dataclasses.dataclass(frozen=True)
class FillTriangular(Bijector):
    """Vector of n(n+1)/2 entries <-> lower-triangular n x n matrix."""

    def forward(self, x):
        return fill_triangular(x)

    def inverse(self, y):
        return fill_triangular_inverse(y)


def triangular() -> FillTriangular:
    return FillTriangular()


@dataclasses.dataclass(frozen=True)
class Ordered(Bijector):
    """Unconstrained vector -> strictly increasing vector.

    forward: y0 = x0, y_k = y_{k-1} + exp(x_k)   (k >= 1)
    Matches ``tfp.bijectors.Invert(Ordered())`` as used by the reference for
    inducing time points (reference: markovflow/base.py:27-37,
    markovflow/models/sparse_variational.py:129).
    """

    def forward(self, x):
        first = x[..., :1]
        rest = jnp.exp(x[..., 1:])
        return jnp.cumsum(jnp.concatenate([first, rest], axis=-1), axis=-1)

    def inverse(self, y):
        xp = _xp(y)
        y = xp.asarray(y)
        first = y[..., :1]
        rest = xp.log(xp.diff(y, axis=-1))
        return xp.concatenate([first, rest], axis=-1)


def ordered() -> Ordered:
    return Ordered()
