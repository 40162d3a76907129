"""Dense spatial kernels for the spatio-temporal models.

The reference uses gpflow kernels for the spatial factor
(reference: markovflow/models/spatio_temporal_variational.py:56).  These are
small, batched Gram-matrix kernels over spatial inputs [N, D].
"""
from __future__ import annotations

import abc

import jax.numpy as jnp

from ..utils.bijectors import positive
from ..utils.module import Module, Parameter

__all__ = ["SpatialKernel", "SquaredExponential", "SpatialMatern12",
           "SpatialMatern32", "SpatialMatern52"]

SQRT3 = 1.7320508075688772
SQRT5 = 2.23606797749979


class SpatialKernel(Module, abc.ABC):
    """k(x1, x2) over spatial inputs [..., N, D]."""

    def __init__(self, lengthscale: float = 1.0, variance: float = 1.0):
        self.lengthscale = Parameter(lengthscale, transform=positive())
        self.variance = Parameter(variance, transform=positive())

    def _scaled_dist(self, x1, x2):
        x1 = x1 / self.lengthscale.value
        x2 = x2 / self.lengthscale.value
        sq = (jnp.sum(x1**2, -1)[..., :, None]
              + jnp.sum(x2**2, -1)[..., None, :]
              - 2.0 * x1 @ jnp.swapaxes(x2, -1, -2))
        return jnp.sqrt(jnp.maximum(sq, 1e-36))

    @abc.abstractmethod
    def _value(self, r):
        ...

    def __call__(self, x1, x2=None):
        """Gram matrix [..., N1, N2] (x2 defaults to x1)."""
        if x2 is None:
            x2 = x1
        return self._value(self._scaled_dist(x1, x2))

    def k_diag(self, x):
        """Diagonal k(x, x), [..., N]."""
        return jnp.broadcast_to(self.variance.value, x.shape[:-1])


class SquaredExponential(SpatialKernel):
    def _value(self, r):
        return self.variance.value * jnp.exp(-0.5 * r**2)


class SpatialMatern12(SpatialKernel):
    def _value(self, r):
        return self.variance.value * jnp.exp(-r)


class SpatialMatern32(SpatialKernel):
    def _value(self, r):
        return self.variance.value * (1 + SQRT3 * r) * jnp.exp(-SQRT3 * r)


class SpatialMatern52(SpatialKernel):
    def _value(self, r):
        return self.variance.value * (1 + SQRT5 * r + 5 * r**2 / 3.0) * \
            jnp.exp(-SQRT5 * r)
