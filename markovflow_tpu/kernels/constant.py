"""Constant kernel (reference: markovflow/kernels/constant.py:28-153)."""
from __future__ import annotations

import jax.numpy as jnp

from ..utils.bijectors import positive
from ..utils.module import Parameter
from .sde_kernel import StationaryKernel

__all__ = ["Constant"]


class Constant(StationaryKernel):
    """k(r) = sigma^2: a single random constant.  State dim 1 with A = 1,
    Q = 0 (deterministic transition), P_inf = sigma^2, F = 0."""

    def __init__(self, variance: float = 1.0, output_dim: int = 1,
                 jitter: float = 0.0):
        self.variance = Parameter(variance, transform=positive())
        super().__init__(output_dim, jitter)

    @property
    def state_dim(self) -> int:
        return 1

    @property
    def feedback_matrix(self):
        return jnp.zeros_like(self.variance.value)[..., None, None]

    @property
    def steady_state_covariance(self):
        return self.variance.value[..., None, None]

    def state_transitions(self, time_deltas):
        return jnp.ones_like(time_deltas)[..., None, None]

    def transition_statistics(self, transition_times, time_deltas):
        a_s = self.state_transitions(time_deltas)
        q_s = jnp.zeros_like(a_s) + self.jitter_matrix(a_s.dtype)
        return a_s, q_s
