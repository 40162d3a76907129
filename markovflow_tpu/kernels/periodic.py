"""Harmonic oscillator (periodic) kernel
(reference: markovflow/kernels/periodic.py:27-203)."""
from __future__ import annotations

import jax.numpy as jnp

from ..utils.bijectors import positive
from ..utils.module import Parameter
from .sde_kernel import StationaryKernel

__all__ = ["HarmonicOscillator"]


class HarmonicOscillator(StationaryKernel):
    """k(r) = sigma^2 cos(2 pi r / p): deterministic rotation in state space.

    State dim 2: A(dt) = [[cos, -sin], [sin, cos]](lam dt) with lam = 2 pi / p,
    Q = 0, P_inf = sigma^2 I, F = [[0, -lam], [lam, 0]]."""

    def __init__(self, variance: float = 1.0, period: float = 1.0,
                 output_dim: int = 1, jitter: float = 0.0):
        self.variance = Parameter(variance, transform=positive())
        self.period = Parameter(period, transform=positive())
        super().__init__(output_dim, jitter)

    @property
    def state_dim(self) -> int:
        return 2

    @property
    def _lambda(self):
        return 2.0 * jnp.pi / self.period.value

    @property
    def feedback_matrix(self):
        lam = self._lambda
        z = jnp.zeros_like(lam)
        return jnp.stack(
            [jnp.stack([z, -lam], -1), jnp.stack([lam, z], -1)], -2)

    @property
    def steady_state_covariance(self):
        var = self.variance.value
        z = jnp.zeros_like(var)
        return jnp.stack(
            [jnp.stack([var, z], -1), jnp.stack([z, var], -1)], -2)

    def state_transitions(self, time_deltas):
        ang = self._lambda * time_deltas
        c, s = jnp.cos(ang), jnp.sin(ang)
        return jnp.stack(
            [jnp.stack([c, -s], -1), jnp.stack([s, c], -1)], -2)

    def transition_statistics(self, transition_times, time_deltas):
        a_s = self.state_transitions(time_deltas)
        q_s = jnp.zeros_like(a_s) + self.jitter_matrix(a_s.dtype)
        return a_s, q_s
