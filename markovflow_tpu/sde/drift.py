"""Linear drift <-> state-space model conversions
(reference: markovflow/sde/drift.py:24-108)."""
from __future__ import annotations

import jax.numpy as jnp

from ..state_space_model import StateSpaceModel
from ..utils.module import Module

__all__ = ["LinearDrift"]


class LinearDrift(Module):
    """f(x, t) = A_t x + b_t.

    A [..., N, d, d]; b [..., N, d].  Functional: conversions return new
    objects instead of mutating.
    """

    def __init__(self, A=None, b=None):
        self.A = A
        self.b = b

    @classmethod
    def from_ssm(cls, ssm: StateSpaceModel, dt: float) -> "LinearDrift":
        """First-order expm approximation: A = (A_ssm - I)/dt, b = b_ssm/dt
        (reference: drift.py:38-61)."""
        eye = jnp.eye(ssm.state_dim, dtype=ssm.dtype)
        return cls(A=(ssm.state_transitions - eye) / dt,
                   b=ssm.state_offsets / dt)

    def set_from_ssm(self, ssm: StateSpaceModel, dt: float) -> "LinearDrift":
        """Reference-named alias of :meth:`from_ssm` (returns a new object)."""
        return LinearDrift.from_ssm(ssm, dt)

    def to_ssm(self, q, transition_times, initial_mean,
               initial_chol_covariance) -> StateSpaceModel:
        """First-order discretization: A_ssm = I + A dt, b_ssm = b dt,
        chol Q = l sqrt(dt) with l the diffusion Cholesky
        (reference: drift.py:63-108)."""
        if self.A is None or self.b is None:
            raise ValueError("LinearDrift is empty; cannot build an SSM")
        deltas = jnp.diff(transition_times)[..., :, None]
        eye = jnp.eye(self.A.shape[-1], dtype=self.A.dtype)
        state_transitions = self.A * deltas[..., None] + eye
        state_offsets = self.b * deltas
        chol_process_covariances = q * jnp.sqrt(deltas[..., None])
        return StateSpaceModel(
            initial_mean=initial_mean,
            chol_initial_covariance=initial_chol_covariance,
            state_transitions=state_transitions,
            state_offsets=state_offsets,
            chol_process_covariances=chol_process_covariances,
        )
