"""Latent Exponentially Generated (LEG) kernel, Loper et al. 2020
(reference: markovflow/kernels/latent_exp_generated.py:29-142)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import default_float
from ..emission_model import EmissionModel
from ..utils.module import Parameter
from .sde_kernel import StationaryKernel

__all__ = ["LatentExponentiallyGenerated"]


class LatentExponentiallyGenerated(StationaryKernel):
    """F = -1/2 (N N^T + R - R^T), P_inf = I, emission H = B.

    ``N`` and ``R`` are free [d, d] matrices; the construction guarantees
    stability.  A(dt) = expm(F dt) via ``jax.scipy.linalg.expm``, vmapped over
    the time axis (no closed form in general)."""

    def __init__(self, N: jnp.ndarray, R: jnp.ndarray,
                 B: jnp.ndarray = None, jitter: float = 0.0):
        self.N = Parameter(jnp.asarray(N, default_float()))
        self.R = Parameter(jnp.asarray(R, default_float()))
        d = self.N.value.shape[-1]
        if B is None:
            B = jnp.eye(d, dtype=default_float())
        self.B = Parameter(jnp.asarray(B, default_float()))
        super().__init__(output_dim=self.B.value.shape[-2], jitter=jitter)

    @property
    def state_dim(self) -> int:
        return self.N.value.shape[-1]

    @property
    def feedback_matrix(self):
        n, r = self.N.value, self.R.value
        return -0.5 * (n @ jnp.swapaxes(n, -1, -2) + r - jnp.swapaxes(r, -1, -2))

    @property
    def steady_state_covariance(self):
        return jnp.eye(self.state_dim, dtype=self.N.value.dtype)

    def state_transitions(self, time_deltas):
        f = self.feedback_matrix
        flat = time_deltas.reshape(-1)
        mats = jax.vmap(lambda dt: jax.scipy.linalg.expm(f * dt))(flat)
        return mats.reshape(time_deltas.shape + f.shape[-2:])

    def generate_emission_model(self, time_points):
        n = time_points.shape[-1]
        shape = time_points.shape[:-1] + (n, self.output_dim, self.state_dim)
        return EmissionModel(jnp.broadcast_to(self.B.value, shape))
