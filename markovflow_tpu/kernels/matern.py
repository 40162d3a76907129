"""Matern-family kernels (reference: markovflow/kernels/matern.py, 526 LoC).

Closed-form state transitions A(dt) = expm(F dt) — the matrix exponentials are
expanded analytically (nilpotent decomposition), so the whole time axis is one
vectorized expression.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..config import default_float
from ..utils.bijectors import positive
from ..utils.module import Parameter
from .sde_kernel import StationaryKernel

__all__ = ["Matern12", "OrnsteinUhlenbeck", "Matern32", "Matern52"]

SQRT3 = 1.7320508075688772
SQRT5 = 2.23606797749979


class Matern12(StationaryKernel):
    """Exponential kernel k(r) = sigma^2 exp(-r / ell)
    (reference: matern.py:27-126).  State dim 1: F = -1/ell, P_inf = sigma^2,
    A(dt) = exp(-dt/ell)."""

    def __init__(self, lengthscale: float = 1.0, variance: float = 1.0,
                 output_dim: int = 1, jitter: float = 0.0):
        self.lengthscale = Parameter(lengthscale, transform=positive())
        self.variance = Parameter(variance, transform=positive())
        super().__init__(output_dim, jitter)

    @property
    def state_dim(self) -> int:
        return 1

    @property
    def feedback_matrix(self):
        return (-1.0 / self.lengthscale.value)[..., None, None]

    @property
    def steady_state_covariance(self):
        return self.variance.value[..., None, None]

    def state_transitions(self, time_deltas):
        a = jnp.exp(-time_deltas / self.lengthscale.value)
        return a[..., None, None]

    def transition_statistics(self, transition_times, time_deltas):
        """Stable closed form Q = -sigma^2 expm1(-2 dt / ell): the generic
        P_inf - A P_inf A^T cancels catastrophically in float32 for small
        time steps (NaN Choleskys at T ~ 1e6)."""
        a_s = self.state_transitions(time_deltas)
        q = -self.variance.value * jnp.expm1(
            -2.0 * time_deltas / self.lengthscale.value)
        q_s = q[..., None, None] + self.jitter_matrix(a_s.dtype)
        return a_s, q_s

    def state_transitions_tl(self, time_deltas):
        return jnp.exp(-time_deltas / self.lengthscale.value)[..., None,
                                                              None, :]

    def transition_statistics_tl(self, time_deltas):
        a = self.state_transitions_tl(time_deltas)
        q = -self.variance.value * jnp.expm1(
            -2.0 * time_deltas / self.lengthscale.value)
        return a, q[..., None, None, :] + self._jitter


class OrnsteinUhlenbeck(StationaryKernel):
    """OU process in decay/diffusion parameterization: dx = -decay x dt + dB,
    q = diffusion (reference: matern.py:130-233).  F = -decay,
    P_inf = q / (2 decay)."""

    def __init__(self, decay: float = 1.0, diffusion: float = 1.0,
                 output_dim: int = 1, jitter: float = 0.0):
        self.decay = Parameter(decay, transform=positive())
        self.diffusion = Parameter(diffusion, transform=positive())
        super().__init__(output_dim, jitter)

    @property
    def state_dim(self) -> int:
        return 1

    @property
    def feedback_matrix(self):
        return (-self.decay.value)[..., None, None]

    @property
    def steady_state_covariance(self):
        return (self.diffusion.value / (2.0 * self.decay.value))[..., None, None]

    def state_transitions(self, time_deltas):
        return jnp.exp(-self.decay.value * time_deltas)[..., None, None]

    def transition_statistics(self, transition_times, time_deltas):
        a_s = self.state_transitions(time_deltas)
        p_inf = self.diffusion.value / (2.0 * self.decay.value)
        q = -p_inf * jnp.expm1(-2.0 * self.decay.value * time_deltas)
        return a_s, q[..., None, None] + self.jitter_matrix(a_s.dtype)

    def state_transitions_tl(self, time_deltas):
        return jnp.exp(-self.decay.value * time_deltas)[..., None, None, :]

    def transition_statistics_tl(self, time_deltas):
        a = self.state_transitions_tl(time_deltas)
        p_inf = self.diffusion.value / (2.0 * self.decay.value)
        q = -p_inf * jnp.expm1(-2.0 * self.decay.value * time_deltas)
        return a, q[..., None, None, :] + self._jitter


class Matern32(StationaryKernel):
    """k(r) = sigma^2 (1 + lam r) exp(-lam r), lam = sqrt(3)/ell
    (reference: matern.py:237-372).  State = (f, f'); F = [[0, 1],
    [-lam^2, -2 lam]]; A(dt) = exp(-lam dt) (I + (lam I + F) dt) since
    (lam I + F) is nilpotent; P_inf = sigma^2 diag(1, lam^2)."""

    def __init__(self, lengthscale: float = 1.0, variance: float = 1.0,
                 output_dim: int = 1, jitter: float = 0.0):
        self.lengthscale = Parameter(lengthscale, transform=positive())
        self.variance = Parameter(variance, transform=positive())
        super().__init__(output_dim, jitter)

    @property
    def state_dim(self) -> int:
        return 2

    @property
    def _lambda(self):
        return SQRT3 / self.lengthscale.value

    @property
    def feedback_matrix(self):
        lam = self._lambda
        z = jnp.zeros_like(lam)
        return jnp.stack(
            [jnp.stack([z, jnp.ones_like(lam)], -1),
             jnp.stack([-lam**2, -2.0 * lam], -1)], -2)

    @property
    def steady_state_covariance(self):
        lam = self._lambda
        var = self.variance.value
        z = jnp.zeros_like(lam)
        return jnp.stack(
            [jnp.stack([var, z], -1),
             jnp.stack([z, var * lam**2], -1)], -2)

    def state_transitions(self, time_deltas):
        a00, a01, a10, a11 = self._a_entries(time_deltas)
        return jnp.stack(
            [jnp.stack([a00, a01], -1), jnp.stack([a10, a11], -1)], -2)

    def transition_statistics(self, transition_times, time_deltas):
        """Stable closed form for Q (exact expansion of P_inf - A P_inf A^T):

            a = lam dt, e2 = exp(-2a)
            Q11 = sigma^2 (1 - e2 (1 + 2a + 2a^2))
            Q12 = sigma^2 lam (2 a^2 e2)
            Q22 = sigma^2 lam^2 (1 - e2 (1 - 2a + 2a^2))

        Q11 ~ (4/3) a^3 for small a, so the direct formula loses all float32
        precision below a ~ 0.2; a series takes over there.
        """
        q11, q12, q22 = self._q_entries(time_deltas)
        q_s = jnp.stack([
            jnp.stack([q11, q12], -1),
            jnp.stack([q12, q22], -1),
        ], -2)
        a_s = self.state_transitions(time_deltas)
        return a_s, q_s + self.jitter_matrix(a_s.dtype)

    def _a_entries(self, time_deltas):
        lam = self._lambda
        dt = time_deltas
        decay = jnp.exp(-lam * dt)
        return (decay * (1.0 + lam * dt), decay * dt,
                decay * (-(lam**2) * dt), decay * (1.0 - lam * dt))

    def _q_entries(self, time_deltas):
        lam = self._lambda
        var = self.variance.value
        a = lam * time_deltas
        e2 = jnp.exp(-2.0 * a)
        q11_direct = 1.0 - e2 * (1.0 + 2.0 * a + 2.0 * a**2)
        q11_series = a**3 * (4.0 / 3.0 + a * (-2.0 + a * (
            8.0 / 5.0 + a * (-8.0 / 9.0 + a * (
                8.0 / 21.0 + a * (-2.0 / 15.0))))))
        cutoff = 0.02 if a.dtype == jnp.float64 else 0.2
        q11 = jnp.where(a < cutoff, q11_series, q11_direct)
        q12 = 2.0 * a**2 * e2
        q22 = 1.0 - e2 * (1.0 - 2.0 * a + 2.0 * a**2)
        return var * q11, var * lam * q12, var * lam**2 * q22

    def state_transitions_tl(self, time_deltas):
        a00, a01, a10, a11 = self._a_entries(time_deltas)
        return jnp.stack([jnp.stack([a00, a01], -2),
                          jnp.stack([a10, a11], -2)], -3)

    def transition_statistics_tl(self, time_deltas):
        a_tl = self.state_transitions_tl(time_deltas)
        q11, q12, q22 = self._q_entries(time_deltas)
        q_tl = jnp.stack([jnp.stack([q11, q12], -2),
                          jnp.stack([q12, q22], -2)], -3)
        if self._jitter:
            q_tl = q_tl + self._jitter * jnp.eye(2, dtype=q_tl.dtype)[..., None]
        return a_tl, q_tl


class Matern52(StationaryKernel):
    """k(r) = sigma^2 (1 + lam r + lam^2 r^2 / 3) exp(-lam r), lam = sqrt(5)/ell
    (reference: matern.py:376-517).  State = (f, f', f''):
    F = [[0,1,0],[0,0,1],[-lam^3, -3 lam^2, -3 lam]];
    A(dt) = exp(-lam dt) (I + N dt + N^2 dt^2 / 2) with N = lam I + F nilpotent;
    P_inf = sigma^2 [[1, 0, -lam^2/3], [0, lam^2/3, 0], [-lam^2/3, 0, lam^4]]."""

    def __init__(self, lengthscale: float = 1.0, variance: float = 1.0,
                 output_dim: int = 1, jitter: float = 0.0):
        self.lengthscale = Parameter(lengthscale, transform=positive())
        self.variance = Parameter(variance, transform=positive())
        super().__init__(output_dim, jitter)

    @property
    def state_dim(self) -> int:
        return 3

    @property
    def _lambda(self):
        return SQRT5 / self.lengthscale.value

    @property
    def feedback_matrix(self):
        lam = self._lambda
        z = jnp.zeros_like(lam)
        one = jnp.ones_like(lam)
        return jnp.stack([
            jnp.stack([z, one, z], -1),
            jnp.stack([z, z, one], -1),
            jnp.stack([-lam**3, -3.0 * lam**2, -3.0 * lam], -1),
        ], -2)

    @property
    def steady_state_covariance(self):
        lam = self._lambda
        var = self.variance.value
        z = jnp.zeros_like(lam)
        k2 = var * lam**2 / 3.0
        return jnp.stack([
            jnp.stack([var, z, -k2], -1),
            jnp.stack([z, k2, z], -1),
            jnp.stack([-k2, z, var * lam**4], -1),
        ], -2)

    def state_transitions(self, time_deltas):
        lam = self._lambda
        dt = time_deltas
        decay = jnp.exp(-lam * dt)
        # N = lam I + F; A = decay * (I + N dt + N^2 dt^2/2)
        # N = [[lam,1,0],[0,lam,1],[-lam^3,-3lam^2,-2lam]] ... computed
        # symbolically below for the companion form.
        l2, l3 = lam**2, lam**3
        dt2 = dt**2
        a00 = decay * (1.0 + lam * dt + 0.5 * l2 * dt2)
        a01 = decay * (dt + lam * dt2)
        a02 = decay * 0.5 * dt2
        a10 = decay * (-0.5 * l3 * dt2)
        a11 = decay * (1.0 + lam * dt - l2 * dt2)
        a12 = decay * (dt - 0.5 * lam * dt2)
        a20 = decay * (l3 * dt * (0.5 * lam * dt - 1.0))
        a21 = decay * (l2 * dt * (lam * dt - 3.0))
        a22 = decay * (1.0 - 2.0 * lam * dt + 0.5 * l2 * dt2)
        return jnp.stack([
            jnp.stack([a00, a01, a02], -1),
            jnp.stack([a10, a11, a12], -1),
            jnp.stack([a20, a21, a22], -1),
        ], -2)
