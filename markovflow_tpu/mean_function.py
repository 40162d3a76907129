"""Mean functions (rebuild of markovflow/mean_function.py, 412 LoC).

The Impulse/Step coefficient recursions a_k = A_k a_{k-1} + u_k — which the
reference computes with a block-bidiagonal matrix solve
(reference: mean_function.py:196-223, 334-375) — are affine prefix recursions,
so here they run as O(log M)-depth associative scans
(:func:`markovflow_tpu.ops.scans.affine_scan`).
"""
from __future__ import annotations

import abc

import jax.numpy as jnp

from .ops.scans import affine_scan
from .utils.linalg import to_delta_time
from .utils.module import Module

__all__ = [
    "MeanFunction",
    "ZeroMeanFunction",
    "LinearMeanFunction",
    "ImpulseMeanFunction",
    "StepMeanFunction",
]


class MeanFunction(Module, abc.ABC):
    """Maps time points [..., N] to mean values [..., N, obs_dim]
    (reference: mean_function.py:28-77)."""

    @abc.abstractmethod
    def __call__(self, time_points: jnp.ndarray) -> jnp.ndarray:
        ...


class ZeroMeanFunction(MeanFunction):
    def __init__(self, obs_dim: int = 1):
        self.obs_dim = obs_dim

    def __call__(self, time_points):
        return jnp.zeros(time_points.shape + (self.obs_dim,), time_points.dtype)


class LinearMeanFunction(MeanFunction):
    """mu(t) = coefficient * t (reference: mean_function.py:80-114)."""

    def __init__(self, coefficient: float, obs_dim: int = 1):
        self.coefficient = jnp.asarray(coefficient)
        self.obs_dim = obs_dim

    def __call__(self, time_points):
        out = self.coefficient * time_points[..., None]
        return jnp.broadcast_to(out, time_points.shape + (self.obs_dim,))


class ImpulseMeanFunction(MeanFunction):
    """Mean response of the kernel SDE to impulses u_k delta(t - t_k)
    (reference: mean_function.py:118-258):

        mu(t) = exp(F (t - t_k)) a_k   for t_k < t <= t_{k+1},
        a_k = A_k a_{k-1} + u_k,  A_k = exp(F (t_k - t_{k-1})).
    """

    def __init__(self, action_times, state_perturbations, kernel):
        self.action_times = action_times  # [..., M]
        self.state_perturbations = state_perturbations  # [..., M, d]
        self.kernel = kernel

    def _coefficients(self):
        """[..., M+1, d]: a_{-1} = 0 prepended."""
        times = self.action_times
        u = self.state_perturbations
        if times.shape[-1] > 1:
            a_s = self.kernel.state_transitions(to_delta_time(times))
            zero = jnp.zeros_like(a_s[..., :1, :, :])
            f = jnp.concatenate([zero, a_s], axis=-3)
        else:
            d = u.shape[-1]
            f = jnp.zeros(u.shape[:-2] + (1, d, d), u.dtype)
        a_k = affine_scan(f, u)
        return jnp.concatenate([jnp.zeros_like(a_k[..., :1, :]), a_k], axis=-2)

    def __call__(self, time_points):
        # index of the governing impulse; 0 = "before the first impulse"
        indices = jnp.searchsorted(self.action_times, time_points)
        padded_times = jnp.concatenate(
            [self.action_times[..., :1] - 1e-6, self.action_times], axis=-1)
        deltas = time_points - jnp.take_along_axis(
            jnp.broadcast_to(padded_times,
                             time_points.shape[:-1] + padded_times.shape[-1:]),
            indices, axis=-1)
        coeff = self._coefficients()
        a_k = jnp.take_along_axis(
            jnp.broadcast_to(coeff, time_points.shape[:-1] + coeff.shape[-2:]),
            indices[..., None], axis=-2)
        trans = self.kernel.state_transitions(deltas)
        state_mean = jnp.einsum("...nij,...nj->...ni", trans, a_k)
        em = self.kernel.generate_emission_model(time_points)
        return em.project_state_to_f(state_mean)


class StepMeanFunction(MeanFunction):
    """Mean response to piecewise-constant input u(t) = u_k on (t_k, t_{k+1}]
    (reference: mean_function.py:262-412):

        mu(t) = a_k + exp(F (t - t_k)) b_k,
        a_k = -F^{-1} u_k,  b_k = A_k b_{k-1} + a_{k-1} - a_k.
    """

    def __init__(self, action_times, state_perturbations, kernel):
        self.action_times = action_times
        self.state_perturbations = state_perturbations
        self.kernel = kernel

    def _coefficients(self):
        times = self.action_times
        u = self.state_perturbations
        f_mat = self.kernel.feedback_matrix
        f_inv_u = jnp.linalg.solve(
            jnp.broadcast_to(f_mat, u.shape[:-1] + f_mat.shape[-1:]),
            u[..., None])[..., 0]
        a_k = jnp.concatenate(
            [jnp.zeros_like(f_inv_u[..., :1, :]), -f_inv_u], axis=-2)
        a_diff = a_k[..., :-1, :] - a_k[..., 1:, :]
        if times.shape[-1] > 1:
            trans = self.kernel.state_transitions(to_delta_time(times))
            zero = jnp.zeros_like(trans[..., :1, :, :])
            f = jnp.concatenate([zero, trans], axis=-3)
        else:
            d = u.shape[-1]
            f = jnp.zeros(u.shape[:-2] + (1, d, d), u.dtype)
        b_k = affine_scan(f, a_diff)
        b_k = jnp.concatenate([jnp.zeros_like(b_k[..., :1, :]), b_k], axis=-2)
        return a_k, b_k

    def __call__(self, time_points):
        indices = jnp.searchsorted(self.action_times, time_points)
        padded_times = jnp.concatenate(
            [self.action_times[..., :1], self.action_times], axis=-1)
        deltas = time_points - jnp.take_along_axis(
            jnp.broadcast_to(padded_times,
                             time_points.shape[:-1] + padded_times.shape[-1:]),
            indices, axis=-1)
        a_all, b_all = self._coefficients()
        take = lambda arr: jnp.take_along_axis(
            jnp.broadcast_to(arr, time_points.shape[:-1] + arr.shape[-2:]),
            indices[..., None], axis=-2)
        a_k, b_k = take(a_all), take(b_all)
        trans = self.kernel.state_transitions(deltas)
        state_mean = a_k + jnp.einsum("...nij,...nj->...ni", trans, b_k)
        em = self.kernel.generate_emission_model(time_points)
        return em.project_state_to_f(state_mean)
