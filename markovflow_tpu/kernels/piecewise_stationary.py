"""Piecewise-stationary kernel
(reference: markovflow/kernels/piecewise_stationary.py:29-288)."""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

from ..config import APPROX_INF
from .sde_kernel import NonStationaryKernel, StationaryKernel

__all__ = ["PiecewiseKernel"]


class PiecewiseKernel(NonStationaryKernel):
    """A different stationary kernel on each inter-change-point segment.

    ``change_points`` [C] split the line into C+1 segments handled by C+1
    kernels of the *same class* (reference restriction,
    piecewise_stationary.py:126-160).  Transitions must not cross change
    points.  The reference's ``tf.dynamic_partition`` becomes a static-shape
    ``searchsorted`` + ``where``-select over all children — jittable and
    TPU-friendly (each child's stats are computed vectorized over the whole
    time axis, then gathered; C is small).
    """

    def __init__(self, kernels: Sequence[StationaryKernel],
                 change_points: jnp.ndarray, jitter: float = 0.0):
        assert len(kernels) == change_points.shape[-1] + 1
        cls = type(kernels[0])
        assert all(isinstance(k, cls) for k in kernels), \
            "PiecewiseKernel children must share a class"
        self.kernels = list(kernels)
        self.change_points = change_points
        super().__init__(output_dim=kernels[0].output_dim, jitter=jitter)

    @property
    def state_dim(self) -> int:
        return self.kernels[0].state_dim

    def _segment_index(self, time_points):
        return jnp.searchsorted(self.change_points, time_points, side="right")

    def feedback_matrices(self, time_points):
        idx = self._segment_index(time_points)
        stacked = jnp.stack([k.feedback_matrix for k in self.kernels], axis=0)
        return stacked[idx]

    def transition_statistics(self, transition_times, time_deltas):
        """Select each child's closed-form (A, Q) by the segment of the left
        endpoint."""
        idx = self._segment_index(transition_times)  # [..., N]
        a_all, q_all = [], []
        for k in self.kernels:
            a, q = k.transition_statistics(transition_times, time_deltas)
            a_all.append(a)
            q_all.append(q)
        a_all = jnp.stack(a_all, axis=0)  # [C+1, ..., N, d, d]
        q_all = jnp.stack(q_all, axis=0)
        sel = idx[None, ..., None, None] == jnp.arange(
            len(self.kernels)).reshape((-1,) + (1,) * (idx.ndim + 2))
        a_s = jnp.sum(jnp.where(sel, a_all, 0.0), axis=0)
        q_s = jnp.sum(jnp.where(sel, q_all, 0.0), axis=0)
        return a_s, q_s

    def initial_mean(self, batch_shape=()):
        return jnp.broadcast_to(
            self.kernels[0].state_mean, batch_shape + (self.state_dim,))

    def initial_covariance(self, initial_time_point):
        """P_inf of the segment containing the first time point."""
        idx = self._segment_index(initial_time_point[..., 0])
        stacked = jnp.stack(
            [k.steady_state_covariance for k in self.kernels], axis=0)
        return stacked[idx]

    def state_offsets(self, state_transitions, time_deltas,
                      transition_times=None):
        """Per-segment offsets b_k = (I - A_k) m_seg with the child state
        mean of the segment containing the transition's left endpoint
        (reference: piecewise_stationary.py:248-271 concats each child's
        ``state_offsets`` over its partition; transitions never cross change
        points, so the left endpoint determines the segment).
        """
        if transition_times is None:
            raise ValueError(
                "PiecewiseKernel.state_offsets requires transition_times "
                "(the left endpoint of each transition) to select segments.")
        idx = self._segment_index(transition_times)          # [..., N]
        means = jnp.stack([k.state_mean for k in self.kernels], axis=0)
        m = means[idx]                                       # [..., N, d]
        am = jnp.einsum("...nij,...nj->...ni", state_transitions, m)
        return m - am
