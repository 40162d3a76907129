"""SDE kernels: LTI-SDE priors discretized to state-space models.

Rebuild of the reference's ``markovflow/kernels/sde_kernel.py`` (1276 LoC).
Every kernel is a linear SDE dx = F x dt + L dW whose exact discretization on
arbitrary time points yields per-step transitions (A_k, Q_k)
(reference: sde_kernel.py:43-120).  Design differences:

* transition statistics are closed-form *batched* expressions in the time
  deltas — the whole [N] axis is vectorized, no per-step loops;
* state means are :class:`Parameter` leaves (pytree), not TF variables;
* combinators (Sum/Product/IndependentMultiOutput/Stack) compose children's
  batched (A, Q, H, F, P_inf) arrays with block_diag / Kronecker einsums.
"""
from __future__ import annotations

import abc
from typing import Callable, List, Optional, Sequence

import jax.numpy as jnp

from ..config import default_float
from ..emission_model import EmissionModel, StackEmissionModel, \
    ComposedPairEmissionModel
from ..state_space_model import StateSpaceModel
from ..utils.linalg import (
    augment_matrix,
    augment_square_matrix,
    batched_kron,
    block_diag,
    safe_cholesky,
    cholesky_or_zero,
    symmetrize,
    tlt,
    to_delta_time,
)
from ..utils.module import Parameter
from .kernel import Kernel

__all__ = [
    "SDEKernel",
    "StationaryKernel",
    "NonStationaryKernel",
    "ConcatKernel",
    "Sum",
    "Product",
    "IndependentMultiOutput",
    "FactorAnalysisKernel",
    "StackKernel",
    "IndependentMultiOutputStack",
]


class SDEKernel(Kernel, abc.ABC):
    """Base for kernels expressible as LTI SDEs (reference: sde_kernel.py:43-351)."""

    def __init__(self, output_dim: int = 1, jitter: float = 0.0):
        self._output_dim = output_dim
        self._jitter = jitter

    @property
    def output_dim(self) -> int:
        return self._output_dim

    @property
    def jitter(self) -> float:
        return self._jitter

    @property
    @abc.abstractmethod
    def state_dim(self) -> int:
        ...

    # -- pieces each concrete kernel provides --------------------------------
    @abc.abstractmethod
    def transition_statistics(self, transition_times, time_deltas):
        """(A [..., N, d, d], Q [..., N, d, d]) for the given deltas.

        ``transition_times`` are the *left* endpoints (used by non-stationary
        kernels; stationary kernels ignore them).
        (Reference: sde_kernel.py:253-282.)
        """

    @abc.abstractmethod
    def initial_mean(self, batch_shape=()) -> jnp.ndarray:
        ...

    @abc.abstractmethod
    def initial_covariance(self, initial_time_point) -> jnp.ndarray:
        """P0 at the first time point [..., d, d]."""

    def state_offsets(self, state_transitions, time_deltas,
                      transition_times=None) -> jnp.ndarray:
        """b_k, default zero (reference: sde_kernel.py:284-302).

        ``transition_times`` (the left endpoint of each transition) is only
        consulted by non-stationary kernels whose offsets vary with absolute
        time (e.g. :class:`PiecewiseKernel` segment means)."""
        d = self.state_dim
        shape = state_transitions.shape[:-2] + (d,)
        return jnp.zeros(shape, state_transitions.dtype)

    # -- assembled objects ---------------------------------------------------
    def transition_statistics_from_time_points(self, time_points):
        deltas = to_delta_time(time_points)
        return self.transition_statistics(time_points[..., :-1], deltas)

    def state_space_model(self, time_points) -> StateSpaceModel:
        """The finite-dimensional prior over states at ``time_points``
        (reference: sde_kernel.py:122-171)."""
        a_s, q_s = self.transition_statistics_from_time_points(time_points)
        deltas = to_delta_time(time_points)
        b_s = self.state_offsets(a_s, deltas,
                                 transition_times=time_points[..., :-1])
        batch_shape = time_points.shape[:-1]
        mu0 = self.initial_mean(batch_shape)
        p0 = self.initial_covariance(time_points[..., :1])
        return StateSpaceModel(
            mu0, cholesky_or_zero(p0), a_s, b_s, cholesky_or_zero(q_s)
        )

    def build_finite_distribution(self, time_points):
        return self.state_space_model(time_points)

    def generate_emission_model(self, time_points) -> EmissionModel:
        """Default H = [1 0 ... 0] per output, tiled over time
        (reference: sde_kernel.py:173-211)."""
        n = time_points.shape[-1]
        d = self.state_dim
        h_row = jnp.zeros((self.output_dim, d), default_float())
        h_row = h_row.at[:, 0].set(1.0)
        shape = time_points.shape[:-1] + (n, self.output_dim, d)
        return EmissionModel(jnp.broadcast_to(h_row, shape))

    def jitter_matrix(self, dtype=None) -> jnp.ndarray:
        return self._jitter * jnp.eye(self.state_dim, dtype=dtype or default_float())

    def __add__(self, other: "SDEKernel") -> "Sum":
        return Sum([self, other])

    def __mul__(self, other: "SDEKernel") -> "Product":
        return Product([self, other])


class StationaryKernel(SDEKernel, abc.ABC):
    """Stationary kernels: fixed feedback matrix F and steady state P_inf with
    Q_k = P_inf - A_k P_inf A_k^T (reference: sde_kernel.py:353-497)."""

    def __init__(self, output_dim: int = 1, jitter: float = 0.0,
                 state_mean: Optional[jnp.ndarray] = None):
        super().__init__(output_dim, jitter)
        if state_mean is None:
            state_mean = jnp.zeros((self.state_dim,), default_float())
        self._state_mean = Parameter(state_mean, trainable=False)

    @property
    def state_mean(self) -> jnp.ndarray:
        return self._state_mean.value

    def set_state_mean(self, state_mean, trainable: bool = True):
        """Return a copy with a (trainable) state mean
        (reference: sde_kernel.py:364-400)."""
        new = self.replace(_state_mean=Parameter(state_mean, trainable=trainable))
        return new

    @property
    @abc.abstractmethod
    def feedback_matrix(self) -> jnp.ndarray:
        """F in dx = F x dt + L dW, [d, d] (reference: sde_kernel.py:477-497)."""

    @property
    @abc.abstractmethod
    def steady_state_covariance(self) -> jnp.ndarray:
        """P_inf [d, d] (reference: sde_kernel.py:402-419)."""

    @abc.abstractmethod
    def state_transitions(self, time_deltas) -> jnp.ndarray:
        """A(dt) = expm(F dt) in closed form, batched over deltas [..., N]."""

    def transition_statistics(self, transition_times, time_deltas):
        a_s = self.state_transitions(time_deltas)
        p_inf = self.steady_state_covariance
        q_s = symmetrize(p_inf - a_s @ p_inf @ tlt(a_s))
        q_s = q_s + self.jitter_matrix(q_s.dtype)
        return a_s, q_s

    def initial_mean(self, batch_shape=()):
        return jnp.broadcast_to(self.state_mean, batch_shape + (self.state_dim,))

    def initial_covariance(self, initial_time_point):
        p0 = self.steady_state_covariance + self.jitter_matrix()
        shape = initial_time_point.shape[:-1] + (self.state_dim, self.state_dim)
        return jnp.broadcast_to(p0, shape)

    def state_offsets(self, state_transitions, time_deltas,
                      transition_times=None):
        """b_k = (I - A_k) m so the stationary mean is preserved
        (reference: sde_kernel.py:460-475)."""
        m = self.state_mean
        eye = jnp.eye(self.state_dim, dtype=state_transitions.dtype)
        return jnp.einsum("...nij,j->...ni", eye - state_transitions, m)


    # ------------------------------------------------------------------
    # Time-last (TL) fast path.  On TPU a materialized [N, d, d] array is
    # tile-padded to (8, 128) per step (4 GB at N = 1e6, d = 2); the filter
    # pipeline therefore consumes [d, d, N] arrays with the long axis on the
    # vector lanes.  Subclasses override `state_transitions_tl` /
    # `transition_statistics_tl` with natively TL expressions; the defaults
    # transpose the standard-layout results (correct everywhere, fast only
    # when XLA manages to fuse the transpose away).
    # ------------------------------------------------------------------
    def state_transitions_tl(self, time_deltas) -> jnp.ndarray:
        """A(dt) in TL layout [..., d, d, N]."""
        return jnp.moveaxis(self.state_transitions(time_deltas), -3, -1)

    def transition_statistics_tl(self, time_deltas):
        """(A, Q) in TL layout [..., d, d, N]."""
        a = self.state_transitions_tl(time_deltas)
        d = self.state_dim
        p_stat = self.steady_state_covariance
        p_inf = p_stat[..., None]
        # Unrolled (A P_inf) and (A P_inf) A^T: einsum's dot_general with a
        # trailing batch dim relayouts to time-middle on TPU (tile-padded
        # tiny blocks; measured 223x slower at T = 1e6 — see ops.kalman._mm_tl).
        ap = jnp.stack([
            jnp.stack([
                sum(a[..., i, j, :] * p_stat[..., j, k] for j in range(d))
                for k in range(d)], axis=-2)
            for i in range(d)], axis=-3)
        apa = jnp.stack([
            jnp.stack([
                sum(ap[..., i, j, :] * a[..., k, j, :] for j in range(d))
                for k in range(d)], axis=-2)
            for i in range(d)], axis=-3)
        q = p_inf - apa
        q = 0.5 * (q + jnp.swapaxes(q, -3, -2))
        if self._jitter:
            q = q + self._jitter * jnp.eye(self.state_dim,
                                           dtype=q.dtype)[..., None]
        return a, q

    def prior_arrays_tl(self, time_points):
        """(F [..., d, d, N], c [..., d, 1, N], Q [..., d, d, N]) with element
        0 encoding the initial distribution — the TL analogue of
        StateSpaceModel._prefix_elements."""
        deltas = to_delta_time(time_points)
        a, q = self.transition_statistics_tl(deltas)
        d = self.state_dim
        zero = jnp.zeros(a.shape[:-1] + (1,), a.dtype)
        f_tl = jnp.concatenate([zero[..., :, :, :], a], axis=-1)
        p0 = (self.steady_state_covariance
              + self._jitter * jnp.eye(d, dtype=a.dtype))[..., None]
        q_tl = jnp.concatenate([jnp.broadcast_to(p0, a.shape[:-1] + (1,)), q],
                               axis=-1)
        m = self.state_mean
        # b_k = (I - A_k) m ; c_0 = m  (unrolled: see transition_statistics_tl)
        am = jnp.stack([
            sum(a[..., i, j, :] * m[..., j, None] for j in range(d))
            for i in range(d)], axis=-2)
        b = m[..., None] - am
        c0 = jnp.broadcast_to(m[..., None], b.shape[:-1] + (1,))
        c_tl = jnp.concatenate([c0, b], axis=-1)[..., :, None, :]
        return f_tl, c_tl, q_tl

    def prior_const_tl(self, dt):
        """Constant prior-step arrays for a UNIFORM time grid: with one
        time delta ``dt`` [..., 1], every transition k >= 1 shares
        (Fc, cc, Qc) and element 0 is the prior (mu0, P0) — the compressed
        representation consumed by
        :func:`markovflow_tpu.ops.adjoint.log_likelihood_koopman_uniform`
        (no [d, d, N] array is ever materialized).

        Returns (Fc [..., d, d, 1], cc [..., d, 1, 1], Qc [..., d, d, 1],
        mu0 [..., d, 1, 1], P0 [..., d, d, 1]).
        """
        a, q = self.transition_statistics_tl(dt)
        d = self.state_dim
        m = self.state_mean
        am = jnp.stack([
            sum(a[..., i, j, :] * m[..., j, None] for j in range(d))
            for i in range(d)], axis=-2)
        cc = (m[..., None] - am)[..., :, None, :]
        mu0 = jnp.broadcast_to(m[..., None, None],
                               m.shape[:-1] + (d, 1, 1))
        p0 = (self.steady_state_covariance
              + self._jitter * jnp.eye(d, dtype=a.dtype))[..., None]
        return a, cc, q, mu0, p0


class NonStationaryKernel(SDEKernel, abc.ABC):
    """Non-stationary kernels with time-dependent feedback
    (reference: sde_kernel.py:499-536)."""

    @abc.abstractmethod
    def feedback_matrices(self, time_points) -> jnp.ndarray:
        """F(t) [..., N, d, d]."""


class ConcatKernel(StationaryKernel, abc.ABC):
    """State concatenation of child kernels: block-diagonal A, F, P_inf
    (reference: sde_kernel.py:540-656)."""

    def __init__(self, kernels: Sequence[StationaryKernel], jitter: float = 0.0,
                 output_dim: Optional[int] = None):
        self.kernels = list(kernels)
        out = output_dim if output_dim is not None else self.kernels[0].output_dim
        super().__init__(output_dim=out, jitter=jitter)

    @property
    def state_dim(self) -> int:
        return sum(k.state_dim for k in self.kernels)

    @property
    def feedback_matrix(self):
        return block_diag([k.feedback_matrix for k in self.kernels])

    @property
    def steady_state_covariance(self):
        return block_diag([k.steady_state_covariance for k in self.kernels])

    @property
    def state_mean(self):
        return jnp.concatenate([k.state_mean for k in self.kernels], axis=-1)

    def state_transitions(self, time_deltas):
        return block_diag([k.state_transitions(time_deltas) for k in self.kernels])


class Sum(ConcatKernel):
    """f = sum_i f_i: emission is the horizontal concat of children's H
    (reference: sde_kernel.py:660-687)."""

    def generate_emission_model(self, time_points):
        h = jnp.concatenate(
            [k.generate_emission_model(time_points).emission_matrix
             for k in self.kernels],
            axis=-1,
        )
        return EmissionModel(h)


class IndependentMultiOutput(ConcatKernel):
    """One independent latent per output: H = H_1 (+) H_2 (+) ... (direct sum)
    (reference: sde_kernel.py:826-877)."""

    def __init__(self, kernels: Sequence[StationaryKernel], jitter: float = 0.0):
        super().__init__(kernels, jitter=jitter, output_dim=len(kernels))

    def generate_emission_model(self, time_points):
        mats = [k.generate_emission_model(time_points).emission_matrix
                for k in self.kernels]
        return EmissionModel(block_diag(mats))


class Product(StationaryKernel):
    """Product kernel: Kronecker-structured state space
    (reference: sde_kernel.py:691-822)."""

    def __init__(self, kernels: Sequence[StationaryKernel], jitter: float = 0.0):
        self.kernels = list(kernels)
        super().__init__(output_dim=self.kernels[0].output_dim, jitter=jitter)

    @property
    def state_dim(self) -> int:
        out = 1
        for k in self.kernels:
            out *= k.state_dim
        return out

    @property
    def feedback_matrix(self):
        """Kronecker sum: F = sum_i I (x) ... F_i ... (x) I."""
        total = None
        for i, k in enumerate(self.kernels):
            mat = None
            for j, kj in enumerate(self.kernels):
                term = (k.feedback_matrix if j == i
                        else jnp.eye(kj.state_dim, dtype=default_float()))
                mat = term if mat is None else batched_kron(mat, term)
            total = mat if total is None else total + mat
        return total

    @property
    def steady_state_covariance(self):
        out = None
        for k in self.kernels:
            p = k.steady_state_covariance
            out = p if out is None else batched_kron(out, p)
        return out

    def state_transitions(self, time_deltas):
        out = None
        for k in self.kernels:
            a = k.state_transitions(time_deltas)
            out = a if out is None else batched_kron(out, a)
        return out

    def generate_emission_model(self, time_points):
        h = None
        for k in self.kernels:
            hk = k.generate_emission_model(time_points).emission_matrix
            h = hk if h is None else batched_kron(h, hk)
        return EmissionModel(h)


class FactorAnalysisKernel(StationaryKernel):
    """f_i = sum_jk A_ij(t) B_jk g_k(t): latent GPs mixed by a trainable
    loading matrix B and a deterministic weight function A(t)
    (reference: sde_kernel.py:881-941)."""

    def __init__(self, weight_fn: Callable, kernels: Sequence[StationaryKernel],
                 output_dim: int, trainable_loading: bool = True,
                 loading: Optional[jnp.ndarray] = None, jitter: float = 0.0):
        self._inner = IndependentMultiOutput(kernels, jitter=jitter)
        self.weight_fn = weight_fn  # t -> [..., N, output_dim, n_latents]
        n_latents = len(kernels)
        if loading is None:
            loading = jnp.eye(output_dim, n_latents, dtype=default_float())
        self._loading = Parameter(loading, trainable=trainable_loading)
        super().__init__(output_dim=output_dim, jitter=jitter)

    @property
    def loading(self):
        return self._loading.value

    @property
    def state_dim(self):
        return self._inner.state_dim

    @property
    def feedback_matrix(self):
        return self._inner.feedback_matrix

    @property
    def steady_state_covariance(self):
        return self._inner.steady_state_covariance

    def state_transitions(self, time_deltas):
        return self._inner.state_transitions(time_deltas)

    def generate_emission_model(self, time_points):
        inner = self._inner.generate_emission_model(time_points)
        weights = self.weight_fn(time_points)  # [..., N, out, latents]
        outer = EmissionModel(weights @ self.loading)
        return ComposedPairEmissionModel(outer, inner)


class StackKernel(StationaryKernel):
    """Stack children along a trailing batch ('num_kernels') dimension with
    zero/identity padding to a common state dim
    (reference: sde_kernel.py:945-1202)."""

    def __init__(self, kernels: Sequence[StationaryKernel], jitter: float = 0.0):
        self.kernels = list(kernels)
        super().__init__(output_dim=len(kernels), jitter=jitter)

    @property
    def num_kernels(self) -> int:
        return len(self.kernels)

    @property
    def state_dim(self) -> int:
        return max(k.state_dim for k in self.kernels)

    def _stack(self, mats: List[jnp.ndarray], fill_zeros: bool) -> jnp.ndarray:
        d = self.state_dim
        padded = [
            augment_square_matrix(m, d - m.shape[-1], fill_zeros=fill_zeros)
            for m in mats
        ]
        return jnp.stack(padded, axis=-3)

    @property
    def feedback_matrix(self):
        return self._stack([k.feedback_matrix for k in self.kernels],
                           fill_zeros=True)

    @property
    def steady_state_covariance(self):
        # identity padding keeps the padded dims valid (unit variance, unused)
        return self._stack([k.steady_state_covariance for k in self.kernels],
                           fill_zeros=False)

    @property
    def state_mean(self):
        d = self.state_dim
        means = [
            jnp.pad(k.state_mean, (0, d - k.state_mean.shape[-1]))
            for k in self.kernels
        ]
        return jnp.stack(means, axis=0)  # [num_kernels, d]

    def state_transitions(self, time_deltas):
        """time_deltas [..., num_kernels, N] -> A [..., num_kernels, N, d, d].

        The trailing batch dim of the time points must equal num_kernels
        (reference: sde_kernel.py:1014-1034)."""
        d = self.state_dim
        mats = []
        for i, k in enumerate(self.kernels):
            a = k.state_transitions(time_deltas[..., i, :])
            # zero padding: padded dims become independent unit-variance noise
            # (P_inf pads with identity), keeping Q nonsingular
            mats.append(augment_square_matrix(a, d - a.shape[-1],
                                              fill_zeros=True))
        return jnp.stack(mats, axis=-4)

    def transition_statistics(self, transition_times, time_deltas):
        a_s = self.state_transitions(time_deltas)
        p_inf = self.steady_state_covariance[..., :, None, :, :]
        q_s = symmetrize(p_inf - a_s @ p_inf @ tlt(a_s))
        return a_s, q_s + self.jitter_matrix(q_s.dtype)

    def initial_mean(self, batch_shape=()):
        # batch_shape already ends with num_kernels
        m = self.state_mean  # [K, d]
        return jnp.broadcast_to(m, batch_shape + (self.state_dim,))

    def initial_covariance(self, initial_time_point):
        p = self.steady_state_covariance  # [K, d, d]
        shape = initial_time_point.shape[:-1] + (self.state_dim, self.state_dim)
        return jnp.broadcast_to(p, shape) + self.jitter_matrix()

    def state_offsets(self, state_transitions, time_deltas,
                      transition_times=None):
        m = self.state_mean  # [K, d]
        eye = jnp.eye(self.state_dim, dtype=state_transitions.dtype)
        return jnp.einsum("...knij,kj->...kni", eye - state_transitions, m)

    def generate_emission_model(self, time_points):
        """time_points [..., num_kernels, N] -> StackEmissionModel with
        emission [..., num_kernels, N, 1, d].  Each row is the child's own
        (stationary) emission row zero-padded to the common state dim, so
        composite children (Sum/Product) emit correctly."""
        n = time_points.shape[-1]
        d = self.state_dim
        probe = jnp.zeros((1,), default_float())
        rows = []
        for k in self.kernels:
            h_child = k.generate_emission_model(probe).emission_matrix[0]
            rows.append(augment_matrix(h_child, d - h_child.shape[-1]))
        h_all = jnp.stack(rows, axis=0)[..., :, None, :, :]  # [K, 1, 1, d]
        shape = time_points.shape[:-1] + (n, 1, d)
        return StackEmissionModel(jnp.broadcast_to(h_all, shape))


class IndependentMultiOutputStack(StackKernel):
    """Stack of independent outputs with elementwise +/* of stacks
    (reference: sde_kernel.py:1205-1276)."""

    def __add__(self, other):
        if isinstance(other, IndependentMultiOutputStack):
            assert self.num_kernels == other.num_kernels
            return IndependentMultiOutputStack(
                [Sum([a, b]) for a, b in zip(self.kernels, other.kernels)],
                jitter=self._jitter,
            )
        return NotImplemented

    def __mul__(self, other):
        if isinstance(other, IndependentMultiOutputStack):
            assert self.num_kernels == other.num_kernels
            return IndependentMultiOutputStack(
                [Product([a, b]) for a, b in zip(self.kernels, other.kernels)],
                jitter=self._jitter,
            )
        return NotImplemented
