"""Abstract Gauss-Markov distribution interface.

Mirrors the reference's ``GaussMarkovDistribution`` ABC
(reference: markovflow/gauss_markov.py:29-217) but as a pytree
:class:`~markovflow_tpu.utils.module.Module` with pure functional methods —
sampling takes an explicit PRNG key; "trainable copies" are copies whose
leaves are :class:`Parameter` (reference: gauss_markov.py:150-204).
"""
from __future__ import annotations

import abc

import jax.numpy as jnp

from .utils.module import Module

__all__ = ["GaussMarkovDistribution", "check_compatible"]


class GaussMarkovDistribution(Module, abc.ABC):
    @property
    @abc.abstractmethod
    def event_shape(self):
        """Shape of a single draw: [num_states, state_dim]."""

    @property
    @abc.abstractmethod
    def batch_shape(self):
        ...

    @property
    @abc.abstractmethod
    def state_dim(self) -> int:
        ...

    @property
    @abc.abstractmethod
    def num_transitions(self) -> int:
        ...

    @property
    @abc.abstractmethod
    def marginal_means(self) -> jnp.ndarray:
        ...

    @property
    @abc.abstractmethod
    def marginal_covariances(self) -> jnp.ndarray:
        ...

    @property
    def marginals(self):
        return self.marginal_means, self.marginal_covariances

    @abc.abstractmethod
    def covariance_blocks(self):
        """(diagonal blocks, lower off-diagonal blocks) of the joint covariance."""

    @abc.abstractmethod
    def precision(self):
        """The joint precision as a SymmetricBlockTriDiagonal."""

    @abc.abstractmethod
    def sample(self, key, sample_shape=()) -> jnp.ndarray:
        ...

    @abc.abstractmethod
    def log_pdf(self, states: jnp.ndarray) -> jnp.ndarray:
        ...

    @abc.abstractmethod
    def kl_divergence(self, other: "GaussMarkovDistribution") -> jnp.ndarray:
        """KL[self || other]."""


def check_compatible(a: GaussMarkovDistribution, b: GaussMarkovDistribution):
    """Shape compatibility check (reference: gauss_markov.py:204-217)."""
    if a.state_dim != b.state_dim:
        raise ValueError(f"state_dim mismatch: {a.state_dim} vs {b.state_dim}")
    if a.num_transitions != b.num_transitions:
        raise ValueError(
            f"num_transitions mismatch: {a.num_transitions} vs {b.num_transitions}"
        )
    if a.batch_shape != b.batch_shape:
        raise ValueError(f"batch_shape mismatch: {a.batch_shape} vs {b.batch_shape}")
