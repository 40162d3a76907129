"""Kernel abstract base (reference: markovflow/kernels/kernel.py:27-97)."""
from __future__ import annotations

import abc

import jax.numpy as jnp

from ..emission_model import EmissionModel
from ..gauss_markov import GaussMarkovDistribution
from ..utils.module import Module

__all__ = ["Kernel"]


class Kernel(Module, abc.ABC):
    """A kernel defined by a finite-dimensional Gauss-Markov distribution over
    states at given time points plus an emission model projecting states to
    function values."""

    @abc.abstractmethod
    def build_finite_distribution(
        self, time_points: jnp.ndarray
    ) -> GaussMarkovDistribution:
        ...

    @abc.abstractmethod
    def generate_emission_model(self, time_points: jnp.ndarray) -> EmissionModel:
        ...

    @property
    @abc.abstractmethod
    def output_dim(self) -> int:
        ...
