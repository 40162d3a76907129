"""Model base classes (reference: markovflow/models/models.py:35-227)."""
from __future__ import annotations

import abc

import jax.numpy as jnp

from ..posterior import PosteriorProcess
from ..utils.module import Module, log_prior_density

__all__ = ["MarkovFlowModel", "MarkovFlowSparseModel"]


class MarkovFlowModel(Module, abc.ABC):
    """Uniform model surface: loss() for training, posterior for prediction
    (reference: models.py:35-144)."""

    @abc.abstractmethod
    def loss(self) -> jnp.ndarray:
        ...

    @property
    @abc.abstractmethod
    def posterior(self) -> PosteriorProcess:
        ...

    def log_prior_density(self) -> jnp.ndarray:
        """Sum of hyperparameter prior log densities
        (reference: models.py; zero when no priors are set)."""
        return log_prior_density(self)

    def predict_state(self, new_time_points):
        return self.posterior.predict_state(new_time_points)

    def predict_f(self, new_time_points, full_output_cov: bool = False):
        return self.posterior.predict_f(new_time_points, full_output_cov)


class MarkovFlowSparseModel(MarkovFlowModel, abc.ABC):
    """Adds data-dependent evaluation (minibatching) and predictive densities
    (reference: models.py:146-227)."""

    def predict_log_density(self, input_data):
        time_points, observations = input_data
        f_means, f_covs = self.predict_f(time_points)
        return self.likelihood.predict_density(f_means, f_covs, observations)
