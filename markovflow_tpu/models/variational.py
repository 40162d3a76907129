"""Variational GP with a full-rank trainable SSM posterior.

Rebuild of ``markovflow/models/variational.py`` (222 LoC): q(s) is a trainable
StateSpaceModel over the training time points,
ELBO = sum_k E_q[log p(y_k | f_k)] - KL[q || p]
(reference: variational.py:129-152).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from ..kernels import SDEKernel
from ..likelihoods import Likelihood
from ..mean_function import MeanFunction
from ..posterior import AnalyticPosteriorProcess
from ..state_space_model import StateSpaceModel
from ..utils.checks import check_observations, check_time_points
from .models import MarkovFlowModel

__all__ = ["VariationalGaussianProcess"]


class VariationalGaussianProcess(MarkovFlowModel):
    def __init__(self, input_data: Tuple[jnp.ndarray, jnp.ndarray],
                 kernel: SDEKernel, likelihood: Likelihood,
                 mean_function: Optional[MeanFunction] = None,
                 initial_distribution: Optional[StateSpaceModel] = None):
        """(reference: variational.py:29-127).  The trainable posterior is
        initialized from the prior (``create_trainable_copy`` analogue)."""
        self.time_points, self.observations = input_data
        check_time_points(self.time_points)
        check_observations(self.observations, self.time_points)
        self.kernel = kernel
        self.likelihood = likelihood
        self.mean_function = mean_function
        if initial_distribution is None:
            initial_distribution = kernel.state_space_model(self.time_points)
        self._dist_q = initial_distribution.trainable_copy()

    @property
    def dist_q(self) -> StateSpaceModel:
        return self._dist_q

    @property
    def dist_p(self) -> StateSpaceModel:
        return self.kernel.state_space_model(self.time_points)

    def with_dist_q(self, ssm: StateSpaceModel) -> "VariationalGaussianProcess":
        """Copy of this model with a new posterior SSM (for natgrad steps)."""
        return self.replace(_dist_q=ssm.trainable_copy())

    def elbo(self) -> jnp.ndarray:
        """sum VE - KL[q || p] (reference: variational.py:129-152).

        The q-marginals scan is computed ONCE and shared between the VE
        projection and the KL — each distinct scan instance is a separate
        XLA while-loop body, and the f64 natgrad compile budget is spent
        almost entirely on those bodies."""
        from ..ops.kalman import _from_tl

        dist_q = self.dist_q
        mq, pq = dist_q.marginals_tl()
        means, covs = _from_tl(mq)[..., 0], _from_tl(pq)
        emission = self.kernel.generate_emission_model(self.time_points)
        f_means, f_covs = emission.project_state_marginals_to_f(means, covs)
        if self.mean_function is not None:
            f_means = f_means + self.mean_function(self.time_points)
        ve = jnp.sum(
            self.likelihood.variational_expectations(
                f_means, f_covs, self.observations), axis=-1)
        kl = dist_q.kl_divergence(self.dist_p, marginals_tl=(mq, pq))
        return ve - kl

    def loss(self) -> jnp.ndarray:
        return -self.elbo()

    @property
    def posterior(self) -> AnalyticPosteriorProcess:
        return AnalyticPosteriorProcess(
            posterior_dist=self.dist_q.non_trainable_copy(),
            kernel=self.kernel,
            conditioning_time_points=self.time_points,
            likelihood=self.likelihood,
            mean_function=self.mean_function,
        )
