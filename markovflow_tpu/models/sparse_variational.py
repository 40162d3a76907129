"""Sparse variational GP with inducing states.

Rebuild of ``markovflow/models/sparse_variational.py`` (270 LoC): a trainable
SSM posterior over states at M inducing time points; data enters only through
the conditional marginals q(f(x)) (O(M) state cost, O(N) projection cost),
with minibatch scaling (reference: sparse_variational.py:149-192).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from ..kernels import SDEKernel
from ..likelihoods import Likelihood
from ..mean_function import MeanFunction
from ..posterior import AnalyticPosteriorProcess
from ..state_space_model import StateSpaceModel
from ..utils.bijectors import ordered
from ..utils.module import Parameter
from .models import MarkovFlowSparseModel

__all__ = ["SparseVariationalGaussianProcess"]


class SparseVariationalGaussianProcess(MarkovFlowSparseModel):
    def __init__(self, kernel: SDEKernel, likelihood: Likelihood,
                 inducing_points: jnp.ndarray,
                 mean_function: Optional[MeanFunction] = None,
                 num_data: Optional[int] = None,
                 initial_distribution: Optional[StateSpaceModel] = None,
                 trainable_inducing_points: bool = False):
        """(reference: sparse_variational.py:99-147).  Inducing points are
        constrained ordered (reference: :129)."""
        self.kernel = kernel
        self.likelihood = likelihood
        self.mean_function = mean_function
        self.num_data = num_data
        self._inducing_points = Parameter(
            inducing_points, transform=ordered(),
            trainable=trainable_inducing_points)
        if initial_distribution is None:
            initial_distribution = kernel.build_finite_distribution(
                inducing_points)
        self._dist_q = initial_distribution.trainable_copy()

    @property
    def inducing_inputs(self) -> jnp.ndarray:
        return self._inducing_points.value

    @property
    def time_points(self) -> jnp.ndarray:
        return self.inducing_inputs

    @property
    def dist_q(self) -> StateSpaceModel:
        return self._dist_q

    @property
    def dist_p(self) -> StateSpaceModel:
        return self.kernel.state_space_model(self.inducing_inputs)

    def with_dist_q(self, ssm: StateSpaceModel):
        return self.replace(_dist_q=ssm.trainable_copy())

    @property
    def posterior(self) -> AnalyticPosteriorProcess:
        return AnalyticPosteriorProcess(
            posterior_dist=self.dist_q.non_trainable_copy(),
            kernel=self.kernel,
            conditioning_time_points=self.inducing_inputs,
            likelihood=self.likelihood,
            mean_function=self.mean_function,
        )

    def elbo(self, input_data: Tuple[jnp.ndarray, jnp.ndarray]) -> jnp.ndarray:
        """VE(q(f(x))) * scale - KL[q(s(z)) || p(s(z))]
        (reference: sparse_variational.py:149-192)."""
        x, y = input_data
        f_mu, f_var = self.posterior.predict_f(x)
        ve = jnp.sum(self.likelihood.variational_expectations(f_mu, f_var, y))
        kl = jnp.sum(self.dist_q.kl_divergence(self.dist_p))
        if self.num_data is not None:
            scale = jnp.asarray(self.num_data, f_mu.dtype) / x.shape[-1]
        else:
            scale = 1.0
        return ve * scale - kl

    def loss(self, input_data) -> jnp.ndarray:
        return -self.elbo(input_data)

    def predict_log_density(self, input_data):
        x, y = input_data
        f_mu, f_var = self.posterior.predict_f(x)
        return self.likelihood.predict_density(f_mu, f_var, y)
