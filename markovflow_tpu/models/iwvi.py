"""Importance-weighted variational inference (IWVI).

Rebuild of ``markovflow/models/iwvi.py`` (173 LoC): an SVGP-style model whose
bound is the importance-weighted ELBO ``log (1/K) sum_k w_k``
(reference: iwvi.py:109-141), plus the DREGS variance-controlled surrogate
for variational-parameter gradients (reference: iwvi.py:143-173).

Functional twist: sampling-based objectives take an explicit PRNG key.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..kernels import SDEKernel
from ..likelihoods import Likelihood
from ..mean_function import MeanFunction
from ..posterior import ImportanceWeightedPosteriorProcess
from ..state_space_model import StateSpaceModel
from ..utils.bijectors import ordered
from ..utils.module import Parameter
from .models import MarkovFlowSparseModel

__all__ = ["ImportanceWeightedVI"]


class ImportanceWeightedVI(MarkovFlowSparseModel):
    def __init__(self, kernel: SDEKernel, inducing_points: jnp.ndarray,
                 likelihood: Likelihood, num_importance_samples: int,
                 mean_function: Optional[MeanFunction] = None,
                 initial_distribution: Optional[StateSpaceModel] = None):
        self.kernel = kernel
        self.likelihood = likelihood
        self.mean_function = mean_function
        self.num_importance_samples = num_importance_samples
        self._inducing_points = Parameter(inducing_points, transform=ordered(),
                                          trainable=False)
        if initial_distribution is None:
            initial_distribution = kernel.build_finite_distribution(
                inducing_points)
        self._dist_q = initial_distribution.trainable_copy()

    @property
    def inducing_inputs(self):
        return self._inducing_points.value

    @property
    def dist_q(self) -> StateSpaceModel:
        return self._dist_q

    @property
    def dist_p(self) -> StateSpaceModel:
        return self.kernel.state_space_model(self.inducing_inputs)

    def with_dist_q(self, ssm: StateSpaceModel):
        return self.replace(_dist_q=ssm.trainable_copy())

    @property
    def posterior(self) -> ImportanceWeightedPosteriorProcess:
        return ImportanceWeightedPosteriorProcess(
            self.num_importance_samples,
            self.dist_q,
            self.kernel,
            self.inducing_inputs,
            self.likelihood,
            self.mean_function,
        )

    def elbo(self, input_data: Tuple[jnp.ndarray, jnp.ndarray], key
             ) -> jnp.ndarray:
        """IW-ELBO = logsumexp_k(log w_k) - log K (reference: iwvi.py:109-141)."""
        time_points, _ = input_data
        k = self.num_importance_samples
        posterior = self.posterior
        s, u = posterior.proposal_process.sample_state_trajectories(
            time_points, (k,), key)
        log_w = posterior.log_importance_weights(s, u, input_data)
        return jax.nn.logsumexp(log_w, axis=0) - jnp.log(
            jnp.asarray(float(k), log_w.dtype))

    def dregs_objective(self, input_data, key) -> jnp.ndarray:
        """Surrogate whose gradient is the DREGS estimator
        (reference: iwvi.py:143-173)."""
        time_points, _ = input_data
        k = self.num_importance_samples
        posterior = self.posterior
        s, u = posterior.proposal_process.sample_state_trajectories(
            time_points, (k,), key)
        log_w = posterior.log_importance_weights(s, u, input_data,
                                                 stop_gradient=True)
        norm_w = jax.lax.stop_gradient(jax.nn.softmax(log_w, axis=0))
        return jnp.sum(norm_w**2 * log_w)

    def loss(self, input_data, key) -> jnp.ndarray:
        return -self.elbo(input_data, key)

    def predict_log_density(self, input_data):
        x, y = input_data
        f_mu, f_var = self.posterior.predict_f(x)
        return self.likelihood.predict_density(f_mu, f_var, y)
