"""Sparse Power Expectation Propagation with pair-of-inducing-state sites.

Rebuild of ``markovflow/models/sparse_pep.py`` (559 LoC).  Sites t_m(v_m) sit
on consecutive inducing-state pairs; each data point x_k in interval m owns a
site *fraction* 1/c(m) (c = points per interval), the cavity removes an
alpha-fraction of it from the pairwise marginals, and updates are projected
back through the conditional p(f_k | v_m) = N(H P v_m, ...)
(reference: sparse_pep.py:176-380).

The reference's per-interval python loop for leave-one-out normalizers
(reference: sparse_pep.py:417-434) becomes one vmapped batch of posterior
SSMs.  ``update_sites`` returns a new model (functional).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..conditionals import (
    base_conditional_predict,
    conditional_statistics,
    pairwise_marginals,
)
from ..kernels import SDEKernel
from ..likelihoods import PEPScalarLikelihood
from ..mean_function import MeanFunction
from ..posterior import AnalyticPosteriorProcess
from ..state_space_model import StateSpaceModel
from ..utils.bijectors import ordered
from ..utils.linalg import small_inv, symmetrize
from ..utils.module import Parameter
from .models import MarkovFlowSparseModel
from .pep import gradient_correction
from .sparse_variational_cvi import pair_site_posterior
from .variational_cvi import back_project_nats

__all__ = ["SparsePowerExpectationPropagation"]


class SparsePowerExpectationPropagation(MarkovFlowSparseModel):
    def __init__(self, kernel: SDEKernel, inducing_points: jnp.ndarray,
                 likelihood: PEPScalarLikelihood,
                 mean_function: Optional[MeanFunction] = None,
                 learning_rate: float = 1.0, alpha: float = 1.0,
                 nat1=None, nat2=None, log_norm=None):
        self.kernel = kernel
        self.likelihood = likelihood
        self.mean_function = mean_function
        self.learning_rate = learning_rate
        self.alpha = alpha
        self._inducing_points = Parameter(inducing_points, transform=ordered(),
                                          trainable=False)
        m = inducing_points.shape[-1]
        d = kernel.state_dim
        dtype = jnp.asarray(inducing_points).dtype
        if nat1 is None:
            nat1 = jnp.zeros((m + 1, 2 * d), dtype)
        if nat2 is None:
            nat2 = -1e-10 * jnp.broadcast_to(
                jnp.eye(2 * d, dtype=dtype), (m + 1, 2 * d, 2 * d))
        if log_norm is None:
            log_norm = jnp.zeros((m + 1, 1), dtype)
        self.nat1 = nat1
        self.nat2 = nat2
        self.log_norm = log_norm

    # -- basic structure ----------------------------------------------------
    @property
    def inducing_inputs(self):
        return self._inducing_points.value

    @property
    def time_points(self):
        return self.inducing_inputs

    @property
    def dist_p(self) -> StateSpaceModel:
        return self.kernel.build_finite_distribution(self.inducing_inputs)

    @property
    def dist_q(self) -> StateSpaceModel:
        return pair_site_posterior(self.dist_p, self.nat1, self.nat2)

    @property
    def posterior(self) -> AnalyticPosteriorProcess:
        return AnalyticPosteriorProcess(
            posterior_dist=self.dist_q,
            kernel=self.kernel,
            conditioning_time_points=self.inducing_inputs,
            likelihood=self.likelihood,
            mean_function=self.mean_function,
        )

    # -- site bookkeeping -----------------------------------------------------
    def _indices(self, time_points):
        return jnp.searchsorted(self.inducing_inputs, time_points)

    def compute_num_data_per_interval(self, time_points):
        """c(m) = #{x in interval m} (reference: sparse_pep.py:450-462)."""
        indices = self._indices(time_points)
        m = self.inducing_inputs.shape[-1]
        ones = jnp.ones_like(time_points)
        return jax.ops.segment_sum(ones, indices, num_segments=m + 1)

    def fraction_sites(self, time_points):
        """1/c(m), 0 for empty intervals (reference: sparse_pep.py:176-195)."""
        counts = self.compute_num_data_per_interval(time_points)
        return jnp.where(counts > 0, 1.0 / jnp.maximum(counts, 1.0), 0.0)

    def compute_fraction(self, time_points):
        return self.fraction_sites(time_points)[self._indices(time_points)]

    # -- cavity ---------------------------------------------------------------
    def compute_marginals(self):
        """Pairwise marginals of q over consecutive inducing states
        (reference: sparse_pep.py:240-250)."""
        batch_shape = self.inducing_inputs.shape[:-1]
        return pairwise_marginals(
            self.dist_q,
            self.kernel.initial_mean(batch_shape),
            self.kernel.initial_covariance(self.inducing_inputs[..., :1]),
        )

    def remove_cavity_from_marginals(self, time_points, marginals):
        """Cavity state marginals at data points
        (reference: sparse_pep.py:252-296)."""
        pw_means, pw_covs = marginals
        pw_prec = small_inv(symmetrize(pw_covs))
        pw_nat2 = -0.5 * pw_prec
        pw_nat1 = jnp.einsum("...nij,...nj->...ni", pw_prec, pw_means)
        indices = self._indices(time_points)
        pair_nat1 = pw_nat1[..., indices, :]
        pair_nat2 = pw_nat2[..., indices, :, :]
        fractions = self.compute_fraction(time_points)
        frac_nat1 = self.nat1[indices] * fractions[..., None]
        frac_nat2 = self.nat2[indices] * fractions[..., None, None]
        cav_nat1 = pair_nat1 - self.alpha * frac_nat1
        cav_nat2 = pair_nat2 - self.alpha * frac_nat2
        cav_cov = 0.5 * small_inv(symmetrize(-cav_nat2))
        cav_mean = jnp.einsum("...nij,...nj->...ni", cav_cov, cav_nat1)
        p_proj, offset, t_cov, _ = conditional_statistics(
            time_points, self.inducing_inputs, self.kernel)
        return base_conditional_predict(
            p_proj, offset, t_cov, cav_mean,
            pairwise_covariances=symmetrize(cav_cov))

    def compute_cavity_state(self, time_points):
        return self.remove_cavity_from_marginals(time_points,
                                                 self.compute_marginals())

    def compute_cavity(self, time_points):
        """Cavity marginals of f (reference: sparse_pep.py:310-321)."""
        sx_mus, sx_covs = self.compute_cavity_state(time_points)
        em = self.kernel.generate_emission_model(time_points)
        return em.project_state_marginals_to_f(sx_mus, sx_covs)

    # -- updates -----------------------------------------------------------------
    def local_objective(self, f_mu, f_var, y):
        return self.likelihood.log_expected_density(f_mu, f_var, y,
                                                    alpha=self.alpha)

    def local_objective_gradients(self, f_mu, f_var, y, alpha=None):
        obj, grads = self.likelihood.grad_log_expected_density(
            f_mu, f_var, y, alpha=alpha if alpha is not None else self.alpha)
        return obj, gradient_correction((f_mu, f_var), grads)

    def compute_new_sites(self, input_data):
        """(reference: sparse_pep.py:323-380)."""
        time_points, observations = input_data
        f_mu, f_var = self.compute_cavity(time_points)
        _, grads = self.local_objective_gradients(f_mu, f_var, observations)
        h = self.kernel.generate_emission_model(time_points).emission_matrix
        p_proj, _, _, indices = conditional_statistics(
            time_points, self.inducing_inputs, self.kernel)
        hp = h @ p_proj
        site_nat1, site_nat2 = back_project_nats(grads[0], grads[1], hp)
        m = self.inducing_inputs.shape[-1]
        summed1 = jax.ops.segment_sum(site_nat1, indices, num_segments=m + 1)
        summed2 = jax.ops.segment_sum(site_nat2, indices, num_segments=m + 1)
        a, lr = self.alpha, self.learning_rate
        pep_nat1 = (1 - a) * self.nat1 + a * summed1
        pep_nat2 = (1 - a) * self.nat2 + a * summed2
        new_nat1 = (1 - lr) * self.nat1 + lr * pep_nat1
        new_nat2 = (1 - lr) * self.nat2 + lr * pep_nat2
        return new_nat1, new_nat2

    def compute_log_norm(self, input_data):
        """Leave-one-out site normalizers, vmapped over intervals
        (reference: sparse_pep.py:382-448)."""
        time_points, observations = input_data
        f_mu, f_var = self.compute_cavity(time_points)
        obj, _ = self.local_objective_gradients(f_mu, f_var, observations,
                                                alpha=self.alpha)
        m = self.inducing_inputs.shape[-1]
        num_partition = m + 1
        log_norm_marg = self.dist_q.normalizer
        neighbours = self.compute_num_data_per_interval(time_points)
        frac = jnp.where(neighbours > 0, 1.0 / jnp.maximum(neighbours, 1.0),
                         0.0)
        scale = 1.0 - jnp.eye(num_partition,
                              dtype=frac.dtype) * frac * self.alpha
        nat1_all = self.nat1[None] * scale[..., None]
        nat2_all = self.nat2[None] * scale[..., None, None]
        dist_p = self.dist_p

        def normalizer_one(n1, n2):
            return pair_site_posterior(dist_p, n1, n2).normalizer

        log_norm_cav = jax.vmap(normalizer_one)(nat1_all, nat2_all)
        indices = self._indices(time_points)
        log_norm = obj + log_norm_cav[indices] - log_norm_marg
        summed = jax.ops.segment_sum(log_norm[..., None], indices,
                                     num_segments=num_partition)
        return summed / self.alpha

    def update_sites(self, input_data) -> "SparsePowerExpectationPropagation":
        new_nat1, new_nat2 = self.compute_new_sites(input_data)
        a, lr = self.alpha, self.learning_rate
        log_norm = self.compute_log_norm(input_data)
        pep_log_norm = (1 - a) * self.log_norm + a * log_norm
        new_log_norm = (1 - lr) * self.log_norm + lr * pep_log_norm
        return self.replace(nat1=new_nat1, nat2=new_nat2,
                            log_norm=new_log_norm)

    # -- objectives ------------------------------------------------------------
    def energy(self, input_data) -> jnp.ndarray:
        """(reference: sparse_pep.py:492-498)."""
        log_norm = self.compute_log_norm(input_data)
        return (self.dist_q.normalizer - self.dist_p.normalizer
                + jnp.sum(log_norm))

    def classic_elbo(self, input_data) -> jnp.ndarray:
        time_points, observations = input_data
        f_mu, f_var = self.posterior.predict_f(time_points)
        ve = jnp.sum(self.likelihood.variational_expectations(
            f_mu, f_var, observations))
        kl = jnp.sum(self.dist_q.kl_divergence(self.dist_p))
        return ve - kl

    def elbo(self, input_data) -> jnp.ndarray:
        return self.classic_elbo(input_data)

    def loss(self, input_data) -> jnp.ndarray:
        return -self.classic_elbo(input_data)

    def predict_log_density(self, input_data):
        x, y = input_data
        f_mu, f_var = self.posterior.predict_f(x)
        return self.likelihood.predict_density(f_mu, f_var, y)
