"""Sparse CVI: Gaussian sites on pairs of consecutive inducing states.

Rebuild of ``markovflow/models/sparse_variational_cvi.py`` (313 LoC).  The
posterior is q(s) = p(s) prod_m t_m(v_m) with multivariate sites on
v_m = [u_{m-1}, u_m] (consecutive inducing states); each data point x_k with
z_{m-1} < x_k <= z_m contributes to site m through the conditional projection
E[f_k | v_m] = H P v_m (reference: sparse_variational_cvi.py:176-221).

The reference's ``tf.dynamic_partition`` segment sums become
``jax.ops.segment_sum`` — static shapes, jittable.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..conditionals import conditional_statistics
from ..kernels import SDEKernel
from ..likelihoods import Likelihood
from ..mean_function import MeanFunction
from ..posterior import AnalyticPosteriorProcess
from ..ssm_gaussian_transformations import naturals_to_ssm, ssm_to_naturals
from ..state_space_model import StateSpaceModel
from ..utils.bijectors import ordered
from ..utils.module import Parameter
from .models import MarkovFlowSparseModel
from .variational_cvi import gradient_transformation_mean_var_to_expectation

__all__ = ["SparseCVIGaussianProcess", "pair_site_posterior"]


def pair_site_posterior(dist_p: StateSpaceModel, nat1, nat2,
                        engine: str = "sequential") -> StateSpaceModel:
    """Posterior SSM from prior naturals + pair-site naturals.

    nat1 [..., M+1, 2d], nat2 [..., M+1, 2d, 2d]; site m couples inducing
    states (u_{m-1}, u_m) with phantom ends dropped
    (reference: sparse_variational_cvi.py:139-174, sparse_pep.py:198-232).
    ``engine="parallel"`` inverts the naturals with the O(log M)-depth
    synthetic-model reduction instead of the sequential UDU recursion —
    preferable on TPU for large inducing grids.
    """
    d = dist_p.state_dim
    theta_linear, theta_diag, theta_subdiag = ssm_to_naturals(dist_p)
    theta = (theta_linear + nat1[..., 1:, :d] + nat1[..., :-1, d:],
             theta_diag + nat2[..., 1:, :d, :d] + nat2[..., :-1, d:, d:],
             theta_subdiag + 2.0 * nat2[..., 1:-1, d:, :d])
    if engine == "parallel":
        from ..ssm_gaussian_transformations import (
            naturals_to_ssm_params_parallel,
        )

        a_s, b_s, chol_p0, chol_q_s, mu0 = naturals_to_ssm_params_parallel(
            *theta)
        return StateSpaceModel(mu0, chol_p0, a_s, b_s, chol_q_s)
    return naturals_to_ssm(*theta)


class SparseCVIGaussianProcess(MarkovFlowSparseModel):
    def __init__(self, kernel: SDEKernel, inducing_points: jnp.ndarray,
                 likelihood: Likelihood,
                 mean_function: Optional[MeanFunction] = None,
                 learning_rate: float = 0.1,
                 nat1=None, nat2=None, mesh=None, shard_axis: str = "sp"):
        """Sites: nat1 [..., M+1, 2d], nat2 [..., M+1, 2d, 2d]
        (reference: sparse_variational_cvi.py:98-140).

        ``mesh``: optional ``jax.sharding.Mesh``.  When given,
        ``update_sites`` / ``classic_elbo`` run the explicit-collective
        data-parallel path (:mod:`markovflow_tpu.parallel.
        collective_sites`): data shards over ``mesh``'s ``shard_axis``,
        sites merge with one psum — O(M d^2) communication per update,
        independent of N."""
        self.kernel = kernel
        self.likelihood = likelihood
        self.mean_function = mean_function
        self.learning_rate = learning_rate
        self.mesh = mesh
        self.shard_axis = shard_axis
        self._inducing_points = Parameter(inducing_points, transform=ordered(),
                                          trainable=False)
        m = inducing_points.shape[-1]
        d = kernel.state_dim
        dtype = jnp.asarray(inducing_points).dtype
        if nat1 is None:
            nat1 = jnp.zeros(inducing_points.shape[:-1] + (m + 1, 2 * d), dtype)
        if nat2 is None:
            nat2 = jnp.zeros(
                inducing_points.shape[:-1] + (m + 1, 2 * d, 2 * d), dtype)
        self.nat1 = nat1
        self.nat2 = nat2

    @property
    def inducing_inputs(self):
        return self._inducing_points.value

    @property
    def time_points(self):
        return self.inducing_inputs

    @property
    def dist_p(self) -> StateSpaceModel:
        return self.kernel.state_space_model(self.inducing_inputs)

    @property
    def dist_q(self) -> StateSpaceModel:
        """Prior naturals + pair-site naturals summed per state/transition
        (reference: sparse_variational_cvi.py:139-174)."""
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

    def local_objective(self, f_mu, f_var, y):
        return self.likelihood.variational_expectations(f_mu, f_var, y)

    def local_objective_and_gradients(self, f_mu, f_var, y):
        def obj(mu, var):
            return jnp.sum(self.local_objective(mu, var, y))

        val = obj(f_mu, f_var)
        g_mu, g_var = jax.grad(obj, argnums=(0, 1))(f_mu, f_var)
        return val, gradient_transformation_mean_var_to_expectation(
            (f_mu, f_var), (g_mu, g_var))

    def update_sites(self, input_data: Tuple[jnp.ndarray, jnp.ndarray]
                     ) -> "SparseCVIGaussianProcess":
        """theta_m <- (1-rho) theta_m + rho sum_{k in site m} g_k, with data
        gradients projected through HP onto the pair v_m
        (reference: sparse_variational_cvi.py:176-221)."""
        if self.mesh is not None:
            from ..parallel.collective_sites import sharded_pair_site_update

            return sharded_pair_site_update(
                self, input_data, mesh=self.mesh, axis=self.shard_axis)
        time_points, observations = input_data
        f_mu, f_var = self.posterior.predict_f(time_points)
        _, (g1, g2) = self.local_objective_and_gradients(
            f_mu, f_var, observations)

        h = self.kernel.generate_emission_model(time_points).emission_matrix
        p_proj, _, _, indices = conditional_statistics(
            time_points, self.inducing_inputs, self.kernel)
        hp = h @ p_proj  # [..., N, 1, 2d]
        hp_row = hp[..., 0, :]  # [..., N, 2d]
        site_nat1 = hp_row * g1  # [..., N, 2d]
        site_nat2 = (g2[..., None] * hp_row[..., :, None]
                     * hp_row[..., None, :])  # [..., N, 2d, 2d]

        m = self.inducing_inputs.shape[-1]
        summed1 = jax.ops.segment_sum(site_nat1, indices, num_segments=m + 1)
        summed2 = jax.ops.segment_sum(site_nat2, indices, num_segments=m + 1)
        lr = self.learning_rate
        return self.replace(
            nat1=(1 - lr) * self.nat1 + lr * summed1,
            nat2=(1 - lr) * self.nat2 + lr * summed2,
        )

    def classic_elbo(self, input_data) -> jnp.ndarray:
        """(reference: sparse_variational_cvi.py:270-293)."""
        if self.mesh is not None:
            from ..parallel.collective_sites import sharded_pair_site_elbo

            return sharded_pair_site_elbo(
                self, input_data, mesh=self.mesh, axis=self.shard_axis)
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
