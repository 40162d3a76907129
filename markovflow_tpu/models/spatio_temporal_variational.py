"""Spatio-temporal sparse variational models.

Rebuild of ``markovflow/models/spatio_temporal_variational.py`` (586 LoC):
separable kernels k((s,t), (s',t')) = k_space(s,s') k_time(t,t') with the
temporal factor Markovian.  The latent multi-output process carries one copy
of the temporal SSM per spatial inducing point, mixed by chol(K_s(Z_s, Z_s)).

Design difference: the reference instantiates ``IndependentMultiOutput`` with
M references to ONE kernel object (TF variable sharing); a JAX pytree would
untie those copies, so :class:`SparseSpatioTemporalKernel` builds the
block-diagonal structure directly as Kronecker products of a single child —
parameters stay tied and the expressions stay fused.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..conditionals import conditional_statistics
from ..emission_model import EmissionModel
from ..kalman_filter import UnivariateGaussianSitesNat
from ..kernels.sde_kernel import StationaryKernel
from ..kernels.spatial import SpatialKernel
from ..likelihoods import Likelihood
from ..mean_function import MeanFunction
from ..posterior import ConditionalProcess
from ..state_space_model import StateSpaceModel
from ..utils.linalg import batched_kron, small_cholesky, symmetrize, tlt
from ..utils.module import Parameter
from .models import MarkovFlowSparseModel
from .sparse_variational_cvi import pair_site_posterior
from .variational_cvi import (
    back_project_nats,
    gradient_transformation_mean_var_to_expectation,
)

__all__ = [
    "SparseSpatioTemporalKernel",
    "SpatioTemporalBase",
    "SpatioTemporalSparseVariational",
    "SpatioTemporalSparseCVI",
    "batch_base_conditional",
]


def batch_base_conditional(kmn, kmm, knn, f, q_sqrt=None):
    """Per-point GP conditional: for each n,
    q(g1_n) = int N(g1_n; kmn_n^T Kmm^{-1} g2, knn_n - qff_n) q_n(g2) dg2
    (reference: markovflow/utils.py:159-257).

    kmn [M, ..., N]; kmm [M, M]; knn [..., N]; f [..., N, M] (per-n means);
    q_sqrt [..., N, M, M] (per-n covariance Cholesky).
    Returns (means [..., N], vars [..., N]).
    """
    chol = jnp.linalg.cholesky(kmm)
    kmn_t = jnp.moveaxis(kmn, 0, -1)[..., None]  # [..., N, M, 1]
    chol = jnp.broadcast_to(chol, kmn_t.shape[:-2] + chol.shape[-2:])
    a = jax.scipy.linalg.solve_triangular(
        chol, kmn_t, lower=True)  # [..., N, M, 1] = L^{-1} kmn
    mean = jnp.einsum("...nm,...nm->...n",
                      jax.scipy.linalg.solve_triangular(
                          tlt(chol), a, lower=False)[..., 0], f)
    var = knn - jnp.sum(a[..., 0] ** 2, axis=-1)
    if q_sqrt is not None:
        b = jax.scipy.linalg.solve_triangular(
            tlt(chol), a, lower=False)  # Kmm^{-1} kmn  [..., N, M, 1]
        proj = jnp.einsum("...nmk,...nm->...nk", q_sqrt, b[..., 0])
        var = var + jnp.sum(proj**2, axis=-1)
    return mean, var


class SparseSpatioTemporalKernel(StationaryKernel):
    """f(z_s, .) = chol(K_s(Z_s, Z_s)) @ [H s_1(.), ..., H s_M(.)]
    with iid temporal SDE copies (reference: spatio_temporal_variational.py:45-106)."""

    def __init__(self, kernel_space: SpatialKernel,
                 kernel_time: StationaryKernel, inducing_space: jnp.ndarray):
        self.kernel_space = kernel_space
        self.kernel_time = kernel_time
        self.inducing_space = inducing_space
        super().__init__(output_dim=inducing_space.shape[-2],
                         jitter=kernel_time.jitter)

    @property
    def num_space(self) -> int:
        return self.inducing_space.shape[-2]

    @property
    def state_dim(self) -> int:
        return self.num_space * self.kernel_time.state_dim

    def _eye_kron(self, mat):
        eye = jnp.eye(self.num_space, dtype=mat.dtype)
        return batched_kron(jnp.broadcast_to(eye, mat.shape[:-2] + eye.shape),
                            mat)

    @property
    def feedback_matrix(self):
        return self._eye_kron(self.kernel_time.feedback_matrix)

    @property
    def steady_state_covariance(self):
        return self._eye_kron(self.kernel_time.steady_state_covariance)

    def state_transitions(self, time_deltas):
        return self._eye_kron(self.kernel_time.state_transitions(time_deltas))

    def _base_emission(self, time_points):
        """kron(I_M, H_child): [..., N, M, M*d] (no spatial mixing)."""
        h_child = self.kernel_time.generate_emission_model(
            time_points).emission_matrix  # [..., N, 1, d]
        eye = jnp.eye(self.num_space, dtype=h_child.dtype)
        return batched_kron(
            jnp.broadcast_to(eye, h_child.shape[:-2] + eye.shape), h_child)

    def generate_emission_model(self, time_points) -> EmissionModel:
        """chol(K_s(Z_s, Z_s)) @ kron(I, H)
        (reference: spatio_temporal_variational.py:73-86)."""
        h = self._base_emission(time_points)
        chol_s = jnp.linalg.cholesky(
            self.kernel_space(self.inducing_space)
            + 1e-9 * jnp.eye(self.num_space, dtype=h.dtype))
        return EmissionModel(chol_s @ h)

    def state_to_space_conditional_projection(self, inputs):
        """P with E[f(x, t) | s(t)] = P s(t)
        (reference: spatio_temporal_variational.py:88-106)."""
        space_points, time_points = inputs[..., :-1], inputs[..., -1]
        h = self._base_emission(time_points)  # [N, M, sd]
        kmm = self.kernel_space(self.inducing_space)
        chol = jnp.linalg.cholesky(
            kmm + 1e-9 * jnp.eye(self.num_space, dtype=h.dtype))
        chol = jnp.broadcast_to(chol, h.shape[:-2] + chol.shape[-2:])
        c = jax.scipy.linalg.solve_triangular(tlt(chol), h, lower=False)
        knm = self.kernel_space(space_points, self.inducing_space)  # [N, M]
        return jnp.sum(knm[..., None] * c, axis=-2, keepdims=True)  # [N,1,sd]


class SpatioTemporalBase(MarkovFlowSparseModel):
    """(reference: spatio_temporal_variational.py:109-240)."""

    def __init__(self, inducing_space, kernel_space: SpatialKernel,
                 kernel_time: StationaryKernel, likelihood: Likelihood,
                 mean_function: Optional[MeanFunction] = None,
                 num_data: Optional[int] = None):
        self.kernel_space = kernel_space
        self.kernel_time = kernel_time
        self.inducing_space = inducing_space
        self.likelihood = likelihood
        self.mean_function = mean_function
        self.num_data = num_data
        self.kernel = SparseSpatioTemporalKernel(
            kernel_space=kernel_space, kernel_time=kernel_time,
            inducing_space=inducing_space)

    @property
    def num_inducing_space(self):
        return self.inducing_space.shape[-2]

    def space_time_predict_f(self, inputs):
        """Marginal predictions at space-time inputs [..., N, space_dim + 1]
        (reference: spatio_temporal_variational.py:149-183)."""
        x, t = inputs[..., :-1], inputs[..., -1]
        mean_u, cov_u = self.posterior.predict_f(t, full_output_cov=True)
        chol_cov_u = small_cholesky(
            symmetrize(cov_u)
            + 1e-9 * jnp.eye(cov_u.shape[-1], dtype=cov_u.dtype))
        kmn = jnp.moveaxis(self.kernel_space(x, self.inducing_space), -1, 0)
        kmm = self.kernel_space(self.inducing_space)
        knn = self.kernel_space.k_diag(x)
        mean_f, var_f = batch_base_conditional(
            kmn, kmm, knn, mean_u, q_sqrt=chol_cov_u)
        mean_f, var_f = mean_f[..., None], var_f[..., None]
        if self.mean_function is not None:
            mean_f = mean_f + self.mean_function(t)
        return mean_f, var_f

    def elbo(self, input_data) -> jnp.ndarray:
        x, y = input_data
        f_mu, f_var = self.space_time_predict_f(x)
        ve = jnp.sum(self.likelihood.variational_expectations(f_mu, f_var, y))
        kl = jnp.sum(self.dist_q.kl_divergence(self.dist_p))
        if self.num_data is not None:
            scale = jnp.asarray(self.num_data, f_mu.dtype) / x.shape[-2]
        else:
            scale = 1.0
        return ve * scale - kl

    def loss(self, input_data) -> jnp.ndarray:
        return -self.elbo(input_data)

    def predict_log_density(self, input_data):
        x, y = input_data
        f_mu, f_var = self.space_time_predict_f(x)
        return self.likelihood.predict_density(f_mu, f_var, y)


class SpatioTemporalSparseVariational(SpatioTemporalBase):
    """Trainable SSM posterior over inducing states
    (reference: spatio_temporal_variational.py:270-357)."""

    def __init__(self, inducing_space, inducing_time,
                 kernel_space: SpatialKernel, kernel_time: StationaryKernel,
                 likelihood: Likelihood,
                 mean_function: Optional[MeanFunction] = None,
                 num_data: Optional[int] = None):
        super().__init__(inducing_space, kernel_space, kernel_time,
                         likelihood, mean_function, num_data)
        self.inducing_time = inducing_time
        self._dist_q = self.kernel.state_space_model(
            inducing_time).trainable_copy()

    @property
    def dist_p(self) -> StateSpaceModel:
        return self.kernel.state_space_model(self.inducing_time)

    @property
    def dist_q(self) -> StateSpaceModel:
        return self._dist_q

    def with_dist_q(self, ssm: StateSpaceModel):
        return self.replace(_dist_q=ssm.trainable_copy())

    @property
    def posterior(self) -> ConditionalProcess:
        return ConditionalProcess(
            posterior_dist=self.dist_q.non_trainable_copy(),
            kernel=self.kernel,
            conditioning_time_points=self.inducing_time)


class SpatioTemporalSparseCVI(SpatioTemporalBase):
    """Pair-site CVI over inducing states
    (reference: spatio_temporal_variational.py:360-586)."""

    def __init__(self, inducing_space, inducing_time,
                 kernel_space: SpatialKernel, kernel_time: StationaryKernel,
                 likelihood: Likelihood,
                 mean_function: Optional[MeanFunction] = None,
                 num_data: Optional[int] = None, learning_rate: float = 0.1,
                 nat1=None, nat2=None):
        super().__init__(inducing_space, kernel_space, kernel_time,
                         likelihood, mean_function, num_data)
        self.inducing_time = inducing_time
        self.learning_rate = learning_rate
        mt = inducing_time.shape[-1]
        sd = self.kernel.state_dim
        dtype = jnp.asarray(inducing_time).dtype
        if nat1 is None:
            nat1 = jnp.zeros((mt + 1, 2 * sd), dtype)
        if nat2 is None:
            nat2 = jnp.zeros((mt + 1, 2 * sd, 2 * sd), dtype)
        self.nat1 = nat1
        self.nat2 = nat2

    @property
    def dist_p(self) -> StateSpaceModel:
        return self.kernel.state_space_model(self.inducing_time)

    @property
    def dist_q(self) -> StateSpaceModel:
        return pair_site_posterior(self.dist_p, self.nat1, self.nat2)

    @property
    def posterior(self) -> ConditionalProcess:
        return ConditionalProcess(
            posterior_dist=self.dist_q,
            kernel=self.kernel,
            conditioning_time_points=self.inducing_time)

    def projection_inducing_states_to_observations(self, inputs):
        """P in E[f(x,t) | v_m] (reference: spatio_temporal_variational.py:494-507)."""
        t = inputs[..., -1]
        p_proj, _, _, _ = conditional_statistics(
            t, self.inducing_time, self.kernel)  # [N, sd, 2sd]
        a = self.kernel.state_to_space_conditional_projection(inputs)  # [N,1,sd]
        return jnp.einsum("...ncs,...nfc->...nfs", p_proj, a)

    def local_objective(self, f_mu, f_var, y):
        return self.likelihood.variational_expectations(f_mu, f_var, y)

    def local_objective_and_gradients(self, f_mu, f_var, y):
        def obj(mu, var):
            return jnp.sum(self.local_objective(mu, var, y))

        val = obj(f_mu, f_var)
        g_mu, g_var = jax.grad(obj, argnums=(0, 1))(f_mu, f_var)
        return val, gradient_transformation_mean_var_to_expectation(
            (f_mu, f_var), (g_mu, g_var))

    def update_sites(self, input_data) -> "SpatioTemporalSparseCVI":
        """(reference: spatio_temporal_variational.py:509-552)."""
        inputs, observations = input_data
        t = inputs[..., -1]
        f_mu, f_var = self.space_time_predict_f(inputs)
        _, (g1, g2) = self.local_objective_and_gradients(
            f_mu, f_var, observations)
        proj = self.projection_inducing_states_to_observations(inputs)
        site_nat1, site_nat2 = back_project_nats(g1, g2, proj)
        mt = self.inducing_time.shape[-1]
        indices = jnp.searchsorted(self.inducing_time, t)
        summed1 = jax.ops.segment_sum(site_nat1, indices, num_segments=mt + 1)
        summed2 = jax.ops.segment_sum(site_nat2, indices, num_segments=mt + 1)
        lr = self.learning_rate
        return self.replace(
            nat1=(1 - lr) * self.nat1 + lr * summed1,
            nat2=(1 - lr) * self.nat2 + lr * summed2,
        )
