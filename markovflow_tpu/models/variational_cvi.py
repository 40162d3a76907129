"""Conjugate-computation VI (CVI) with Gaussian sites on a Markovian GP.

Rebuild of ``markovflow/models/variational_cvi.py`` (460 LoC).  The posterior
is parameterized by univariate Gaussian sites t_k(f_k) in natural form:
q(s) = p(s) prod_k t_k(f_k) (Khan & Lin 2017).  Site updates are gradients of
the variational expectations w.r.t. the expectation parameters [mu, mu^2+var]
— one ``jax.grad`` instead of the reference's GradientTape dance
(reference: variational_cvi.py:321-368).

Functional API: ``update_sites()`` returns a NEW model (sites are pytree
leaves), it does not mutate.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..kalman_filter import KalmanFilterWithSites, UnivariateGaussianSitesNat
from ..kernels import SDEKernel
from ..likelihoods import Likelihood
from ..mean_function import MeanFunction
from ..posterior import AnalyticPosteriorProcess
from ..ssm_gaussian_transformations import naturals_to_ssm
from ..state_space_model import StateSpaceModel
from ..utils.checks import (check_observations, check_time_points,
                            is_uniform_grid)
from .models import MarkovFlowModel

__all__ = [
    "CVIGaussianProcess",
    "GaussianProcessWithSitesBase",
    "back_project_nats",
    "gradient_transformation_mean_var_to_expectation",
]


def back_project_nats(nat1, nat2, emission_matrix):
    """Lift f-space natural parameters to state space: f = H s
    (reference: variational_cvi.py:423-445).

    nat1 [..., N, 1]; nat2 [..., N, 1]; emission [..., N, 1, d].
    Returns ([..., N, d], [..., N, d, d]).
    """
    h = emission_matrix[..., 0, :]  # [..., N, d]
    bp_nat1 = h * nat1
    bp_nat2 = nat2[..., None] * h[..., :, None] * h[..., None, :]
    return bp_nat1, bp_nat2


def gradient_transformation_mean_var_to_expectation(inputs, grads):
    """Gradients w.r.t. [mu, var] -> w.r.t. [mu, var + mu^2]
    (reference: variational_cvi.py:448-460)."""
    mu, _ = inputs
    g_mu, g_var = grads
    return g_mu - 2.0 * g_var * mu, g_var


class GaussianProcessWithSitesBase(MarkovFlowModel):
    """Shared site-model machinery for CVI and (P)EP
    (reference: variational_cvi.py:32-230)."""

    def __init__(self, input_data: Tuple[jnp.ndarray, jnp.ndarray],
                 kernel: SDEKernel, likelihood: Likelihood,
                 mean_function: Optional[MeanFunction] = None,
                 sites: Optional[UnivariateGaussianSitesNat] = None,
                 grad_engine: str = "koopman", mesh=None,
                 shard_axis: str = "sp",
                 uniform_grid: Optional[bool] = None):
        """``grad_engine`` selects the VJP of the site-model marginal
        likelihood (the ELBO / energy surrogate) — see
        :meth:`BaseKalmanFilter.log_likelihood`.  "koopman" (default) is the
        analytic prediction-error score; "autodiff" differentiates through
        the scans (needed for forward-mode use); "collective" runs every
        heavy pass (ELBO + VJP, and the smoothed marginals behind
        ``update_sites``) as explicit-collective sequence-parallel scans
        with the time axis sharded over ``mesh``'s ``shard_axis``.

        ``uniform_grid``: stationary uniform-grid fast path — ``None``
        auto-detects from concrete time points, ``False`` forces the general
        engine, ``True`` asserts eligibility (see
        :class:`GaussianProcessRegression`)."""
        self.time_points, self.observations = input_data
        check_time_points(self.time_points)
        check_observations(self.observations, self.time_points)
        self.kernel = kernel
        self.likelihood = likelihood
        self.mean_function = mean_function
        if sites is None:
            nat1 = jnp.zeros_like(self.observations)
            nat2 = -1e-10 * jnp.ones_like(self.observations)[..., None]
            sites = UnivariateGaussianSitesNat(nat1, nat2)
        self.sites = sites
        self.grad_engine = grad_engine
        self.mesh = mesh
        self.shard_axis = shard_axis
        # Static flag: stationary uniform-grid fast path (constant prior
        # steps, per-step sites; see GaussianProcessRegression for the
        # detection contract — pass numpy time points to enable on device).
        detected = (is_uniform_grid(self.time_points)
                    and hasattr(kernel, "prior_const_tl") and mesh is None)
        if uniform_grid and not detected:
            raise ValueError(
                "uniform_grid=True requires host-inspectable, evenly spaced "
                "time points, a stationary kernel and no mesh")
        self._uniform_grid = detected if uniform_grid is None \
            else bool(uniform_grid)

    def replace(self, **updates):
        """Copy with attributes replaced; re-detects the uniform-grid flag
        when the time points or the kernel change (pass ``_uniform_grid=``
        explicitly to pin it)."""
        new = super().replace(**updates)
        if ("_uniform_grid" not in updates
                and ({"time_points", "kernel", "mesh"} & updates.keys())):
            object.__setattr__(new, "_uniform_grid", (
                is_uniform_grid(new.time_points)
                and hasattr(new.kernel, "prior_const_tl")
                and new.mesh is None))
        return new

    @property
    def dist_p(self) -> StateSpaceModel:
        return self.kernel.state_space_model(self.time_points)

    @property
    def emission(self):
        return self.kernel.generate_emission_model(self.time_points)

    @property
    def dist_q(self) -> StateSpaceModel:
        """Conjugate posterior q(s) = p(s) prod_k t_k(f_k).

        Computed as the posterior SSM of the site Kalman filter — the
        parallel-scan path (O(log T) depth) — instead of the reference's
        precision-space conjugate update + banded naturals inversion
        (reference: variational_cvi.py:105-135), which needs a sequential
        backward factorization.  Both give the (unique) forward Markov
        parameterization; see :meth:`dist_q_naturals`.
        """
        return self.posterior_kalman.posterior_state_space_model()

    @property
    def dist_q_naturals(self) -> StateSpaceModel:
        """Reference-style construction through natural parameters
        (reference: variational_cvi.py:105-135) — kept for parity/testing."""
        from ..ssm_gaussian_transformations import ssm_to_naturals

        theta_linear, theta_diag, theta_subdiag = ssm_to_naturals(self.dist_p)
        h = self.emission.emission_matrix
        bp_nat1, bp_nat2 = back_project_nats(
            self.sites.nat1, self.sites.nat2[..., 0], h)
        return naturals_to_ssm(
            theta_linear + bp_nat1, theta_diag + bp_nat2, theta_subdiag)

    @property
    def posterior_kalman(self) -> KalmanFilterWithSites:
        """(reference: variational_cvi.py:137-144)."""
        prior_tl = None
        if hasattr(self.kernel, "prior_arrays_tl"):
            prior_tl = self.kernel.prior_arrays_tl(self.time_points)
        prior_const = None
        if self._uniform_grid:
            tp = self.time_points
            dt = (tp[..., -1:] - tp[..., :1]) / (tp.shape[-1] - 1)
            prior_const = self.kernel.prior_const_tl(dt)
        return KalmanFilterWithSites(self.dist_p, self.emission, self.sites,
                                     prior_tl=prior_tl,
                                     prior_const_tl=prior_const)

    def log_likelihood(self) -> jnp.ndarray:
        return self.posterior_kalman.log_likelihood(
            grad_engine=self.grad_engine, mesh=self.mesh,
            axis=self.shard_axis)

    @property
    def posterior(self) -> AnalyticPosteriorProcess:
        return AnalyticPosteriorProcess(
            posterior_dist=self.dist_q,
            kernel=self.kernel,
            conditioning_time_points=self.time_points,
            likelihood=self.likelihood,
            mean_function=self.mean_function,
        )

    def _f_marginals(self, engine: str = "xla"):
        """q(f) marginals at the training points — smoothed marginals from
        the TL filter/smoother pipeline (no posterior-SSM materialization).

        Site updates pass ``engine="pallas"``: their gradients never flow
        *through* these marginals (they differentiate the local objective
        w.r.t. them), so the un-differentiable fused TPU kernels are safe
        there; ``classic_elbo`` keeps the XLA scans so hyperparameter
        autodiff through the marginals stays possible.  Under
        ``grad_engine="collective"`` the marginals run the
        explicit-collective sharded pipelines instead."""
        if self.grad_engine == "collective":
            means, covs = self.posterior_kalman.posterior_marginals(
                engine="collective", mesh=self.mesh, axis=self.shard_axis)
        else:
            means, covs = self.posterior_kalman.posterior_marginals(
                engine=engine)
        em = self.emission
        f_mu, f_var = em.project_state_marginals_to_f(means, covs)
        if self.mean_function is not None:
            f_mu = f_mu + self.mean_function(self.time_points)
        return f_mu, f_var


class CVIGaussianProcess(GaussianProcessWithSitesBase):
    """(reference: variational_cvi.py:233-420)."""

    def __init__(self, input_data, kernel, likelihood, mean_function=None,
                 learning_rate: float = 0.1, sites=None,
                 grad_engine: str = "koopman", mesh=None,
                 shard_axis: str = "sp",
                 uniform_grid: Optional[bool] = None):
        super().__init__(input_data, kernel, likelihood, mean_function, sites,
                         grad_engine=grad_engine, mesh=mesh,
                         shard_axis=shard_axis, uniform_grid=uniform_grid)
        self.learning_rate = learning_rate

    def local_objective(self, f_mu, f_var, y):
        return self.likelihood.variational_expectations(f_mu, f_var, y)

    def local_objective_and_gradients(self, f_mu, f_var):
        """(value, grads wrt expectation params [mu, var + mu^2])
        (reference: variational_cvi.py:332-349)."""
        def obj(mu, var):
            return jnp.sum(self.local_objective(mu, var, self.observations))

        val = obj(f_mu, f_var)
        g_mu, g_var = jax.grad(obj, argnums=(0, 1))(f_mu, f_var)
        return val, gradient_transformation_mean_var_to_expectation(
            (f_mu, f_var), (g_mu, g_var))

    def update_sites(self) -> "CVIGaussianProcess":
        """theta <- (1 - rho) theta + rho dVE/deta; returns a new model
        (reference: variational_cvi.py:351-368)."""
        f_mu, f_var = self._f_marginals(engine="pallas")
        _, (g1, g2) = self.local_objective_and_gradients(f_mu, f_var)
        lr = self.learning_rate
        new_nat1 = (1 - lr) * self.sites.nat1 + lr * g1
        new_nat2 = (1 - lr) * self.sites.nat2 + lr * g2[..., None]
        return self.replace(sites=self.sites.replace_nats(new_nat1, new_nat2))

    def elbo(self) -> jnp.ndarray:
        """Site-model marginal likelihood (reference: variational_cvi.py:370-379)."""
        return self.log_likelihood()

    def classic_elbo(self) -> jnp.ndarray:
        """sum VE - KL[q || p], for testing (reference: variational_cvi.py:381-404)."""
        f_mu, f_var = self._f_marginals()
        ve = jnp.sum(self.likelihood.variational_expectations(
            f_mu, f_var, self.observations))
        kl = jnp.sum(self.dist_q.kl_divergence(self.dist_p))
        return ve - kl

    def loss(self) -> jnp.ndarray:
        return -self.elbo()

    def predict_log_density(self, input_data):
        x, y = input_data
        f_mu, f_var = self.posterior.predict_f(x)
        return self.likelihood.predict_density(f_mu, f_var, y)
