"""Exact GP regression via Kalman filtering — the north-star benchmark model.

Rebuild of ``markovflow/models/gaussian_process_regression.py:30-160``:
log marginal likelihood and posterior come from the parallel-scan Kalman
filter/smoother over the kernel's SSM — O(log T) depth instead of the
reference's sequential banded Cholesky (SURVEY.md section 3.1).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from ..kalman_filter import KalmanFilter
from ..utils.checks import (check_observations, check_time_points,
                            is_uniform_grid)
from ..kernels import SDEKernel
from ..likelihoods import Gaussian, MultivariateGaussian
from ..mean_function import MeanFunction
from ..posterior import AnalyticPosteriorProcess
from .models import MarkovFlowModel

__all__ = ["GaussianProcessRegression"]


class GaussianProcessRegression(MarkovFlowModel):
    def __init__(self, input_data: Tuple[jnp.ndarray, jnp.ndarray],
                 kernel: SDEKernel, chol_obs_covariance: jnp.ndarray,
                 mean_function: Optional[MeanFunction] = None,
                 grad_engine: str = "koopman", mesh=None,
                 shard_axis: str = "sp",
                 uniform_grid: Optional[bool] = None):
        """input_data: (time_points [..., N], observations [..., N, o]);
        chol_obs_covariance [o, o] (reference: gaussian_process_regression.py:54-96).

        ``grad_engine`` (see :meth:`BaseKalmanFilter.log_likelihood`):
        "koopman" (default) uses the analytic prediction-error score — same
        gradients as autodiff to float roundoff, at ~the cost of one extra
        scan; "autodiff" differentiates through the scan pipeline (required
        for forward-mode/Hessian use); "fisher" is the EM-form VJP (float64 /
        well-separated time points only); "collective" runs the Koopman
        score with explicit-collective sequence parallelism over ``mesh``'s
        ``shard_axis`` dimension (shard the data over that axis with
        ``parallel.shard_batched_series`` or a NamedSharding).

        ``uniform_grid``: the stationary uniform-grid fast path (constant
        prior-step arrays — no [d, d, N] materialization).  ``None``
        (default) auto-detects from concrete (host-inspectable) time points;
        ``False`` forces the general engine; ``True`` asserts eligibility
        (raises unless the grid detects as uniform and the kernel is
        stationary).  The flag is static (part of the jit cache key) and is
        re-detected by ``.replace(time_points=...)`` / ``.replace(kernel=...)``."""
        self.time_points, self.observations = input_data
        check_time_points(self.time_points)
        check_observations(self.observations, self.time_points)
        self.kernel = kernel
        self.chol_obs_covariance = chol_obs_covariance
        self.mean_function = mean_function
        self.grad_engine = grad_engine
        self.mesh = mesh
        self.shard_axis = shard_axis
        # Static flag (part of the jit cache key): detected from the CONCRETE
        # time points (pass numpy time points to enable the fast path for
        # device-resident workflows), overridable via ``uniform_grid=``.
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

    def _residual(self):
        """Observations minus the mean function
        (reference: gaussian_process_regression.py:118-128)."""
        if self.mean_function is None:
            return self.observations
        return self.observations - self.mean_function(self.time_points)

    @property
    def kalman(self) -> KalmanFilter:
        ssm = self.kernel.state_space_model(self.time_points)
        emission = self.kernel.generate_emission_model(self.time_points)
        # TL fast path: stationary kernels emit (F, c, Q) in time-last layout
        # directly, bypassing [N, d, d] intermediates (4 GB tile-padded at
        # T = 1e6 on TPU).
        prior_tl = None
        if hasattr(self.kernel, "prior_arrays_tl"):
            prior_tl = self.kernel.prior_arrays_tl(self.time_points)
        prior_const = None
        if self._uniform_grid:
            tp = self.time_points
            n = tp.shape[-1]
            dt = (tp[..., -1:] - tp[..., :1]) / (n - 1)
            prior_const = self.kernel.prior_const_tl(dt)
        return KalmanFilter(ssm, emission, self._residual(),
                            self.chol_obs_covariance, prior_tl=prior_tl,
                            prior_const_tl=prior_const)

    def log_likelihood(self) -> jnp.ndarray:
        """log p(Y) (reference: gaussian_process_regression.py:152-160)."""
        return self.kalman.log_likelihood(grad_engine=self.grad_engine,
                                          mesh=self.mesh,
                                          axis=self.shard_axis)

    def loss(self) -> jnp.ndarray:
        return -self.log_likelihood()

    @property
    def posterior(self) -> AnalyticPosteriorProcess:
        """(reference: gaussian_process_regression.py:137-150)."""
        o = self.chol_obs_covariance.shape[-1]
        if o == 1:
            lik = Gaussian(variance=self.chol_obs_covariance[..., 0, 0] ** 2)
        else:
            lik = MultivariateGaussian(self.chol_obs_covariance)
        return AnalyticPosteriorProcess(
            posterior_dist=self.kalman.posterior_state_space_model(),
            kernel=self.kernel,
            conditioning_time_points=self.time_points,
            likelihood=lik,
            mean_function=self.mean_function,
        )
