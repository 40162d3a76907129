"""Multivariate Gaussian likelihood
(reference: markovflow/likelihoods/multivariate_gaussian.py:31-177)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.bijectors import triangular
from ..utils.linalg import mvn_logpdf, tlt
from ..utils.module import Parameter
from .base import Likelihood

__all__ = ["MultivariateGaussian"]


class MultivariateGaussian(Likelihood):
    #: posterior.predict_y must pass full [out, out] covariances
    needs_full_cov = True

    """y = f + eps, eps ~ N(0, L L^T) with trainable Cholesky L.

    Analytic variational expectation -1/2 Tr(Sigma^{-1} S) + log N(y; mu, Sigma)
    (reference: multivariate_gaussian.py:80-115).
    f_covariances here are full [..., N, obs, obs].
    """

    def __init__(self, chol_covariance):
        self.chol_covariance = Parameter(chol_covariance, transform=triangular())

    @property
    def obs_dim(self):
        return self.chol_covariance.value.shape[-1]

    def log_probability_density(self, f, y):
        return mvn_logpdf(y, f, self.chol_covariance.value)

    def variational_expectations(self, f_means, f_covariances, y):
        chol = self.chol_covariance.value
        base = mvn_logpdf(y, f_means, chol)
        # jax.scipy solve_triangular requires equal batch ranks — broadcast
        # the (unbatched) observation Cholesky over the data axes.
        chol_b = jnp.broadcast_to(chol, f_covariances.shape)
        x = jax.scipy.linalg.solve_triangular(
            chol_b, f_covariances, lower=True)
        x = jax.scipy.linalg.solve_triangular(tlt(chol_b), x, lower=False)
        return base - 0.5 * jnp.trace(x, axis1=-2, axis2=-1)

    def predict_mean_and_var(self, f_means, f_covariances):
        chol = self.chol_covariance.value
        return f_means, f_covariances + chol @ tlt(chol)

    def predict_density(self, f_means, f_covariances, y):
        chol = self.chol_covariance.value
        cov = f_covariances + chol @ tlt(chol)
        return mvn_logpdf(y, f_means, jnp.linalg.cholesky(cov))
