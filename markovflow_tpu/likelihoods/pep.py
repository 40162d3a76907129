"""Power-EP likelihood wrappers
(reference: markovflow/likelihoods/likelihoods.py:149-273).

``log_expected_density`` = log E_{N(f; mu, sigma^2)}[p(y|f)^alpha]; gradients
w.r.t. (mu, sigma^2) come from JAX autodiff instead of the reference's nested
GradientTapes (reference: likelihoods.py:196-212).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import Likelihood, gauss_hermite
from .scalar import Gaussian

__all__ = ["PEPScalarLikelihood", "PEPGaussian"]

_LOG_2PI = 1.8378770664093453


class PEPScalarLikelihood(Likelihood):
    """Wraps a scalar likelihood for PEP updates via quadrature."""

    def __init__(self, base: Likelihood, num_gauss_hermite_points: int = 20):
        self.base = base
        self.num_points = num_gauss_hermite_points

    def log_probability_density(self, f, y):
        return self.base.log_probability_density(f, y)

    def variational_expectations(self, f_means, f_covariances, y):
        return self.base.variational_expectations(f_means, f_covariances, y)

    def predict_density(self, f_means, f_covariances, y):
        return self.base.predict_density(f_means, f_covariances, y)

    def predict_mean_and_var(self, f_means, f_covariances):
        return self.base.predict_mean_and_var(f_means, f_covariances)

    def log_expected_density(self, f_means, f_covariances, y, alpha=1.0):
        """log E_q[p(y|f)^alpha] via Gauss-Hermite (reference: :184-194)."""
        def fn(f):
            return jnp.exp(alpha * self.base.log_probability_density(f, y))

        return jnp.log(gauss_hermite(fn, f_means, f_covariances,
                                     num_points=self.num_points))

    def grad_log_expected_density(self, f_means, f_covariances, y, alpha=1.0):
        """(value, (dI/dmu, d2I/dmu2)) — first and SECOND derivative w.r.t.
        the mean, as the EP moment-matching update expects.  Autodiff replaces
        the reference's nested tapes (reference: :196-212)."""
        def led_sum(mu):
            return jnp.sum(self.log_expected_density(mu, f_covariances, y,
                                                     alpha))

        val = self.log_expected_density(f_means, f_covariances, y, alpha)
        g_mu = jax.grad(led_sum)(f_means)
        h_mu = jax.grad(lambda mu: jnp.sum(jax.grad(led_sum)(mu)))(f_means)
        return val, (g_mu, h_mu)


class PEPGaussian(PEPScalarLikelihood):
    """Analytic Gaussian case (reference: likelihoods.py:236-273):
    E[N(y|f, s)^a] = N(y; mu, s/a + var) * c(a, s)."""

    def __init__(self, base: Gaussian):
        super().__init__(base)

    def log_expected_density(self, f_means, f_covariances, y, alpha=1.0):
        s = self.base.variance.value
        var = s / alpha + f_covariances
        log_norm = -0.5 * ((y - f_means) ** 2 / var + jnp.log(var) + _LOG_2PI)
        # constant from the alpha-power of the Gaussian:
        # N(y|f,s)^a = (2 pi s)^{(1-a)/2} a^{-1/2} N(y; f, s/a)
        corr = 0.5 * (1.0 - alpha) * (_LOG_2PI + jnp.log(s)) - 0.5 * jnp.log(
            jnp.asarray(alpha, f_means.dtype))
        return log_norm[..., 0] + corr

    def grad_log_expected_density(self, f_means, f_covariances, y, alpha=1.0):
        """Analytic (dI/dmu, d2I/dmu2) (reference: likelihoods.py:254-265)."""
        s = self.base.variance.value
        var = s / alpha + f_covariances
        val = self.log_expected_density(f_means, f_covariances, y, alpha)
        return val, ((y - f_means) / var, -1.0 / var)
