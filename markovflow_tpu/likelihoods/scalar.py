"""Scalar likelihoods: Gaussian, Bernoulli (probit), Poisson, StudentT.

Replacements for the gpflow likelihoods the reference relies on
(gpflow.likelihoods.{Gaussian, Bernoulli, Poisson}; used e.g. by
markovflow/models/variational.py and the CVI notebooks).  Analytic where
possible; Gauss-Hermite quadrature otherwise.

Conventions: f_means/f_covariances are [..., N, 1] (obs_dim = 1); y [..., N, 1];
returned log-densities are [..., N].
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.bijectors import positive
from ..utils.module import Parameter
from .base import Likelihood, gauss_hermite

__all__ = ["Gaussian", "Bernoulli", "Poisson", "StudentT", "inv_probit"]

_LOG_2PI = 1.8378770664093453


def inv_probit(x):
    jitter = 1e-3  # keeps the output in (jitter, 1 - jitter), as in gpflow
    return 0.5 * (1.0 + jax.scipy.special.erf(x / jnp.sqrt(2.0))) * (
        1 - 2 * jitter) + jitter


def _squeeze(x):
    return x[..., 0]


class Gaussian(Likelihood):
    """y = f + eps, eps ~ N(0, variance).  Fully analytic."""

    def __init__(self, variance: float = 1.0):
        self.variance = Parameter(variance, transform=positive())

    @property
    def obs_dim(self):
        return 1

    def log_probability_density(self, f, y):
        var = self.variance.value
        return _squeeze(-0.5 * ((y - f) ** 2 / var + jnp.log(var) + _LOG_2PI))

    def variational_expectations(self, f_means, f_covariances, y):
        var = self.variance.value
        return _squeeze(
            -0.5 * (((y - f_means) ** 2 + f_covariances) / var
                    + jnp.log(var) + _LOG_2PI))

    def predict_density(self, f_means, f_covariances, y):
        var = self.variance.value + f_covariances
        return _squeeze(-0.5 * ((y - f_means) ** 2 / var + jnp.log(var)
                                + _LOG_2PI))

    def predict_mean_and_var(self, f_means, f_covariances):
        return f_means, f_covariances + self.variance.value


class Bernoulli(Likelihood):
    """y in {0, 1} with probit inverse link: closed-form moments."""

    def __init__(self, invlink=inv_probit):
        self.invlink = invlink

    def log_probability_density(self, f, y):
        p = self.invlink(f)
        return _squeeze(jnp.where(y > 0.5, jnp.log(p), jnp.log1p(-p)))

    def variational_expectations(self, f_means, f_covariances, y):
        return gauss_hermite(
            lambda f: self.log_probability_density(f, y), f_means, f_covariances)

    def predict_mean_and_var(self, f_means, f_covariances):
        if self.invlink is inv_probit:
            p = inv_probit(f_means / jnp.sqrt(1.0 + f_covariances))
        else:
            p = gauss_hermite(self.invlink, f_means, f_covariances)
        return p, p - p**2

    def predict_density(self, f_means, f_covariances, y):
        p, _ = self.predict_mean_and_var(f_means, f_covariances)
        return _squeeze(jnp.where(y > 0.5, jnp.log(p), jnp.log1p(-p)))


class Poisson(Likelihood):
    """y ~ Poisson(exp(f)): analytic variational expectations for the exp link."""

    def __init__(self, binsize: float = 1.0):
        self.binsize = binsize

    def log_probability_density(self, f, y):
        lam = jnp.exp(f) * self.binsize
        return _squeeze(y * jnp.log(lam) - lam - jax.scipy.special.gammaln(y + 1.0))

    def variational_expectations(self, f_means, f_covariances, y):
        lam_bar = jnp.exp(f_means + 0.5 * f_covariances) * self.binsize
        return _squeeze(
            y * (f_means + jnp.log(self.binsize)) - lam_bar
            - jax.scipy.special.gammaln(y + 1.0))

    def predict_mean_and_var(self, f_means, f_covariances):
        mean = jnp.exp(f_means + 0.5 * f_covariances) * self.binsize
        var = mean + (jnp.exp(f_covariances) - 1.0) * mean**2
        return mean, var

    def predict_density(self, f_means, f_covariances, y):
        return jnp.log(gauss_hermite(
            lambda f: jnp.exp(self.log_probability_density(f, y)),
            f_means, f_covariances))


class StudentT(Likelihood):
    """y = f + eps with Student-t noise (robust regression)."""

    def __init__(self, scale: float = 1.0, df: float = 3.0):
        self.scale = Parameter(scale, transform=positive())
        self.df = df

    def log_probability_density(self, f, y):
        nu = self.df
        s = self.scale.value
        z = (y - f) / s
        return _squeeze(
            jax.scipy.special.gammaln((nu + 1) / 2)
            - jax.scipy.special.gammaln(nu / 2)
            - 0.5 * jnp.log(nu * jnp.pi) - jnp.log(s)
            - (nu + 1) / 2 * jnp.log1p(z**2 / nu))

    def variational_expectations(self, f_means, f_covariances, y):
        return gauss_hermite(
            lambda f: self.log_probability_density(f, y), f_means, f_covariances)

    def predict_mean_and_var(self, f_means, f_covariances):
        var = self.scale.value ** 2 * self.df / (self.df - 2.0)
        return f_means, f_covariances + var

    def predict_density(self, f_means, f_covariances, y):
        return jnp.log(gauss_hermite(
            lambda f: jnp.exp(self.log_probability_density(f, y)),
            f_means, f_covariances))
