"""Multistage likelihood for intermittent demand (Seeger et al. 2016)
(reference: markovflow/likelihoods/mutlistage_likelihood.py:25-179 —
note the reference filename typo).

Three latents F = (F0, F1, F2) form a decision tree:
    log p(Y|F) = d(Y=0) log s(F0)
               + d(Y=1) [log(1-s(F0)) + log s(F1)]
               + d(Y>1) [log(1-s(F0)) + log(1-s(F1)) + log Poisson(Y-2 | exp(F2))]
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import Likelihood, gauss_hermite
from .scalar import Bernoulli, Poisson, inv_probit

__all__ = ["MultiStageLikelihood"]


class MultiStageLikelihood(Likelihood):
    def __init__(self, invlink_bernoulli=inv_probit):
        self.bernoulli = Bernoulli(invlink=invlink_bernoulli)
        self.poisson = Poisson()

    @property
    def latent_dim(self):
        return 3

    def _branch_log_probs(self, f0, f1, f2, y):
        ones = jnp.ones_like(y)
        zeros_y = jnp.zeros_like(y)
        lp0 = self.bernoulli.log_probability_density(f0, ones)
        lpn0 = self.bernoulli.log_probability_density(f0, zeros_y)
        lp1 = self.bernoulli.log_probability_density(f1, ones)
        lpn1 = self.bernoulli.log_probability_density(f1, zeros_y)
        lp2 = self.poisson.log_probability_density(f2, jnp.maximum(y - 2, 0))
        return lp0, lpn0, lp1, lpn1, lp2

    def log_probability_density(self, f, y):
        """f [..., N, 3], y [..., N, 1] -> [..., N] (reference: :68-100)."""
        f0, f1, f2 = f[..., 0:1], f[..., 1:2], f[..., 2:3]
        lp0, lpn0, lp1, lpn1, lp2 = self._branch_log_probs(f0, f1, f2, y)
        y0 = y[..., 0]
        return jnp.where(
            y0 == 0, lp0,
            jnp.where(y0 == 1, lpn0 + lp1, lpn0 + lpn1 + lp2))

    def variational_expectations(self, f_means, f_covariances, y):
        """Factored q(F) = prod_k N(Fmu_k, Fvar_k): per-latent quadrature
        (reference: :102-148).  f_covariances is the diagonal [..., N, 3]."""
        def per_latent(idx, fn):
            return gauss_hermite(
                fn, f_means[..., idx:idx + 1], f_covariances[..., idx:idx + 1])

        ones, zeros_y = jnp.ones_like(y), jnp.zeros_like(y)
        e_lp0 = per_latent(0, lambda f: self.bernoulli.log_probability_density(f, ones))
        e_lpn0 = per_latent(0, lambda f: self.bernoulli.log_probability_density(f, zeros_y))
        e_lp1 = per_latent(1, lambda f: self.bernoulli.log_probability_density(f, ones))
        e_lpn1 = per_latent(1, lambda f: self.bernoulli.log_probability_density(f, zeros_y))
        # Poisson with exp link is analytic
        e_lp2 = self.poisson.variational_expectations(
            f_means[..., 2:3], f_covariances[..., 2:3], jnp.maximum(y - 2, 0))
        y0 = y[..., 0]
        return jnp.where(
            y0 == 0, e_lp0,
            jnp.where(y0 == 1, e_lpn0 + e_lp1, e_lpn0 + e_lpn1 + e_lp2))

    def predict_mean_and_var(self, f_means, f_covariances):
        """Moments of Y by branch probabilities (quadrature)."""
        p0, _ = self.bernoulli.predict_mean_and_var(
            f_means[..., 0:1], f_covariances[..., 0:1])
        p1, _ = self.bernoulli.predict_mean_and_var(
            f_means[..., 1:2], f_covariances[..., 1:2])
        lam, lam_var = self.poisson.predict_mean_and_var(
            f_means[..., 2:3], f_covariances[..., 2:3])
        mean = (1 - p0) * (p1 * 1.0 + (1 - p1) * (lam + 2.0))
        e_y2 = (1 - p0) * (p1 + (1 - p1) * (lam_var + (lam + 2.0) ** 2))
        return mean, e_y2 - mean**2

    def predict_density(self, f_means, f_covariances, y):
        def fn_per(fs):
            return jnp.exp(self.log_probability_density(fs, y))

        # joint quadrature over 3 independent latents is expensive; use the
        # tree structure: branches are independent expectations.
        p0 = gauss_hermite(lambda f: self.bernoulli.invlink(f),
                           f_means[..., 0:1], f_covariances[..., 0:1])[..., 0]
        p1 = gauss_hermite(lambda f: self.bernoulli.invlink(f),
                           f_means[..., 1:2], f_covariances[..., 1:2])[..., 0]
        pois = jnp.exp(self.poisson.predict_density(
            f_means[..., 2:3], f_covariances[..., 2:3], jnp.maximum(y - 2, 0)))
        y0 = y[..., 0]
        prob = jnp.where(
            y0 == 0, p0,
            jnp.where(y0 == 1, (1 - p0) * p1, (1 - p0) * (1 - p1) * pois))
        return jnp.log(prob)

    def sample_y(self, key, f):
        """Draw Y | F (reference: :150-179)."""
        f0, f1, f2 = f[..., 0], f[..., 1], f[..., 2]
        k0, k1, k2 = jax.random.split(key, 3)
        b0 = jax.random.bernoulli(k0, self.bernoulli.invlink(f0))
        b1 = jax.random.bernoulli(k1, self.bernoulli.invlink(f1))
        pois = jax.random.poisson(k2, jnp.exp(f2))
        return jnp.where(b0, 0, jnp.where(b1, 1, pois + 2)).astype(f.dtype)
