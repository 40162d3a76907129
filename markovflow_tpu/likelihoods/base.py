"""Likelihood interface + Gauss-Hermite quadrature.

Rebuild of the reference's ``markovflow/likelihoods/likelihoods.py:28-146`` and
the gpflow likelihoods used throughout (Gaussian, Bernoulli, Poisson).  All
quadrature is static-shape (fixed node count), fully batched — it lowers to a
single weighted reduction over a nodes axis on TPU.
"""
from __future__ import annotations

import abc

import jax.numpy as jnp
import numpy as np

from ..utils.module import Module

__all__ = ["Likelihood", "gauss_hermite"]

DEFAULT_NUM_GAUSS_HERMITE = 20


def gauss_hermite(fn, means, variances, num_points: int = DEFAULT_NUM_GAUSS_HERMITE):
    """E_{f ~ N(means, variances)}[fn(f)], elementwise over leading dims.

    Replaces gpflow's quadrature (used by the reference for non-analytic
    variational expectations).  fn must broadcast over a leading nodes axis.
    """
    xs, ws = np.polynomial.hermite.hermgauss(num_points)
    xs = jnp.asarray(xs, means.dtype)
    ws = jnp.asarray(ws / np.sqrt(np.pi), means.dtype)
    shape = (num_points,) + (1,) * means.ndim
    f_nodes = means[None] + jnp.sqrt(2.0 * variances)[None] * xs.reshape(shape)
    vals = fn(f_nodes)
    return jnp.tensordot(ws, vals, axes=(0, 0))


class Likelihood(Module, abc.ABC):
    """Scalar/vector likelihood over f = H x
    (reference: likelihoods/likelihoods.py:28-146)."""

    @abc.abstractmethod
    def log_probability_density(self, f, y):
        """log p(y | f), [..., N]."""

    @abc.abstractmethod
    def variational_expectations(self, f_means, f_covariances, y):
        """E_{q(f)}[log p(y | f)] with q = N(f_means, f_covariances), [..., N]."""

    @abc.abstractmethod
    def predict_density(self, f_means, f_covariances, y):
        """log integral p(y|f) q(f) df, [..., N]."""

    @abc.abstractmethod
    def predict_mean_and_var(self, f_means, f_covariances):
        """Moments of p(y) = integral p(y|f) q(f) df."""
