"""Stochastic differential equations: dx = f(x,t) dt + l(x,t) dB.

Rebuild of ``markovflow/sde/sde.py`` (219 LoC).  Gradients of the drift come
from JAX autodiff; expectations under Gaussians use a product Gauss-Hermite
grid (replaces gpflow's ``mvnquad``, H = 10).
"""
from __future__ import annotations

import abc
import itertools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.bijectors import positive
from ..utils.module import Module, Parameter

__all__ = ["SDE", "OrnsteinUhlenbeckSDE", "DoubleWellSDE", "Gaussian",
           "mvnquad"]


class Gaussian(NamedTuple):
    """Marginal Gaussian path: mu [..., N, d], cov [..., N, d, d]."""

    mu: jnp.ndarray
    cov: jnp.ndarray


def mvnquad(fn, means, covs, h: int = 10):
    """E_{x ~ N(means_n, covs_n)}[fn(x)_n] via a product Gauss-Hermite grid.

    means [N, d]; covs [N, d, d].  fn maps [M, d] -> [M, out_d] (applied to a
    flattened batch of evaluation points).  Returns [N, out_d].
    """
    d = means.shape[-1]
    xs, ws = np.polynomial.hermite.hermgauss(h)
    grids = list(itertools.product(*([range(h)] * d)))
    pts = np.array([[xs[i] for i in g] for g in grids])  # [h^d, d]
    wts = np.array([np.prod([ws[i] for i in g]) for g in grids])
    pts = jnp.asarray(pts, means.dtype) * np.sqrt(2.0)
    wts = jnp.asarray(wts / np.pi ** (d / 2.0), means.dtype)
    chol = jnp.linalg.cholesky(covs)  # [N, d, d]
    # eval points: [N, h^d, d]
    x_eval = means[:, None, :] + jnp.einsum("nij,kj->nki", chol, pts)
    n, k = x_eval.shape[0], x_eval.shape[1]
    vals = fn(x_eval.reshape(n * k, d))
    vals = vals.reshape(n, k, -1)
    return jnp.einsum("k,nko->no", wts, vals)


class SDE(Module, abc.ABC):
    """(reference: sde/sde.py:23-129)."""

    @property
    @abc.abstractmethod
    def state_dim(self) -> int:
        ...

    @abc.abstractmethod
    def drift(self, x, t):
        """f(x, t): [..., d] -> [..., d]."""

    @abc.abstractmethod
    def diffusion(self, x, t):
        """l(x, t): [..., d] -> [..., d, d] (Cholesky of the noise rate)."""

    def gradient_drift(self, x, t=None):
        """df/dx elementwise (diagonal of the Jacobian), [..., d]
        (reference: sde.py:73-88; autodiff replaces the GradientTape)."""
        if t is None:
            t = jnp.zeros(x.shape[:-1] + (1,), x.dtype)

        def scalar_drift(xi):
            return jnp.sum(self.drift(xi[None, :], t[:1]))

        flat = x.reshape(-1, x.shape[-1])
        grads = jax.vmap(jax.grad(scalar_drift))(flat)
        return grads.reshape(x.shape)

    def expected_drift(self, q_mean, q_covar):
        """E_q[f(x)] with q = N(q_mean, q_covar), shapes
        (batch, N, d) / (batch, N, d, d) (reference: sde.py:90-109)."""
        b, n, d = q_mean.shape
        fn = lambda x: self.drift(x, jnp.zeros((x.shape[0], 1), x.dtype))
        out = mvnquad(fn, q_mean.reshape(-1, d), q_covar.reshape(-1, d, d))
        return out.reshape(b, n, d)

    def expected_gradient_drift(self, q_mean, q_covar):
        """E_q[f'(x)] (reference: sde.py:111-129)."""
        b, n, d = q_mean.shape
        fn = lambda x: self.gradient_drift(x)
        out = mvnquad(fn, q_mean.reshape(-1, d), q_covar.reshape(-1, d, d))
        return out.reshape(b, n, d)


class OrnsteinUhlenbeckSDE(SDE):
    """dx = -decay x dt + dB, Var(dB) = q dt (reference: sde.py:132-174)."""

    def __init__(self, decay: float = 1.0, q: float = 1.0):
        self.decay = Parameter(decay, transform=positive())
        self.q = jnp.asarray(q)

    @property
    def state_dim(self) -> int:
        return 1

    def drift(self, x, t):
        return -self.decay.value * x

    def diffusion(self, x, t):
        d = x.shape[-1]
        return jnp.broadcast_to(
            jnp.sqrt(self.q) * jnp.eye(d, dtype=x.dtype),
            x.shape[:-1] + (d, d))


class DoubleWellSDE(SDE):
    """dx = 4 x (1 - x^2) dt + dB (reference: sde.py:177-219)."""

    def __init__(self, q: float = 1.0):
        self.q = jnp.asarray(q)

    @property
    def state_dim(self) -> int:
        return 1

    def drift(self, x, t):
        return 4.0 * x * (1.0 - x**2)

    def diffusion(self, x, t):
        d = x.shape[-1]
        return jnp.broadcast_to(
            jnp.sqrt(self.q) * jnp.eye(d, dtype=x.dtype),
            x.shape[:-1] + (d, d))
