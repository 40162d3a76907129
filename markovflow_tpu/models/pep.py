"""Power Expectation Propagation with Gaussian sites.

Rebuild of ``markovflow/models/pep.py`` (261 LoC).  Classic (P)EP on a
Markovian GP: the cavity is formed by subtracting an alpha-fraction of a
site's natural parameters from the posterior marginal's, the tilted moments
come from ``log E_cav[p(y|f)^alpha]`` gradients, and sites are damped
natural-parameter updates (Seeger 2005; reference: pep.py:120-215).

Deviation from the reference: ``update_sites(site_indices=None)`` updates ALL
sites (the reference's index mask returns all-zeros for None, freezing every
site — an apparent bug kept out of this rebuild).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from ..kernels import SDEKernel
from ..likelihoods import PEPScalarLikelihood
from ..mean_function import MeanFunction
from ..utils.linalg import small_inv, symmetrize
from .variational_cvi import GaussianProcessWithSitesBase, back_project_nats

__all__ = ["PowerExpectationPropagation", "gradient_correction"]


def gradient_correction(inputs, grads):
    """Moment-matching correction: gradients of log Z w.r.t. cavity (mu, var)
    -> site natural parameter updates (reference: pep.py:250-261)."""
    mu, var = inputs
    g1, g2 = grads
    l2 = 0.5 / (var + 1.0 / g2)
    l1 = 2.0 * l2 * (g1 / g2 - mu)
    return l1, l2


class PowerExpectationPropagation(GaussianProcessWithSitesBase):
    def __init__(self, kernel: SDEKernel,
                 input_data: Tuple[jnp.ndarray, jnp.ndarray],
                 likelihood: PEPScalarLikelihood,
                 mean_function: Optional[MeanFunction] = None,
                 learning_rate: float = 1.0, alpha: float = 1.0,
                 sites=None):
        super().__init__(input_data, kernel, likelihood, mean_function, sites)
        self.learning_rate = learning_rate
        self.alpha = alpha

    def local_objective(self, f_mu, f_var, y):
        """log E_q(f)[p(y|f)^alpha] (reference: pep.py:100-102)."""
        return self.likelihood.log_expected_density(f_mu, f_var, y,
                                                    alpha=self.alpha)

    def local_objective_gradients(self, f_mu, f_var):
        obj, grads = self.likelihood.grad_log_expected_density(
            f_mu, f_var, self.observations, alpha=self.alpha)
        return obj, gradient_correction((f_mu, f_var), grads)

    def _cavity_from_marginals(self, means, covs):
        """Cavity marginals q^{-n}(f_n) of q/t_n^alpha
        (reference: pep.py:120-157)."""
        prec = small_inv(symmetrize(covs))
        nat2 = -0.5 * prec
        nat1 = jnp.einsum("...nij,...nj->...ni", prec, means)
        h = self.emission.emission_matrix
        bp_nat1, bp_nat2 = back_project_nats(
            self.sites.nat1, self.sites.nat2[..., 0], h)
        cav_nat1 = nat1 - self.alpha * bp_nat1
        cav_nat2 = nat2 - self.alpha * bp_nat2
        cav_cov = 0.5 * small_inv(symmetrize(-cav_nat2))
        cav_mean = jnp.einsum("...nij,...nj->...ni", cav_cov, cav_nat1)
        em = self.emission
        return em.project_state_marginals_to_f(cav_mean, symmetrize(cav_cov))

    def compute_cavity(self):
        means, covs = self.dist_q.marginals
        return self._cavity_from_marginals(means, covs)

    def _log_norms_and_grads(self):
        means, covs = self.dist_q.marginals
        em = self.emission
        marg_mu, marg_var = em.project_state_marginals_to_f(means, covs)
        cav_mu, cav_var = self._cavity_from_marginals(means, covs)
        obj, grads = self.local_objective_gradients(cav_mu, cav_var)
        log_norm_cav = 0.5 * (jnp.log(cav_var) + cav_mu**2 / cav_var)
        log_norm_marg = 0.5 * (jnp.log(marg_var) + marg_mu**2 / marg_var)
        log_norm = obj + log_norm_cav[..., 0] - log_norm_marg[..., 0]
        return log_norm, grads

    def compute_log_norm(self):
        """(reference: pep.py:161-180)."""
        log_norm, _ = self._log_norms_and_grads()
        return log_norm

    def update_sites(self, site_indices=None) -> "PowerExpectationPropagation":
        """Damped PEP update; returns a new model (reference: pep.py:182-215)."""
        log_norm, grads = self._log_norms_and_grads()
        a, lr = self.alpha, self.learning_rate
        pep_nat1 = (1 - a) * self.sites.nat1 + grads[0]
        pep_nat2 = ((1 - a) * self.sites.nat2[..., 0] + grads[1])[..., None]
        pep_log_norm = (1 - a) * self.sites.log_norm + log_norm[..., None]
        new_nat1 = (1 - lr) * self.sites.nat1 + lr * pep_nat1
        new_nat2 = (1 - lr) * self.sites.nat2 + lr * pep_nat2
        new_log_norm = (1 - lr) * self.sites.log_norm + lr * pep_log_norm
        if site_indices is not None:
            mask = jnp.zeros(self.time_points.shape[-1],
                             bool).at[site_indices].set(True)
            new_nat1 = jnp.where(mask[..., None], new_nat1, self.sites.nat1)
            new_nat2 = jnp.where(mask[..., None, None], new_nat2,
                                 self.sites.nat2)
            new_log_norm = jnp.where(mask[..., None], new_log_norm,
                                     self.sites.log_norm)
        sites = self.sites.replace_nats(new_nat1, new_nat2)
        sites = sites.replace(log_norm=new_log_norm)
        return self.replace(sites=sites)

    def elbo(self) -> jnp.ndarray:
        """Marginal likelihood of the site-augmented model
        (reference: pep.py:217-221)."""
        return self.posterior_kalman.log_likelihood(
            grad_engine=self.grad_engine)

    def energy(self) -> jnp.ndarray:
        """PEP energy (reference: pep.py:223-230)."""
        log_norm = self.compute_log_norm()
        return (self.dist_q.normalizer - self.dist_p.normalizer
                + jnp.sum(log_norm) / self.alpha)

    def loss(self) -> jnp.ndarray:
        return -self.energy()

    def predict_log_density(self, input_data):
        x, y = input_data
        f_mu, f_var = self.posterior.predict_f(x)
        return self.likelihood.predict_density(f_mu, f_var, y)
