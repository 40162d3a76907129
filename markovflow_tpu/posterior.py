"""Posterior processes: prediction and sampling at arbitrary time points.

Rebuild of ``markovflow/posterior.py`` (813 LoC).  A posterior process wraps a
Gauss-Markov distribution over states at conditioning points and extends it to
the whole real line via the Markov conditionals
(reference: posterior.py:166-410).
"""
from __future__ import annotations

import abc
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .conditionals import (
    base_conditional_predict,
    conditional_predict,
    conditional_statistics,
    pairwise_marginals,
)
from .gauss_markov import GaussMarkovDistribution
from .utils.module import Module

__all__ = [
    "PosteriorProcess",
    "ConditionalProcess",
    "AnalyticPosteriorProcess",
    "ImportanceWeightedPosteriorProcess",
]


class PosteriorProcess(Module, abc.ABC):
    """Interface (reference: posterior.py:37-162)."""

    @abc.abstractmethod
    def predict_state(self, new_time_points):
        ...

    @abc.abstractmethod
    def predict_f(self, new_time_points, full_output_cov: bool = False):
        ...

    @abc.abstractmethod
    def sample_state(self, new_time_points, sample_shape, key):
        ...

    def sample_f(self, new_time_points, sample_shape, key):
        samples = self.sample_state(new_time_points, sample_shape, key)
        em = self.kernel.generate_emission_model(new_time_points)
        return em.project_state_to_f(samples)


class ConditionalProcess(PosteriorProcess):
    """q(s(.)) = integral p(s(.) | s(Z)) q(s(Z)) dZ: closed-form marginals +
    pathwise conditioned sampling (reference: posterior.py:166-410)."""

    def __init__(self, posterior_dist: GaussMarkovDistribution, kernel,
                 conditioning_time_points):
        self.dist = posterior_dist
        self.kernel = kernel
        self.conditioning_time_points = conditioning_time_points

    def predict_state(self, new_time_points):
        """Marginal state means/covs at new points
        (reference: posterior.py:207-229)."""
        return conditional_predict(
            new_time_points, self.conditioning_time_points, self.kernel,
            self.dist)

    def predict_f(self, new_time_points, full_output_cov: bool = False):
        """(reference: posterior.py:231-258)."""
        means, covs = self.predict_state(new_time_points)
        em = self.kernel.generate_emission_model(new_time_points)
        return em.project_state_marginals_to_f(means, covs, full_output_cov)

    def sample_state(self, new_time_points, sample_shape, key):
        """Joint posterior samples via pathwise conditioning: draw a prior
        trajectory over [Z, new], a posterior draw u_o ~ q(s(Z)), and correct
        s_o(t) = s_p(t) - P (u_p_pair - u_o_pair)
        (Doubly-Sparse VGP App.2; reference: posterior.py:260-377)."""
        if isinstance(sample_shape, int):
            sample_shape = (sample_shape,)
        z = self.conditioning_time_points
        t_new = new_time_points
        n_z = z.shape[-1]
        all_times = jnp.concatenate([z, t_new], axis=-1)
        order = jnp.argsort(all_times, axis=-1, stable=True)
        sorted_times = jnp.take_along_axis(all_times, order, axis=-1)
        inv_order = jnp.argsort(order, axis=-1, stable=True)

        key_p, key_q = jax.random.split(key)
        prior_ssm = self.kernel.state_space_model(sorted_times)
        s_p = prior_ssm.sample(key_p, sample_shape)  # [S..., Nz+Nt, d]
        u_o = self.dist.sample(key_q, sample_shape)  # [S..., Nz, d]

        u_p = jnp.take_along_axis(
            s_p, jnp.broadcast_to(
                inv_order[..., :n_z, None],
                s_p.shape[:-2] + (n_z, s_p.shape[-1])), axis=-2)
        s_p_new = jnp.take_along_axis(
            s_p, jnp.broadcast_to(
                inv_order[..., n_z:, None],
                s_p.shape[:-2] + (t_new.shape[-1], s_p.shape[-1])), axis=-2)

        # neighbour-pair correction vector, phantom zeros at both ends
        v = u_p - u_o
        zeros = jnp.zeros_like(v[..., :1, :])
        v_ext = jnp.concatenate([zeros, v, zeros], axis=-2)
        pair_v = jnp.concatenate([v_ext[..., :-1, :], v_ext[..., 1:, :]],
                                 axis=-1)  # [S..., Nz+1, 2d]
        p_proj, _, _, indices = conditional_statistics(t_new, z, self.kernel)
        adj_v = jnp.take_along_axis(
            pair_v, jnp.broadcast_to(
                indices[..., None],
                pair_v.shape[:-2] + (t_new.shape[-1], pair_v.shape[-1])),
            axis=-2)
        correction = jnp.einsum("...nij,...nj->...ni", p_proj, adj_v)
        return s_p_new - correction

    def sample_state_trajectories(self, new_time_points, sample_shape, key):
        """Alias used by IWVI (reference: posterior.py:260)."""
        return self.sample_state(new_time_points, sample_shape, key)


class AnalyticPosteriorProcess(ConditionalProcess):
    """ConditionalProcess + likelihood for predict_y
    (reference: posterior.py:414-467)."""

    def __init__(self, posterior_dist, kernel, conditioning_time_points,
                 likelihood, mean_function=None):
        super().__init__(posterior_dist, kernel, conditioning_time_points)
        self.likelihood = likelihood
        self.mean_function = mean_function

    def predict_f(self, new_time_points, full_output_cov: bool = False):
        means, covs = super().predict_f(new_time_points, full_output_cov)
        if self.mean_function is not None:
            means = means + self.mean_function(new_time_points)
        return means, covs

    def predict_y(self, new_time_points):
        """(reference: posterior.py:445-467)."""
        f_means, f_covs = self.predict_f(new_time_points)
        return self.likelihood.predict_mean_and_var(f_means, f_covs)


class ImportanceWeightedPosteriorProcess(PosteriorProcess):
    """Importance-weighted posterior for IWVI
    (reference: posterior.py:471-787)."""

    def __init__(self, num_importance_samples: int, proposal: ConditionalProcess,
                 likelihood, time_points, observations, mean_function=None):
        self.num_importance_samples = num_importance_samples
        self.proposal = proposal
        self.likelihood = likelihood
        self.time_points = time_points
        self.observations = observations
        self.mean_function = mean_function

    @property
    def kernel(self):
        return self.proposal.kernel

    def log_importance_weights(self, key, sample_shape=()):
        """log w = log p(Y|s) + log p(u) - log q(u), u on inducing points,
        s sampled jointly with u (reference: posterior.py:522-580).

        Returns log weights [sample_shape..., K] plus the state samples.
        """
        if isinstance(sample_shape, int):
            sample_shape = (sample_shape,)
        k = self.num_importance_samples
        shape = tuple(sample_shape) + (k,)
        key_s, key_u = jax.random.split(key)
        z = self.proposal.conditioning_time_points
        # sample u ~ q and states at data points conditioned pathwise
        u_samples = self.proposal.dist.sample(key_u, shape)
        states = self._sample_states_given_u(key_s, u_samples)
        em = self.kernel.generate_emission_model(self.time_points)
        f = em.project_state_to_f(states)
        if self.mean_function is not None:
            f = f + self.mean_function(self.time_points)
        log_py = jnp.sum(
            self.likelihood.log_probability_density(f, self.observations),
            axis=-1)
        prior_z = self.kernel.state_space_model(z)
        log_p_u = prior_z.log_pdf(u_samples)
        log_q_u = self.proposal.dist.log_pdf(u_samples)
        return log_py + log_p_u - log_q_u, states

    def _sample_states_given_u(self, key, u_samples):
        """Prior trajectory at data points corrected towards given u draws."""
        z = self.proposal.conditioning_time_points
        t_new = self.time_points
        n_z = z.shape[-1]
        sample_shape = u_samples.shape[: u_samples.ndim - 2 -
                                       len(self.proposal.dist.batch_shape)]
        all_times = jnp.concatenate([z, t_new], axis=-1)
        order = jnp.argsort(all_times, axis=-1, stable=True)
        sorted_times = jnp.take_along_axis(all_times, order, axis=-1)
        inv_order = jnp.argsort(order, axis=-1, stable=True)
        prior_ssm = self.kernel.state_space_model(sorted_times)
        s_p = prior_ssm.sample(key, sample_shape)
        u_p = jnp.take_along_axis(
            s_p, jnp.broadcast_to(
                inv_order[..., :n_z, None],
                s_p.shape[:-2] + (n_z, s_p.shape[-1])), axis=-2)
        s_p_new = jnp.take_along_axis(
            s_p, jnp.broadcast_to(
                inv_order[..., n_z:, None],
                s_p.shape[:-2] + (t_new.shape[-1], s_p.shape[-1])), axis=-2)
        v = u_p - u_samples
        zeros = jnp.zeros_like(v[..., :1, :])
        v_ext = jnp.concatenate([zeros, v, zeros], axis=-2)
        pair_v = jnp.concatenate([v_ext[..., :-1, :], v_ext[..., 1:, :]],
                                 axis=-1)
        p_proj, _, _, indices = conditional_statistics(t_new, z, self.kernel)
        adj_v = jnp.take_along_axis(
            pair_v, jnp.broadcast_to(
                indices[..., None],
                pair_v.shape[:-2] + (t_new.shape[-1], pair_v.shape[-1])),
            axis=-2)
        return s_p_new - jnp.einsum("...nij,...nj->...ni", p_proj, adj_v)

    def predict_state(self, new_time_points):
        raise NotImplementedError(
            "IW posterior has no closed-form marginals; use expected_value "
            "or sample via the proposal.")

    def predict_f(self, new_time_points, full_output_cov: bool = False):
        return self.proposal.predict_f(new_time_points, full_output_cov)

    def sample_state(self, new_time_points, sample_shape, key):
        return self.proposal.sample_state(new_time_points, sample_shape, key)

    def expected_value(self, key, new_time_points, func=None,
                       num_samples: int = 1):
        """Self-normalized importance-weighted posterior expectation of
        func(states at new_time_points) (reference: posterior.py:708-758)."""
        if func is None:
            func = lambda x: x
        log_w, _ = self.log_importance_weights(key, ())
        weights = jax.nn.softmax(log_w, axis=-1)
        key2 = jax.random.fold_in(key, 1)
        states = self.proposal.sample_state(
            new_time_points, (self.num_importance_samples,), key2)
        vals = func(states)
        return jnp.einsum("k,k...->...", weights, vals)
