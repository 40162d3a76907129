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

from .conditionals import conditional_statistics
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
        (reference: posterior.py:207-229).

        Runs the time-last projection core (:func:`markovflow_tpu.
        conditionals.conditional_predict_tl`) and converts at the
        boundary: the standard-layout core's [N, d, 2d] intermediates
        tile-pad catastrophically on TPU (measured 279.8 ms forward at
        N=1e5/f64 vs ~ms for the TL core on the SVGP hot path)."""
        from .conditionals import conditional_predict_tl

        means_tl, covs_tl = conditional_predict_tl(
            new_time_points, self.conditioning_time_points, self.kernel,
            self.dist)
        return (jnp.moveaxis(means_tl[..., 0, :], -1, -2),
                jnp.moveaxis(covs_tl, -1, -3))

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
        s, _ = self.sample_state_trajectories(new_time_points, sample_shape,
                                              key)
        return s

    def sample_state_trajectories(self, new_time_points, sample_shape, key):
        """Joint samples (s at new points, u at conditioning points) from
        q(u) p(s | u) (reference: posterior.py:260-377).  Returns (s, u)."""
        if isinstance(sample_shape, int):
            sample_shape = (sample_shape,)
        z = self.conditioning_time_points
        key_p, key_q = jax.random.split(key)
        u_o = self.dist.sample(key_q, sample_shape)
        s = self._sample_states_given_u(key_p, new_time_points, u_o)
        return s, u_o

    def _sample_states_given_u(self, key, t_new, u_o):
        """Prior trajectory over [Z, t_new] pathwise-corrected to hit the
        given u draws at Z."""
        z = self.conditioning_time_points
        n_z = z.shape[-1]
        sample_shape = u_o.shape[: u_o.ndim - 2 - len(self.dist.batch_shape)]
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
        v = u_p - u_o
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
        full = getattr(self.likelihood, "needs_full_cov", False)
        f_means, f_covs = self.predict_f(new_time_points,
                                         full_output_cov=full)
        return self.likelihood.predict_mean_and_var(f_means, f_covs)


class ImportanceWeightedPosteriorProcess(PosteriorProcess):
    """Importance-weighted posterior for IWVI
    (reference: posterior.py:471-787)."""

    def __init__(self, num_importance_samples: int, proposal_dist,
                 kernel, inducing_points, likelihood, mean_function=None):
        self.num_importance_samples = num_importance_samples
        self.proposal_dist = proposal_dist  # q(u), a GaussMarkovDistribution
        self.kernel = kernel
        self.inducing_points = inducing_points
        self.likelihood = likelihood
        self.mean_function = mean_function

    @property
    def proposal_process(self) -> ConditionalProcess:
        return ConditionalProcess(self.proposal_dist, self.kernel,
                                  self.inducing_points)

    def log_importance_weights(self, samples_s, samples_u, input_data,
                               stop_gradient: bool = False):
        """log w = log p(Y|s) + log p(u) - log q(u) for given joint samples
        (reference: posterior.py:522-580).  With ``stop_gradient`` the
        proposal's parameters are detached inside log q(u) (DREGS)."""
        time_points, observations = input_data
        em = self.kernel.generate_emission_model(time_points)
        f = em.project_state_to_f(samples_s)
        if self.mean_function is not None:
            f = f + self.mean_function(time_points)
        log_py = jnp.sum(
            self.likelihood.log_probability_density(f, observations), axis=-1)
        prior_z = self.kernel.state_space_model(self.inducing_points)
        log_p_u = prior_z.log_pdf(samples_u)
        dist_q = self.proposal_dist
        if stop_gradient:
            dist_q = jax.lax.stop_gradient(dist_q)
        log_q_u = dist_q.log_pdf(samples_u)
        return log_py + log_p_u - log_q_u

    def predict_state(self, new_time_points):
        raise NotImplementedError(
            "IW posterior has no closed-form marginals; use expected_value "
            "or sample via the proposal_process.")

    def predict_f(self, new_time_points, full_output_cov: bool = False):
        return self.proposal_process.predict_f(new_time_points,
                                               full_output_cov)

    def sample_state(self, new_time_points, sample_shape, key):
        return self.proposal_process.sample_state(new_time_points,
                                                  sample_shape, key)

    def _iwvi_samples_and_weights(self, new_time_points, input_data,
                                  sample_shape, key):
        """Joint proposal samples over [data, new] time points plus their
        log importance weights (reference: posterior.py:582-621).

        Returns (s_new, log_w, u) with shapes
        ``sample_shape + batch + [n_new, d]``, ``sample_shape + batch``,
        ``sample_shape + batch + [n_z, d]``.
        """
        time_points, _ = input_data
        all_time_points = jnp.concatenate([time_points, new_time_points],
                                          axis=-1)
        s, u = self.proposal_process.sample_state_trajectories(
            all_time_points, sample_shape, key)
        n_new = new_time_points.shape[-1]
        s_new = s[..., -n_new:, :]
        s_data = s[..., :-n_new, :]
        log_w = self.log_importance_weights(s_data, u, input_data)
        return s_new, log_w, u

    def sample_state_trajectories(self, new_time_points, sample_shape, key,
                                  *, input_data=None):
        """Resampled IW posterior trajectories (reference: posterior.py:623-674).

        Per MC replicate (``sample_shape``), draws ``num_importance_samples``
        joint proposal trajectories, then resamples the importance axis by
        a categorical over the self-normalized log weights — a draw from the
        importance-weighted posterior approximation.  Returns
        (states ``sample_shape + batch + [n_new, d]``, conditioning samples
        ``sample_shape + [K] + batch + [n_z, d]``).
        """
        if input_data is None:
            raise ValueError(
                "You need to provide `input_data` for doing inference with IW")
        if isinstance(sample_shape, int):
            sample_shape = (sample_shape,)
        k_axis = len(sample_shape)
        full_shape = tuple(sample_shape) + (self.num_importance_samples,)
        key_s, key_r = jax.random.split(key)
        samples, log_w, u = self._iwvi_samples_and_weights(
            new_time_points, input_data, full_shape, key_s)
        # log_w: sample_shape + [K] + batch; categorical over the K axis,
        # independently per MC replicate and batch element.
        idx = jax.random.categorical(
            key_r, jnp.moveaxis(log_w, k_axis, -1), axis=-1)
        # gather the chosen importance sample along axis k_axis
        idx_e = idx[..., None, None]  # sample_shape + batch + [1, 1]
        idx_e = jnp.expand_dims(idx_e, k_axis)
        chosen = jnp.take_along_axis(samples, idx_e, axis=k_axis)
        return jnp.squeeze(chosen, axis=k_axis), u

    def sample_f(self, new_time_points, sample_shape, key, *,
                 input_data=None):
        """Resampled IW posterior samples of f (reference: posterior.py:676-721)."""
        states, _ = self.sample_state_trajectories(
            new_time_points, sample_shape, key, input_data=input_data)
        em = self.kernel.generate_emission_model(new_time_points)
        f = em.project_state_to_f(states)
        if self.mean_function is not None:
            f = f + self.mean_function(new_time_points)
        return f

    def expected_value(self, new_time_points, input_data, key, func=None):
        """Self-normalized importance-weighted posterior expectation of
        func(states at new_time_points) (reference: posterior.py:708-758).

        Samples (s_data, u) jointly for the weights and s at the new points
        given the SAME u draws, so weights pair with function samples.
        """
        if func is None:
            func = lambda x: x
        k = self.num_importance_samples
        key_w, key_s = jax.random.split(key)
        proposal = self.proposal_process
        time_points, _ = input_data
        s_data, u = proposal.sample_state_trajectories(
            time_points, (k,), key_w)
        log_w = self.log_importance_weights(s_data, u, input_data)
        weights = jax.nn.softmax(log_w, axis=0)
        s_new = proposal._sample_states_given_u(key_s, new_time_points, u)
        vals = func(s_new)
        return jnp.einsum("k,k...->...", weights, vals)
