"""Natural-gradient optimizer for trainable state-space models.

Rebuild of ``markovflow/ssm_natgrad.py`` (244 LoC).  The natural gradient of a
loss L w.r.t. the natural parameters theta equals dL/d(eta) (the expectation
parameters).  The reference computes this with a persistent GradientTape and
``output_gradients`` chain-rule tricks (reference: ssm_natgrad.py:121-218);
in JAX it is one ``jax.vjp`` through ``expectations_to_ssm_params``:

    g_ssm   = grad_ssm L
    g_eta   = vjp(expectations_to_ssm_params, eta)(g_ssm)   # = natgrad in theta
    theta  <- theta - gamma * g_eta
    ssm    <- naturals_to_ssm(theta)

Pure-functional: ``step`` returns a new SSM (raw array fields), not an
in-place update.  Optional Adam-style momentum on theta with a Fisher-norm
(g . g_tilde) scale, mirroring the reference (reference: ssm_natgrad.py:177-210).

Precision note: natural/expectation parameters of a dense-grid SSM are
intrinsically ill-scaled — theta_diag carries ``Q^{-1} ~ dt^{-3}`` terms
(e.g. ~1e7 at dt = 1e-3 for Matern-3/2), so float32's 1e-7 relative error
wipes out the O(1) information and the reconstructed covariances go
indefinite (NaN in the Cholesky).  Run natural-gradient training in float64
(``jax.config.update("jax_enable_x64", True)``), as the TF reference
implicitly does; for float32 dense-grid training use the CVI family, whose
gain-form site updates never materialize precisions.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .ops.kalman import _from_tl, _to_tl
from .ssm_gaussian_transformations import (
    expectations_to_ssm_params_tl,
    naturals_to_ssm,
    naturals_to_ssm_params_parallel_tl,
    ssm_to_expectations_tl,
    ssm_to_naturals,
    ssm_to_naturals_tl,
)
from .state_space_model import StateSpaceModel

__all__ = ["SSMNaturalGradient", "NatGradState"]


class NatGradState(NamedTuple):
    momentum: Optional[Tuple]  # theta-shaped pytree or None
    fisher_norm: jnp.ndarray  # scalar moving average of g . g_tilde
    count: jnp.ndarray


class SSMNaturalGradient:
    """(reference: ssm_natgrad.py:33-244)."""

    def __init__(self, gamma: float = 0.1, momentum: bool = False,
                 beta1: float = 0.9, beta2: float = 0.99,
                 epsilon: float = 1e-8, naturals_engine: str = "sequential"):
        """``naturals_engine``: how theta -> SSM is inverted each step.
        "sequential" is the UDU backward recursion (O(N) depth, matches the
        reference bit-for-bit); "parallel" is the O(log N)-depth
        synthetic-model reduction (:func:`naturals_to_ssm_params_parallel`)
        — the right choice on TPU for dense-grid VGP training."""
        self.gamma = gamma
        self.momentum = momentum
        self.beta1 = beta1
        self.beta2 = beta2
        self.epsilon = epsilon
        self.naturals_engine = naturals_engine

    def _naturals_to_ssm_tl(self, theta_tl) -> StateSpaceModel:
        """theta (TL layout) -> StateSpaceModel (standard-layout fields)."""
        if self.naturals_engine == "parallel":
            a_tl, b_tl, chol_p0, chol_q_tl, mu0 = \
                naturals_to_ssm_params_parallel_tl(*theta_tl)
            return StateSpaceModel(
                mu0[..., 0, 0], chol_p0[..., 0], _from_tl(a_tl),
                _from_tl(b_tl)[..., 0], _from_tl(chol_q_tl))
        th_lin, th_diag, th_sub = theta_tl
        return naturals_to_ssm(_from_tl(th_lin)[..., 0], _from_tl(th_diag),
                               _from_tl(th_sub))

    def init(self, ssm: StateSpaceModel) -> NatGradState:
        if not self.momentum:
            return NatGradState(None, jnp.zeros(()), jnp.zeros((), jnp.int32))
        theta = ssm_to_naturals_tl(ssm)
        zeros = jax.tree_util.tree_map(jnp.zeros_like, theta)
        return NatGradState(zeros, jnp.zeros(()), jnp.zeros((), jnp.int32))

    def make_step(self, loss_fn: Callable[[StateSpaceModel], jnp.ndarray]):
        """A jitted ``(ssm, state) -> (ssm, state, loss)`` step function.

        Prefer this over calling :meth:`step` in a Python loop: an eager
        step dispatches thousands of ops per iteration (measured ~50x the
        compiled cost on a 1-core host); the jitted step compiles once.
        """
        import functools

        return jax.jit(functools.partial(self.step, loss_fn))

    def step(self, loss_fn: Callable[[StateSpaceModel], jnp.ndarray],
             ssm: StateSpaceModel, state: Optional[NatGradState] = None):
        """One natural-gradient step.  ``ssm`` must have raw array fields
        (use ``non_trainable_copy()``).  Returns (new_ssm, state, loss).
        For loops, use :meth:`make_step` (jitted) instead."""
        if state is None:
            state = self.init(ssm)
        loss, g_ssm = jax.value_and_grad(loss_fn)(ssm)
        # Everything below runs in time-last layout: the standard
        # [N, d, d] layout tile-pads every d x d block to an (8, 128) TPU
        # tile, and the f64 natgrad graph in that layout did not finish
        # XLA-compiling in 500 s at T = 1e5 (ssm_to_naturals alone: 222 s).
        # moveaxis of the loss cotangents is exact (a relayout, not math).
        g_tl = (
            _to_tl(g_ssm.state_transitions),
            _to_tl(g_ssm.state_offsets[..., None]),
            g_ssm.cholesky_initial_covariance[..., None],
            _to_tl(g_ssm.cholesky_process_covariances),
            g_ssm.initial_mean[..., None, None],
        )
        eta = ssm_to_expectations_tl(ssm)
        _, vjp_fn = jax.vjp(lambda e: expectations_to_ssm_params_tl(*e), eta)
        (g_eta,) = vjp_fn(g_tl)  # dL/d eta == natgrad direction in theta

        theta = ssm_to_naturals_tl(ssm)
        if self.momentum:
            mom = jax.tree_util.tree_map(
                lambda m, g: self.beta1 * m + (1.0 - self.beta1) * g,
                state.momentum, g_eta)
            # Fisher norm <g, g_tilde> with g the theta-gradient approximated
            # by g_eta itself (positive semidefinite pairing)
            sq = sum(jnp.sum(a * a) for a in jax.tree_util.tree_leaves(g_eta))
            fisher = self.beta2 * state.fisher_norm + (1.0 - self.beta2) * sq
            count = state.count + 1
            mom_hat = jax.tree_util.tree_map(
                lambda m: m / (1.0 - self.beta1 ** count), mom)
            fisher_hat = fisher / (1.0 - self.beta2 ** count)
            scale = self.gamma / (jnp.sqrt(fisher_hat) + self.epsilon)
            theta_new = jax.tree_util.tree_map(
                lambda t, m: t - scale * m, theta, mom_hat)
            state = NatGradState(mom, fisher, count)
        else:
            theta_new = jax.tree_util.tree_map(
                lambda t, g: t - self.gamma * g, theta, g_eta)
            state = NatGradState(None, state.fisher_norm, state.count + 1)
        new_ssm = self._naturals_to_ssm_tl(theta_new)
        return new_ssm, state, loss
