"""Training loop helpers: optimizers over model pytrees + checkpointing.

The reference has no training or checkpoint subsystem (users drive TF
optimizers by hand and rely on TF checkpointing; SURVEY.md section 5).  Here
models are pytrees, so:

* :func:`fit` runs a jitted optax loop over the trainable leaves;
* :func:`fit_natgrad` alternates natural-gradient steps on the variational
  SSM with Adam steps on hyperparameters (the reference's two-phase loop);
* :func:`save_checkpoint` / :func:`load_checkpoint` persist any model pytree
  with orbax.
"""
from __future__ import annotations

import os
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from .ssm_natgrad import SSMNaturalGradient
from .utils.module import (filtered_value_and_grad, trainable_mask,
                           zero_untrainable)

__all__ = ["fit", "fit_natgrad", "save_checkpoint", "load_checkpoint"]


def fit(model, loss_fn: Optional[Callable] = None, num_steps: int = 100,
        optimizer=None, unroll: int = 1):
    """Minimize ``loss_fn(model)`` (default ``model.loss()``) over the
    trainable Parameters.  Returns (trained_model, losses [num_steps])."""
    if loss_fn is None:
        loss_fn = lambda m: m.loss()
    if optimizer is None:
        optimizer = optax.adam(1e-2)
    mask = trainable_mask(model)
    opt_state = optimizer.init(model)

    @jax.jit
    def step(m, s):
        # differentiate only the trainable leaves: skips the (large) data
        # arrays' backward branches, ~1.6x on the GPR step at T = 1e6
        loss, grads = filtered_value_and_grad(loss_fn, m, mask)
        updates, s = optimizer.update(grads, s)
        m = jax.tree_util.tree_map(lambda a, b: a + b, m, updates)
        return m, s, loss

    losses = []
    for _ in range(num_steps):
        model, opt_state, loss = step(model, opt_state)
        losses.append(loss)
    return model, jnp.stack(losses)


def fit_natgrad(model, num_steps: int = 50, gamma: float = 0.5,
                hyper_optimizer=None, hyper_loss: Optional[Callable] = None,
                naturals_engine: str = "parallel"):
    """Two-phase loop for variational models exposing ``dist_q`` /
    ``with_dist_q``: natgrad on the variational SSM, Adam on the rest.

    ``naturals_engine="parallel"`` (default) inverts theta -> SSM with the
    O(log N)-depth synthetic-model reduction — the right engine on TPU for
    dense grids; pass "sequential" for the reference's UDU recursion
    (reference: ssm_natgrad.py:95-218 wraps the banded sequential path)."""
    if hyper_optimizer is None:
        hyper_optimizer = optax.adam(1e-2)
    if hyper_loss is None:
        hyper_loss = lambda m: m.loss()
    natgrad = SSMNaturalGradient(gamma=gamma, naturals_engine=naturals_engine)
    mask = trainable_mask(model)
    opt_state = hyper_optimizer.init(model)

    @jax.jit
    def hyper_step(m, s):
        loss, grads = jax.value_and_grad(hyper_loss)(m)
        grads = zero_untrainable(grads, mask)
        # the variational SSM belongs to the natgrad phase, not Adam
        grads = grads.replace(_dist_q=jax.tree_util.tree_map(
            jnp.zeros_like, grads._dist_q))
        updates, s = hyper_optimizer.update(grads, s)
        return jax.tree_util.tree_map(lambda a, b: a + b, m, updates), s, loss

    @jax.jit
    def nat_step(m):
        ssm = m.dist_q.non_trainable_copy()
        new_ssm, _, loss = natgrad.step(
            lambda q: m.with_dist_q(q).loss(), ssm)
        return m.with_dist_q(new_ssm), loss

    losses = []
    for _ in range(num_steps):
        model, _ = nat_step(model)
        model, opt_state, loss = hyper_step(model, opt_state)
        losses.append(loss)
    return model, jnp.stack(losses)


def save_checkpoint(path: str, model) -> None:
    """Persist a model pytree with orbax (leaves only; rebuild the model
    object with the same constructor arguments to restore)."""
    import orbax.checkpoint as ocp

    leaves, _ = jax.tree_util.tree_flatten(model)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.abspath(path), leaves, force=True)


def load_checkpoint(path: str, model_template):
    """Restore a model saved by :func:`save_checkpoint` into the structure of
    ``model_template`` (a model built with the same constructor arguments)."""
    import orbax.checkpoint as ocp

    leaves, treedef = jax.tree_util.tree_flatten(model_template)
    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(os.path.abspath(path), item=leaves)
    return jax.tree_util.tree_unflatten(treedef, restored)
