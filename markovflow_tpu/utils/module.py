"""A minimal pytree module system (replaces gpflow.Module / gpflow.Parameter).

The reference library builds on ``gpflow.Module`` (TF variables + bijector
constraints, reference: markovflow/base.py, markovflow/kernels/matern.py:58-59).
In JAX the idiomatic equivalent is *modules as pytrees*: every :class:`Module`
subclass is registered with :mod:`jax.tree_util` so that models, kernels and
distributions flow through ``jit`` / ``grad`` / ``vmap`` directly.

* :class:`Parameter` — a constrained leaf: stores an *unconstrained* array plus
  a static bijector; ``.value`` is the constrained value.  Replaces
  ``gpflow.Parameter``.
* :class:`Module` — base class with automatic pytree flattening: any attribute
  holding arrays / Parameters / Modules (possibly nested in containers) is a
  pytree child, everything else is static auxiliary data.
* :func:`trainable_mask` / :func:`zero_untrainable` — functional replacement
  for TF variable trainability (reference: state_space_model.py:375-429
  ``create_trainable_copy``).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import default_float
from .bijectors import Bijector, Identity

__all__ = [
    "Parameter",
    "Module",
    "trainable_mask",
    "zero_untrainable",
    "filtered_value_and_grad",
    "module_flatten",
    "log_prior_density",
]


def _contains_array_like(value: Any) -> bool:
    """True if ``value`` should be treated as a pytree child."""
    if isinstance(value, (Parameter, Module, jax.Array, np.ndarray)):
        return True
    if isinstance(value, (list, tuple, dict)):
        leaves = jax.tree_util.tree_leaves(
            value, is_leaf=lambda x: isinstance(x, (Parameter, Module))
        )
        return any(
            isinstance(l, (Parameter, Module, jax.Array, np.ndarray)) for l in leaves
        )
    return False


@jax.tree_util.register_pytree_node_class
class Parameter:
    """A trainable array with a bijective constraint.

    The stored representation is unconstrained; ``value`` applies the bijector
    forward.  ``trainable`` is static metadata used by :func:`trainable_mask`.
    """

    def __init__(
        self,
        value=None,
        transform: Bijector | None = None,
        trainable: bool = True,
        *,
        prior=None,
        unconstrained=None,
        dtype=None,
    ):
        """``prior``: optional callable ``value -> log density`` (static,
        enables ``log_prior_density``; replaces gpflow parameter priors)."""
        self.transform = transform if transform is not None else Identity()
        self.trainable = bool(trainable)
        self.prior = prior
        if unconstrained is not None:
            self.unconstrained = unconstrained
        else:
            # Host values stay on the host through the inverse transform: an
            # eager device op here would permanently degrade dispatch latency
            # on remote-attached TPUs (see utils.bijectors._xp).  The final
            # jnp.asarray is a pure transfer.
            if isinstance(value, jax.Array) or isinstance(value, jax.core.Tracer):
                value = jnp.asarray(value, dtype=dtype or default_float())
                self.unconstrained = self.transform.inverse(value)
            else:
                host = np.asarray(value, dtype=dtype or default_float())
                self.unconstrained = jnp.asarray(
                    self.transform.inverse(host), dtype=dtype or default_float())

    @property
    def value(self):
        return self.transform.forward(self.unconstrained)

    @property
    def shape(self):
        return jnp.shape(self.value)

    @property
    def dtype(self):
        return self.unconstrained.dtype

    def replace(self, value=None, *, unconstrained=None) -> "Parameter":
        if unconstrained is None:
            unconstrained = self.transform.inverse(
                jnp.asarray(value, dtype=self.unconstrained.dtype)
            )
        return Parameter(
            transform=self.transform,
            trainable=self.trainable,
            prior=self.prior,
            unconstrained=unconstrained,
        )

    def __repr__(self):
        return (
            f"Parameter(value={self.value!r}, transform={self.transform!r}, "
            f"trainable={self.trainable})"
        )

    def tree_flatten(self):
        return (self.unconstrained,), (self.transform, self.trainable,
                                       self.prior)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.transform, obj.trainable, obj.prior = aux
        (obj.unconstrained,) = children
        return obj


def module_flatten(obj: "Module"):
    """Split ``vars(obj)`` into (child names+values, static names+values)."""
    child_names, child_vals, static = [], [], []
    for name in sorted(vars(obj)):
        value = vars(obj)[name]
        if _contains_array_like(value):
            child_names.append(name)
            child_vals.append(value)
        else:
            static.append((name, value))
    return child_names, child_vals, tuple(static)


class Module:
    """Base class whose subclasses are automatically pytrees.

    Attribute partitioning happens at flatten time, so subclasses just assign
    attributes in ``__init__`` — no field declarations needed.  Containers
    (list/tuple/dict) of Modules/arrays are children.  Static attributes must
    be hashable (they become part of the treedef and hence the jit cache key).
    """

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)
        jax.tree_util.register_pytree_node(
            cls, cls._tree_flatten, cls._tree_unflatten
        )

    def _tree_flatten(self):
        child_names, child_vals, static = module_flatten(self)
        return tuple(child_vals), (tuple(child_names), static)

    @classmethod
    def _tree_unflatten(cls, aux, children):
        child_names, static = aux
        obj = object.__new__(cls)
        for name, value in zip(child_names, children):
            object.__setattr__(obj, name, value)
        for name, value in static:
            object.__setattr__(obj, name, value)
        return obj

    def replace(self, **updates) -> "Module":
        """Return a copy of this module with the given attributes replaced."""
        obj = object.__new__(type(self))
        vars(obj).update(vars(self))
        for k, v in updates.items():
            if k not in vars(obj):
                raise AttributeError(f"{type(self).__name__} has no attribute {k}")
            vars(obj)[k] = v
        return obj


def _is_param(x) -> bool:
    return isinstance(x, Parameter)


def trainable_mask(tree) -> list:
    """Flat list of bools aligned with ``jax.tree_util.tree_leaves(tree)``.

    A leaf is True iff it lives inside a trainable :class:`Parameter`.
    (A flat list — not a mask *tree* — because Module flattening is
    value-dependent: bool leaves would change the tree structure.)
    """
    flags: list = []

    def visit(x):
        if _is_param(x):
            n = len(jax.tree_util.tree_leaves(x))
            flags.extend([bool(x.trainable)] * n)
        else:
            flags.extend([False] * len(jax.tree_util.tree_leaves(x)))
        return None

    jax.tree_util.tree_map(visit, tree, is_leaf=_is_param)
    return flags


def zero_untrainable(grads, mask: list):
    """Zero out gradient leaves whose mask entry is False."""
    leaves, treedef = jax.tree_util.tree_flatten(grads)
    assert len(leaves) == len(mask), "mask/grads leaf count mismatch"
    new = [g if m else jnp.zeros_like(g) for g, m in zip(leaves, mask)]
    return jax.tree_util.tree_unflatten(treedef, new)


def apply_updates(tree, updates):
    """tree + updates, leafwise (both pytrees with identical structure)."""
    return jax.tree_util.tree_map(lambda t, u: t + u, tree, updates)


def filtered_value_and_grad(loss_fn, model, mask: Optional[list] = None):
    """``(loss, grads)`` differentiating ONLY the trainable leaves.

    ``jax.value_and_grad(loss_fn)(model)`` builds cotangent graphs for every
    array leaf — including the (large, frozen) data arrays, whose backward
    branches through the kernel discretization cost real device time (the
    GPR training step at T = 1e6 measured 4.06 ms full-pytree vs 2.51 ms
    filtered on one v5e chip).  Here the non-trainable leaves are closed
    over as constants, so XLA never builds their backward graphs; the
    returned ``grads`` pytree matches ``model``'s structure with zeros in
    the non-trainable positions (drop-in for the
    ``value_and_grad`` + :func:`zero_untrainable` pattern).
    """
    if mask is None:
        mask = trainable_mask(model)
    leaves, treedef = jax.tree_util.tree_flatten(model)
    assert len(leaves) == len(mask), "mask/model leaf count mismatch"
    idx = [i for i, m in enumerate(mask) if m]
    train = [leaves[i] for i in idx]

    def on_trainables(train_leaves):
        full = list(leaves)
        for i, v in zip(idx, train_leaves):
            full[i] = v
        return loss_fn(jax.tree_util.tree_unflatten(treedef, full))

    loss, g_train = jax.value_and_grad(on_trainables)(train)
    g_leaves = [jnp.zeros_like(l) for l in leaves]
    for i, g in zip(idx, g_train):
        g_leaves[i] = g
    return loss, jax.tree_util.tree_unflatten(treedef, g_leaves)


def log_prior_density(tree) -> "jnp.ndarray":
    """Sum of parameter prior log densities over the pytree.

    Replaces the reference's ``log_prior_density`` (gpflow parameter priors,
    reference: markovflow/models/models.py).  Parameters without a prior
    contribute zero.
    """
    total = jnp.zeros(())
    leaves = jax.tree_util.tree_leaves(tree, is_leaf=_is_param)
    for leaf in leaves:
        if _is_param(leaf) and leaf.prior is not None:
            total = total + jnp.sum(leaf.prior(leaf.value))
    return total
