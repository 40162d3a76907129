"""Base constants and opt-in profiling scopes.

API-parity module for the reference's ``markovflow/base.py`` (61 LoC):
``APPROX_INF``, the ordered bijector, ``SampleShape``, and the
``AUTO_NAMESCOPE`` opt-in that names profiler scopes after class methods
(reference: base.py:51-61; the TF ``tf.name_scope`` becomes
``jax.named_scope``, visible in XLA/jax profiler traces).
"""
from __future__ import annotations

import functools
import os
from typing import Tuple, Union

import jax

from .config import APPROX_INF  # noqa: F401  (re-export)
from .utils.bijectors import ordered  # noqa: F401  (re-export)

SampleShape = Union[int, Tuple[int, ...]]

AUTO_NAMESCOPE = bool(os.environ.get("AUTO_NAMESCOPE"))


def auto_namescope_enabled() -> bool:
    return AUTO_NAMESCOPE


def named_scope_fn(fn, name: str = None):
    """Wrap ``fn`` in a ``jax.named_scope`` (reference: utils.py:31-50)."""
    scope = name or getattr(fn, "__qualname__", getattr(fn, "__name__", "fn"))

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.named_scope(scope):
            return fn(*args, **kwargs)

    return wrapped


def named_scope_class(cls):
    """Wrap every public method of ``cls`` in a named scope when
    ``AUTO_NAMESCOPE`` is set (reference: utils.py:52-73)."""
    if not AUTO_NAMESCOPE:
        return cls
    for attr, value in list(vars(cls).items()):
        if attr.startswith("_") or not callable(value):
            continue
        setattr(cls, attr, named_scope_fn(value, f"{cls.__name__}.{attr}"))
    return cls
