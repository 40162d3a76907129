"""Eager input validation at API boundaries.

The reference uses pervasive ``tf.debugging.assert_*`` graph-time checks
(e.g. state_space_model.py:101-116).  In JAX, shape checks are free anywhere
(static), while *value* checks (sortedness) only run when the input is a
concrete array — under ``jit`` tracing they are skipped rather than inserting
device synchronization into the compiled program.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["check_time_points", "check_shape_suffix"]


def _is_concrete(x) -> bool:
    return not isinstance(x, jax.core.Tracer)


def check_time_points(time_points, name: str = "time_points"):
    """Raise if concrete time points are not non-decreasing.

    The check runs on the device holding the array and transfers only a
    single boolean — pulling the whole array to host is prohibitively slow
    on remote-attached accelerators.
    """
    if _is_concrete(time_points):
        if jnp.ndim(time_points) < 1:
            raise ValueError(f"{name} must have at least one axis")
        if jnp.shape(time_points)[-1] > 1:
            ok = jnp.all(jnp.diff(time_points, axis=-1) >= 0)
            if not bool(ok):
                raise ValueError(
                    f"{name} must be sorted in non-decreasing order along "
                    "the last axis")


def check_shape_suffix(array, suffix, name: str):
    """Raise if the trailing dims of ``array`` don't match ``suffix``."""
    shape = jnp.shape(array)
    if len(shape) < len(suffix) or tuple(shape[len(shape) - len(suffix):]) != \
            tuple(suffix):
        raise ValueError(
            f"{name} must have trailing shape {tuple(suffix)}, got {shape}")
