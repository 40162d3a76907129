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

__all__ = ["check_time_points", "check_observations", "check_shape_suffix",
           "is_uniform_grid"]


def _is_concrete(x) -> bool:
    return not isinstance(x, jax.core.Tracer)


def _on_host_or_cpu(x) -> bool:
    if isinstance(x, np.ndarray):
        return True
    if isinstance(x, jax.Array):
        try:
            return all(d.platform == "cpu" for d in x.devices())
        except Exception:
            return False
    return True


def check_time_points(time_points, name: str = "time_points"):
    """Raise if concrete time points are not non-decreasing.

    Shape checks always run.  The *value* check runs for host/CPU-backed
    arrays, and — when :func:`markovflow_tpu.config.strict_checks` is on
    (``MARKOVFLOW_TPU_STRICT_CHECKS=1``) — for accelerator-resident concrete
    arrays too, paying one device->host readback.  By default accelerator
    arrays are trusted: on remote-attached accelerators both the
    device->host pull and any eager device op permanently degrade the
    process's dispatch latency (measured on the axon TPU tunnel).  Tracer
    inputs (under ``jit``) are never value-checked — construct models
    eagerly to get validation.
    """
    from ..config import strict_checks

    if _is_concrete(time_points):
        if jnp.ndim(time_points) < 1:
            raise ValueError(f"{name} must have at least one axis")
        if jnp.shape(time_points)[-1] > 1 and (
                strict_checks() or _on_host_or_cpu(time_points)):
            arr = np.asarray(time_points)
            if not np.all(np.diff(arr, axis=-1) >= 0):
                raise ValueError(
                    f"{name} must be sorted in non-decreasing order along "
                    "the last axis")


def check_observations(observations, time_points,
                       name: str = "observations"):
    """Raise unless ``observations`` is ``time_points.shape + [obs_dim]``
    with ``obs_dim >= 1`` (static shape checks; always run)."""
    obs_shape = jnp.shape(observations)
    tp_shape = jnp.shape(time_points)
    if (len(obs_shape) != len(tp_shape) + 1
            or obs_shape[:-1] != tp_shape):
        raise ValueError(
            f"{name} must have shape time_points.shape + [obs_dim]; "
            f"got {obs_shape} for time points {tp_shape}")
    if obs_shape[-1] < 1:
        raise ValueError(f"{name} must have obs_dim >= 1, got {obs_shape}")


def is_uniform_grid(time_points) -> bool:
    """True iff ``time_points`` is concrete, inspectable without a device
    readback (host/CPU-resident, or strict checks on), strictly increasing,
    and evenly spaced up to floating-point quantization of the stored grid.

    The tolerance is the rounding bound of the storage dtype
    (2 eps max|t| per delta): a grid whose deltas are indistinguishable
    from uniform at the user's own precision is treated as uniform — the
    general path would compute deltas from the same rounded values.  Used
    by the models to enable the stationary uniform-grid fast path
    (constant prior-step arrays; see
    ops.adjoint.log_likelihood_koopman_uniform).  Pass numpy time points
    to enable it for device-resident workflows.
    """
    from ..config import strict_checks

    if not _is_concrete(time_points):
        return False
    if not (strict_checks() or _on_host_or_cpu(time_points)):
        return False
    tp = np.asarray(time_points)
    if tp.ndim < 1 or tp.shape[-1] < 3:
        return False
    deltas = np.diff(tp, axis=-1)
    mean = deltas.mean(axis=-1, keepdims=True)
    if not np.all(np.isfinite(mean)) or np.any(mean <= 0):
        return False
    eps = np.finfo(tp.dtype).eps if np.issubdtype(tp.dtype, np.floating) \
        else np.finfo(np.float64).eps
    atol = 2.0 * eps * np.max(np.abs(tp))
    return bool(np.all(np.abs(deltas - mean) <= atol))


def check_shape_suffix(array, suffix, name: str):
    """Raise if the trailing dims of ``array`` don't match ``suffix``."""
    shape = jnp.shape(array)
    if len(shape) < len(suffix) or tuple(shape[len(shape) - len(suffix):]) != \
            tuple(suffix):
        raise ValueError(
            f"{name} must have trailing shape {tuple(suffix)}, got {shape}")
