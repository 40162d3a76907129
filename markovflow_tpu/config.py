"""Global configuration for markovflow_tpu.

The reference library (markovflow) takes its dtype from ``gpflow.default_float()``
(float64 in practice) and uses a single ``APPROX_INF`` sentinel for +/-infinity
time padding (reference: markovflow/base.py:46).  Here dtype policy is:

* library code derives dtypes from its inputs wherever possible;
* constructors that must invent a dtype use :func:`default_float`, which is
  float64 when ``jax_enable_x64`` is on (tests / numerics mode) and float32
  otherwise (TPU fast mode).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

#: Large-but-finite stand-in for infinity when padding time points
#: (reference: markovflow/base.py:46).
APPROX_INF = 1e10

#: Default jitter added to covariance diagonals for numerical stability
#: (reference: markovflow/kernels/sde_kernel.py:122-131).
DEFAULT_JITTER = 1e-6


def default_float() -> jnp.dtype:
    """Return the default floating dtype: float64 under x64, else float32."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


#: When True, API-boundary *value* checks (time-point sortedness) also run
#: for accelerator-resident concrete arrays, paying one device->host
#: readback per check.  Off by default: on the remote-attached (axon) TPU
#: runtime an eager readback permanently degrades the process's dispatch
#: latency (measured), so the fast path trusts device arrays.  Enable via
#: :func:`set_strict_checks` or ``MARKOVFLOW_TPU_STRICT_CHECKS=1`` while
#: debugging input pipelines.
import os as _os

_STRICT_CHECKS = _os.environ.get("MARKOVFLOW_TPU_STRICT_CHECKS", "") not in (
    "", "0", "false", "False")


def strict_checks() -> bool:
    return _STRICT_CHECKS


def set_strict_checks(enabled: bool) -> None:
    global _STRICT_CHECKS
    _STRICT_CHECKS = bool(enabled)


def default_jitter(dtype=None) -> float:
    """Jitter magnitude appropriate for ``dtype`` (or the default float)."""
    dtype = jnp.dtype(dtype or default_float())
    return 1e-10 if dtype == jnp.float64 else 1e-6
