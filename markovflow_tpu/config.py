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


def setup_compilation_cache(base_dir: str,
                            min_compile_secs: float = 1.0) -> str:
    """Point JAX's persistent compilation cache at a host-fingerprinted
    subdirectory of ``base_dir`` and return it.

    XLA:CPU cache entries embed AOT-compiled machine code for the
    *compiling* host's exact CPU features, and the loader accepts
    mismatched entries with only an error log ("This could lead to
    execution errors such as SIGILL").  This VM can migrate between
    physical hosts across sessions while ``base_dir`` persists, so keying
    the directory by the host's CPU-flag fingerprint keeps every entry
    host-local.  (Note: the loader also logs a mismatch for the
    ``prefer-no-scatter``/``prefer-no-gather`` tuning pseudo-features even
    for same-host entries — that particular pair is cosmetic noise.)
    """
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            flags = next((ln for ln in f if ln.startswith("flags")), "")
    except OSError:
        flags = _os.uname().machine
    tag = hashlib.sha1(flags.encode()).hexdigest()[:10]
    cache_dir = _os.path.join(base_dir, f"host-{tag}")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
    return cache_dir
