"""Shared test helpers.

``jrun`` / the jitted model-method callers exist for suite wall-clock: on
this box (one CPU core) eager op-by-op dispatch costs ~50x a traced call,
so every non-trivial computation in tests should go through ``jit``; the
persistent compilation cache (tests/conftest.py) absorbs the compiles
across runs.
"""
import functools

import jax

_JIT_CACHE = {}


def jrun(fn, *args, **static):
    """Call ``fn(*args, **static)`` under ``jax.jit``, caching the jitted
    callable by ``(fn, static)`` so repeated calls (across tests and
    parametrizations) hit the in-process jit cache.  ``static`` kwargs must
    be hashable (strings, ints, bools)."""
    key = (fn, tuple(sorted(static.items())))
    jitted = _JIT_CACHE.get(key)
    if jitted is None:
        target = functools.partial(fn, **static) if static else fn
        jitted = jax.jit(target)
        _JIT_CACHE[key] = jitted
    return jitted(*args)


# jitted model-method callers (models are pytrees; one compile per
# (model type, shapes/dtypes) — shared across tests in a session)
LOSS = jax.jit(lambda m: m.loss())
LOGLIK = jax.jit(lambda m: m.log_likelihood())
ELBO = jax.jit(lambda m: m.elbo())
CLASSIC_ELBO = jax.jit(lambda m: m.classic_elbo())
UPDATE_SITES = jax.jit(lambda m: m.update_sites())
PREDICT_F = jax.jit(lambda m, t: m.predict_f(t))
# data-argument variants (sparse models take the batch explicitly; extra
# positional args — e.g. PRNG keys — pass through)
ELBO_D = jax.jit(lambda m, d, *a: m.elbo(d, *a))
CLASSIC_ELBO_D = jax.jit(lambda m, d, *a: m.classic_elbo(d, *a))
UPDATE_SITES_D = jax.jit(lambda m, d, *a: m.update_sites(d, *a))
LOSS_D = jax.jit(lambda m, d, *a: m.loss(d, *a))
MARGINALS = jax.jit(lambda d: (d.marginal_means, d.marginal_covariances))


def isolated(fn):
    """Run this test in a fresh subprocess (re-invoking pytest on its own
    node id).

    Needed for the largest jitted interpret-mode Pallas programs: compiling
    OR (de)serializing their executables segfaults XLA:CPU — but only in a
    process that has already run ~200 compiles (observed at the same test
    across four full-suite runs, in backend_compile_and_load,
    put_executable_and_time, and get_executable_and_time respectively;
    every isolated run passes).  A fresh heap sidesteps whatever the aged
    process corrupts; the persistent compilation cache keeps the subprocess
    cost to import + cache-hit."""
    import os
    import subprocess
    import sys

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if os.environ.get("_MFTPU_ISOLATED") == "1":
            return fn(*args, **kwargs)
        nodeid = os.environ.get("PYTEST_CURRENT_TEST", "").split(" ")[0]
        if not nodeid:  # direct call outside pytest
            return fn(*args, **kwargs)
        root = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        env = dict(os.environ, _MFTPU_ISOLATED="1")
        res = subprocess.run(
            [sys.executable, "-m", "pytest", nodeid, "-q",
             "-p", "no:cacheprovider"],
            env=env, cwd=root, capture_output=True, text=True, timeout=1800)
        if res.returncode != 0:
            raise AssertionError(
                f"isolated subprocess for {nodeid} failed "
                f"(rc={res.returncode}):\n{res.stdout[-4000:]}"
                f"\n{res.stderr[-2000:]}")
    return wrapper
