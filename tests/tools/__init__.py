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
