"""Honest TPU timing for the axon remote runtime.

``jax.block_until_ready`` on this runtime is effectively a no-op: dispatches
return immediately and repeated identical dispatches appear to take ~0.03 ms
regardless of the work inside (measured: a 256 MB reduction "completes" in
0.02 ms => 13 TB/s, 16x over v5e's ~800 GB/s HBM).  The only honest clock is
a host readback, which costs a fixed ~28 ms RPC round trip.

Protocol here: run the workload K times inside one jit with a genuine data
dependency between iterations (so nothing can be elided or memoized), read
back one scalar, and take the slope over two values of K:

    time_per_iter = (t(K2) - t(K1)) / (K2 - K1)

Validated against known hardware: a chained 256 MB reduction measures
~0.32 ms/pass = 800 GB/s, matching v5e HBM bandwidth.
"""
from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["timed_slope", "chain_runner"]


def chain_runner(step: Callable, k: int):
    """Build ``fn(*args) -> scalar`` running ``step`` k times with a carry
    dependency.

    ``step(acc, *args) -> scalar`` must fold ``acc`` into its inputs with a
    vanishing perturbation (e.g. ``x * (1 + acc * 1e-30)``) and return a
    scalar derived from its outputs; the carry chain defeats both dead-code
    elimination and any runtime memoization of identical dispatches.
    """

    def fn(*args):
        def body(_, acc):
            return step(acc, *args)

        return jax.lax.fori_loop(0, k, body, jnp.zeros((), jnp.float32))

    return jax.jit(fn)


def timed_slope(step: Callable, args, k1: int = 4, k2: int = 20,
                reps: int = 5) -> float:
    """Median per-iteration milliseconds of ``step`` via the slope protocol."""
    fns = [chain_runner(step, k) for k in (k1, k2)]
    for fn in fns:
        float(fn(*args))  # compile + drain
    t = []
    for fn in fns:
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(*args))
            times.append(time.perf_counter() - t0)
        t.append(float(np.median(times)))
    return (t[1] - t[0]) / (k2 - k1) * 1e3
