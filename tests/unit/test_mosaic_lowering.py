"""Mosaic (TPU) lowering regression guard for the Pallas kernels.

The interpret-mode tests pin kernel *semantics* but never exercise the
Mosaic compiler, which rejects constructs interpret mode happily runs —
e.g. a bare negative int index on a kernel value lowers to dynamic_slice,
unimplemented on the TC kernel type (this exact bug shipped once: the
fused pipelines crashed on the real chip while every interpret test was
green).  AOT cross-platform lowering (`.trace(...).lower(platforms)`)
runs the Mosaic *frontend* from the CPU test environment, so every
production kernel entry point is lowered for TPU here with
production-shaped blocks (r_blk x lanes = 32 x 128).

KNOWN LIMIT: `.lower()` stops at the serialized Mosaic module; the
backend passes (infer-vector-layout etc.) only run at device compile,
so layout-inference rejections (e.g. rank-extending reshapes of 2-D
constants, leading-dims multi_reductions) pass these tests and still
fail on hardware.  The driver-visible guard for that class is the
engine tag in bench.py's JSON ("general-fallback" = Mosaic backend
compile failed on the chip).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from markovflow_tpu.ops import pallas_scan as ps

CHUNK = 4096  # production chunk: r_blk=32, lanes=128


def _lower_tpu(fn, *args):
    traced = jax.jit(fn).trace(*args)
    try:
        traced.lower(lowering_platforms=("tpu",))
    except Exception as e:  # pragma: no cover - environment-dependent
        msg = str(e)
        if "tpu" in msg.lower() and ("not registered" in msg
                                     or "unknown platform" in msg.lower()):
            pytest.skip(f"TPU lowering unavailable here: {msg[:120]}")
        raise


def _rand(shape, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal(shape), jnp.float32)


@pytest.mark.parametrize("d,o", [(3, 1), (6, 2)])
def test_filter_pipeline_lowers(d, o):
    n = CHUNK
    args = (_rand((d, d, n)), _rand((d, 1, n)), _rand((d, d, n)),
            _rand((o, d, n)), _rand((o, 1, n)), _rand((o, o, n)))
    _lower_tpu(lambda *a: ps.pallas_filter_pipeline(*a, chunk=CHUNK), *args)


def test_filter_scan_lowers():
    d, n = 3, CHUNK
    elems = (_rand((d, d, n)), _rand((d, 1, n)), _rand((d, d, n)),
             _rand((d, d, n)), _rand((d, 1, n)))
    _lower_tpu(lambda *e: ps.pallas_filter_scan(e, chunk=CHUNK), *elems)


def test_smoother_scan_lowers():
    d, n = 3, CHUNK
    elems = (_rand((d, d, n)), _rand((d, 1, n)), _rand((d, d, n)))
    _lower_tpu(lambda *e: ps.pallas_smoother_scan(e, chunk=CHUNK), *elems)


def test_adjoint_pipeline_lowers():
    d, o, n = 3, 1, CHUNK
    args = (_rand((d, d, n)), _rand((d, 1, n)), _rand((d, d, n)),
            _rand((o, d, n)), _rand((o, 1, n)), _rand((o, o, n)),
            jnp.ones((1, 1, n), jnp.float32),
            _rand((d, 1, n)), _rand((d, d, n)),
            jnp.ones((), jnp.float32))
    _lower_tpu(lambda *a: ps.pallas_adjoint_pipeline(*a, chunk=CHUNK), *args)


def test_uniform_pipeline_lowers():
    d, o, n = 3, 1, CHUNK
    args = (_rand((d, d, 1)), _rand((d, 1, 1)), _rand((d, d, 1)),
            _rand((d, 1, 1)), _rand((d, d, 1)), _rand((o, d, 1)),
            _rand((o, 1, n)), _rand((o, o, n)),
            jnp.ones((1, 1, n), jnp.float32))
    _lower_tpu(
        lambda *a: ps.pallas_filter_pipeline_uniform(*a, chunk=CHUNK), *args)


def test_uniform_adjoint_lowers():
    d, o, n = 3, 1, CHUNK
    args = (_rand((d, d, 1)), _rand((d, 1, 1)), _rand((d, d, 1)),
            _rand((d, 1, 1)), _rand((d, d, 1)), _rand((o, d, 1)),
            _rand((o, 1, n)), _rand((o, o, n)),
            jnp.ones((1, 1, n), jnp.float32),
            _rand((d, 1, n)), _rand((d, d, n)),
            jnp.ones((), jnp.float32))
    _lower_tpu(
        lambda *a: ps.pallas_adjoint_pipeline_uniform(*a, chunk=CHUNK), *args)
