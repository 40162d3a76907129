"""On-chip CHUNK_F64 tuning for the f64 naturals->SSM inversion (T = 1e5).

The round-5 runtime decomposition (decompose_natgrad.py) pinned 704 of the
f64 VGP natgrad step's 1053 ms on nat_roundtrip — the synthetic-model
filter+smoother behind naturals_to_ssm_params_parallel_tl.  With
CHUNK_F64 = 512 each T = 1e5 scan runs ~196 sequential outer lax.scan
steps; a larger chunk trades XLA compile size (the f64-emulation
expansion) for fewer outer steps.  This measures ONE chunk setting per
process (the constant is read at import):

    MFTPU_CHUNK_F64=1024 python benchmarks/tune_chunk_f64.py [T]

Prints one JSON line: runtime (dispatch-slope) + compile wall time.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_enable_x64", True)
if os.environ.get("MFTPU_DECOMP_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main():
    from markovflow_tpu.config import setup_compilation_cache

    setup_compilation_cache(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))

    from bench import _slope_dispatch
    from markovflow_tpu.kernels import Matern32
    from markovflow_tpu.ops import scans
    from markovflow_tpu.ssm_gaussian_transformations import ssm_to_naturals_tl
    from markovflow_tpu.ssm_natgrad import SSMNaturalGradient

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    x = np.linspace(0.0, n / 1000.0, n)
    kern = Matern32(lengthscale=0.5, variance=1.0)
    ssm0 = kern.state_space_model(jnp.asarray(x)).non_trainable_copy()
    opt = SSMNaturalGradient(gamma=0.5, naturals_engine="parallel")
    tmap = jax.tree_util.tree_map

    @jax.jit
    def nat_roundtrip(ssm):
        theta = ssm_to_naturals_tl(ssm)
        theta2 = tmap(lambda t: t * (1.0 + 1e-30), theta)
        new = opt._naturals_to_ssm_tl(theta2)
        s = sum(jnp.sum(jnp.abs(l))
                for l in jax.tree_util.tree_leaves(new))
        return tmap(lambda a: a * (1 + 1e-30 * s * 1e-30), ssm)

    read = lambda s: float(jnp.sum(s.initial_mean))  # noqa: E731
    t0 = time.time()
    ms, proto = _slope_dispatch(nat_roundtrip, ssm0, read, reps=3)
    print(json.dumps({
        "metric": f"nat_roundtrip_T{n}_f64_chunk{scans.CHUNK_F64}",
        "value": round(ms, 2), "unit": "ms", "protocol": proto,
        "chunk_f64": scans.CHUNK_F64,
        "compile_plus_first_s": round(time.time() - t0, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
