"""Sequence-parallel scaling study on the virtual CPU mesh (VERDICT #10).

Compares, at several (sp, T), the GPR training-step cost of:

* ``xla-spmd``  — the regular Koopman engine jitted with inputs sharded
  over the time axis: XLA's SPMD partitioner inserts the collectives.
* ``collective`` — :func:`markovflow_tpu.parallel.collective_scan.
  sharded_log_likelihood_koopman`: hand-placed ppermute/psum collectives,
  O(P d^2) comms per scan level by construction.

On the virtual mesh (xla_force_host_platform_device_count) all
"communication" is memcpy, so this measures partitioning overhead and
validates the scaling *structure*; absolute ICI wins need real multi-chip
hardware.  Run:   JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_\
device_count=8 python benchmarks/seq_parallel.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from markovflow_tpu.kernels import Matern32
    from markovflow_tpu.models import GaussianProcessRegression
    from markovflow_tpu.parallel import make_mesh
    from markovflow_tpu.utils import filtered_value_and_grad, trainable_mask

    rng = np.random.default_rng(0)

    def model_for(n, **kw):
        x = np.linspace(0.0, n / 100.0, n)
        y = np.sin(2 * x)[:, None] + 0.2 * rng.standard_normal((n, 1))
        return GaussianProcessRegression(
            input_data=(jnp.asarray(x, jnp.float32),
                        jnp.asarray(y, jnp.float32)),
            kernel=Matern32(lengthscale=0.5, variance=1.0),
            chol_obs_covariance=jnp.asarray([[0.2]], jnp.float32), **kw)

    def time_step(model, reps=5):
        mask = trainable_mask(model)

        @jax.jit
        def step(m):
            loss, grads = filtered_value_and_grad(
                lambda mm: mm.loss(), m, mask)
            return loss + sum(jnp.sum(jnp.abs(g))
                              for g in jax.tree_util.tree_leaves(grads))

        out = step(model)
        out.block_until_ready()  # CPU backend: block works
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            step(model).block_until_ready()
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)) * 1e3

    for t_len in (32_768, 131_072):
        for sp in (2, 4, 8):
            mesh = make_mesh(dp=1, sp=sp)
            shard = NamedSharding(mesh, P("sp"))
            base = model_for(t_len)
            base = base.replace(
                time_points=jax.device_put(base.time_points, shard),
                observations=jax.device_put(
                    base.observations, NamedSharding(mesh, P("sp", None))),
                # Force the general (per-step prior arrays) engine: this
                # study compares SPMD-partitioned vs explicit-collective
                # scans on the same workload, not the uniform-grid
                # representation.
                _uniform_grid=False)
            ms_spmd = time_step(base)
            col = base.replace(grad_engine="collective", mesh=mesh,
                               shard_axis="sp")
            ms_col = time_step(col)
            print(json.dumps({
                "T": t_len, "sp": sp,
                "xla_spmd_ms": round(ms_spmd, 2),
                "collective_ms": round(ms_col, 2),
            }), flush=True)


if __name__ == "__main__":
    main()
