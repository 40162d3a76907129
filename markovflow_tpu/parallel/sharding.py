"""Device-mesh sharding for Markovian-GP workloads.

The reference is single-process/single-device (SURVEY.md section 2.7); scaling
here is TPU-native SPMD: a ``jax.sharding.Mesh`` with

* ``dp`` — data parallel over independent series (the batch axis);
* ``sp`` — sequence parallel over the time axis: every heavy op in this
  library (element construction, associative scans, per-step likelihoods) is
  either pointwise over time or a parallel prefix, so XLA SPMD partitions them
  over ``sp`` with collectives only at the O(log) scan combine steps.

No NCCL/MPI analogue: collectives are XLA's, riding ICI.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_batched_series", "P", "Mesh", "NamedSharding"]


def make_mesh(dp: int = 1, sp: int = 1, devices: Optional[Sequence] = None
              ) -> Mesh:
    """A (dp, sp) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    assert dp * sp <= len(devices), (dp, sp, len(devices))
    arr = np.asarray(devices[: dp * sp]).reshape(dp, sp)
    return Mesh(arr, ("dp", "sp"))


def shard_batched_series(mesh: Mesh, time_points, observations):
    """Place a batch of series: batch axis on dp, time axis on sp.

    time_points [B, N]; observations [B, N, obs_dim].
    """
    tp = jax.device_put(time_points, NamedSharding(mesh, P("dp", "sp")))
    obs = jax.device_put(observations, NamedSharding(mesh, P("dp", "sp", None)))
    return tp, obs
