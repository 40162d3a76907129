"""North-star benchmark: exact GPR training step at T = 1e6 (Matern-3/2).

Runs on whatever accelerator JAX picks (the real TPU chip under the driver).
Measures one full training step — value_and_grad of the log marginal
likelihood through the parallel Kalman filter — and prints ONE JSON line.

Target (BASELINE.md): < 50 ms / step on one TPU v5e chip.  ``vs_baseline`` is
target_ms / measured_ms (>1 means beating the target).

NOTE: no eager device op or device->host transfer may happen before the timed
loop — a single one permanently degrades dispatch latency ~500x on the
remote-attached TPU runtime (library constructors are already clean).
"""
from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax

    # Persistent compilation cache (compile is ~35 s; cache it across runs).
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from markovflow_tpu.kernels import Matern32
    from markovflow_tpu.models import GaussianProcessRegression

    dtype = jnp.float32
    t_len = 1_000_000
    rng = np.random.default_rng(0)
    x = np.linspace(0.0, 1000.0, t_len)
    y = (np.sin(2.0 * x) + 0.2 * rng.standard_normal(t_len))[:, None]

    model = GaussianProcessRegression(
        input_data=(jnp.asarray(x, dtype), jnp.asarray(y, dtype)),
        kernel=Matern32(lengthscale=0.5, variance=1.0),
        chol_obs_covariance=jnp.asarray([[0.2]], dtype),
    )

    train_step = jax.jit(jax.value_and_grad(lambda m: m.loss()))

    # warmup / compile
    jax.block_until_ready(train_step(model))

    times = []
    for _ in range(20):
        t0 = time.perf_counter()
        out = train_step(model)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    ms = float(np.median(times) * 1e3)
    loss = float(out[0])  # transfer AFTER timing

    target_ms = 50.0
    print(json.dumps({
        "metric": "gpr_train_step_T1e6_matern32_ms",
        "value": round(ms, 4),
        "unit": "ms",
        "vs_baseline": round(target_ms / ms, 1),
        "loss": round(loss, 2),
    }))


if __name__ == "__main__":
    main()
