"""On-TPU numeric parity + perf for the fused Pallas engines.

The interpret-mode unit tests pin the kernels' *semantics*; this script
checks the *Mosaic lowering* on the real chip: the uniform-grid and general
fused pipelines must agree with the XLA scan engine on loss and gradients,
and the timing slopes record what each engine actually costs.

Run (exclusive TPU process):  python benchmarks/tpu_parity.py [T]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np


def main(t_len: int = 100_000) -> None:
    import jax
    import jax.numpy as jnp

    from markovflow_tpu.config import setup_compilation_cache

    setup_compilation_cache(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))

    from markovflow_tpu.kernels import Matern32
    from markovflow_tpu.models import GaussianProcessRegression
    from markovflow_tpu.utils import filtered_value_and_grad, trainable_mask

    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    x = np.linspace(0.0, 100.0, t_len)
    y = (np.sin(2.0 * x) + 0.2 * rng.standard_normal(t_len))[:, None]
    yj = jnp.asarray(y, jnp.float32)

    def make(uniform: bool, grad_engine: str | None = None):
        # None = defer to the model's default engine, so this script keeps
        # exercising the real default if the library default ever changes.
        kw = {} if grad_engine is None else {"grad_engine": grad_engine}
        return GaussianProcessRegression(
            input_data=(x.astype(np.float32), yj),
            kernel=Matern32(lengthscale=0.5, variance=1.0),
            chol_obs_covariance=jnp.asarray([[0.2]], jnp.float32),
            uniform_grid=None if uniform else False, **kw)

    mask = trainable_mask(make(True))

    def value_and_grads(m):
        loss, g = filtered_value_and_grad(lambda mm: mm.loss(), m, mask)
        return loss, jax.tree_util.tree_leaves(g)

    results = {}
    for name, m in [("uniform", make(True)), ("general", make(False))]:
        loss, gl = jax.jit(value_and_grads)(m)
        results[name] = (float(loss), [np.asarray(g) for g in gl])
        print(f"{name}: loss={float(loss):.6f}", flush=True)

    # XLA-engine oracle (no Pallas anywhere)
    m = make(False, grad_engine="autodiff")
    loss, gl = jax.jit(value_and_grads)(m)
    results["xla_autodiff"] = (float(loss), [np.asarray(g) for g in gl])
    print(f"xla_autodiff: loss={float(loss):.6f}", flush=True)

    ref_l, ref_g = results["xla_autodiff"]
    for name in ("uniform", "general"):
        l, g = results[name]
        dl = abs(l - ref_l) / max(abs(ref_l), 1e-30)
        dg = max(float(np.max(np.abs(a - b) / (np.abs(b) + 1e-8)))
                 for a, b in zip(g, ref_g))
        print(f"parity {name} vs xla: rel dloss={dl:.3e}  "
              f"max rel dgrad={dg:.3e}", flush=True)
        assert dl < 1e-4 and dg < 1e-2, (name, dl, dg)

    # honest slope timing (benchmarks/harness.py protocol)
    def slope(m):
        def step(acc, m):
            m2 = m.replace(observations=m.observations * (1 + acc * 1e-30))
            loss, g = filtered_value_and_grad(lambda mm: mm.loss(), m2, mask)
            gsum = sum(jnp.sum(jnp.abs(l))
                       for l in jax.tree_util.tree_leaves(g))
            return (loss + gsum).astype(jnp.float32) * 1e-6

        def chain(k):
            @jax.jit
            def fn(m):
                return jax.lax.fori_loop(
                    0, k, lambda _, acc: step(acc, m),
                    jnp.zeros((), jnp.float32))
            return fn

        fns = {k: chain(k) for k in (1, 2)}
        for fn in fns.values():
            float(fn(m))
        t = {}
        for k, fn in fns.items():
            times = []
            for _ in range(9):
                t0 = time.perf_counter()
                float(fn(m))
                times.append(time.perf_counter() - t0)
            t[k] = float(np.median(times))
        return (t[2] - t[1]) * 1e3

    for name, m in [("uniform", make(True)), ("general", make(False))]:
        print(f"train-step slope [{name}] T={t_len}: {slope(m):.3f} ms",
              flush=True)
    print("TPU PARITY OK", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 100_000)
