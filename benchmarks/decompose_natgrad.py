"""On-chip runtime decomposition of the f64 VGP natgrad step (T = 1e5).

The full step measured 1053 ms on one v5e chip (BENCH_LASTGOOD 2026-08-21)
— the one BASELINE config slower than its idealized pure-LAPACK CPU model.
This splits it into its three stages, each timed with the dispatch-slope
protocol (bench._slope_dispatch):

  A. loss_grad      — jax.value_and_grad of the VGP ELBO wrt the SSM
  B. natgrad_dir    — ssm_to_expectations_tl + the expectations->params VJP
  C. nat_roundtrip  — ssm_to_naturals_tl + parallel naturals->SSM inversion
  F. full           — SSMNaturalGradient.step (= A+B+C glued)

Each stage is wrapped state->state with a 1e-30 data dependency so chained
dispatches execute sequentially on device.  Usage:
    python benchmarks/decompose_natgrad.py [T]
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_enable_x64", True)
# the box's sitecustomize force-registers the axon TPU platform and ignores
# JAX_PLATFORMS; MFTPU_DECOMP_CPU=1 pins the CPU backend for smoke tests
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
    from markovflow_tpu.likelihoods import Bernoulli
    from markovflow_tpu.models.variational import VariationalGaussianProcess
    from markovflow_tpu.ops.kalman import _to_tl
    from markovflow_tpu.ssm_gaussian_transformations import (
        expectations_to_ssm_params_tl, ssm_to_expectations_tl,
        ssm_to_naturals_tl)
    from markovflow_tpu.ssm_natgrad import SSMNaturalGradient

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    rng = np.random.default_rng(1)
    x = np.linspace(0.0, n / 1000.0, n)
    y = (np.sin(2.0 * x) + 0.3 * rng.standard_normal(n) > 0).astype(
        np.float64)[:, None]
    vgp = VariationalGaussianProcess(
        (jnp.asarray(x), jnp.asarray(y)),
        Matern32(lengthscale=0.5, variance=1.0), Bernoulli())
    opt = SSMNaturalGradient(gamma=0.5, naturals_engine="parallel")
    loss_fn = lambda s: vgp.with_dist_q(s).loss()  # noqa: E731
    ssm0 = vgp.dist_q.non_trainable_copy()
    tmap = jax.tree_util.tree_map

    def chainable(out_scalar, ssm):
        return tmap(lambda a: a * (1 + 1e-30 * out_scalar), ssm)

    @jax.jit
    def loss_grad(ssm):
        loss, g = jax.value_and_grad(loss_fn)(ssm)
        s = loss + sum(jnp.sum(jnp.abs(l))
                       for l in jax.tree_util.tree_leaves(g))
        return chainable(s * 1e-30, ssm)

    @jax.jit
    def natgrad_dir(ssm):
        g_tl = (
            _to_tl(ssm.state_transitions),
            _to_tl(ssm.state_offsets[..., None]),
            ssm.cholesky_initial_covariance[..., None],
            _to_tl(ssm.cholesky_process_covariances),
            ssm.initial_mean[..., None, None],
        )
        eta = ssm_to_expectations_tl(ssm)
        _, vjp_fn = jax.vjp(lambda e: expectations_to_ssm_params_tl(*e), eta)
        (g_eta,) = vjp_fn(g_tl)
        s = sum(jnp.sum(jnp.abs(l))
                for l in jax.tree_util.tree_leaves(g_eta))
        return chainable(s * 1e-30, ssm)

    @jax.jit
    def nat_roundtrip(ssm):
        theta = ssm_to_naturals_tl(ssm)
        theta2 = tmap(lambda t: t * (1.0 + 1e-30), theta)
        new = opt._naturals_to_ssm_tl(theta2)
        s = sum(jnp.sum(jnp.abs(l))
                for l in jax.tree_util.tree_leaves(new))
        return chainable(s * 1e-30, ssm)

    @jax.jit
    def full(ssm):
        new_ssm, _, _ = opt.step(loss_fn, ssm)
        return new_ssm

    read = lambda s: float(jnp.sum(s.initial_mean))  # noqa: E731
    for name, fn in [("loss_grad", loss_grad), ("natgrad_dir", natgrad_dir),
                     ("nat_roundtrip", nat_roundtrip), ("full", full)]:
        ms, proto = _slope_dispatch(fn, ssm0, read, reps=3)
        print(json.dumps({"metric": f"natgrad_{name}_T{n}_f64",
                          "value": round(ms, 2), "unit": "ms",
                          "protocol": proto}), flush=True)


if __name__ == "__main__":
    main()
