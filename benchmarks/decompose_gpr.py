"""Decompose the GPR training-step time (north-star config) into layers.

Times, with the honest chained-slope protocol (benchmarks/harness.py):

  A. fused forward kernel alone (log_likelihood_koopman_uniform, no grad)
  B. forward + Koopman backward (value_and_grad of A) on pre-built sites
  C. the full model training step (site construction + loss + filtered
     value_and_grad + gradient-magnitude sum), i.e. what bench.py measures

B - A   = backward kernel + its XLA glue (shifts, re-blocking, gsum-free)
C - B   = model machinery (site construction, parameter chain, reductions)

Run on the TPU backend:  python benchmarks/decompose_gpr.py
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from benchmarks.harness import timed_slope
    from markovflow_tpu.kernels import Matern32
    from markovflow_tpu.models import GaussianProcessRegression
    from markovflow_tpu.utils import filtered_value_and_grad, trainable_mask
    from markovflow_tpu.ops.adjoint import log_likelihood_koopman_uniform

    t_len = 1_000_000
    rng = np.random.default_rng(0)
    x = np.linspace(0.0, 1000.0, t_len).astype(np.float32)
    y = (np.sin(2.0 * x) + 0.2 * rng.standard_normal(t_len)).astype(
        np.float32)[:, None]
    yj = jnp.asarray(y)

    d, o = 2, 1
    dt = np.float32(x[1] - x[0])
    # Matern-3/2-shaped constants (values irrelevant for timing)
    lam_c = np.float32(np.sqrt(3.0) / 0.5)
    A = np.exp(-lam_c * dt) * (np.eye(2, dtype=np.float32)
                               + dt * np.array([[lam_c, 1.0],
                                                [-lam_c ** 2, -lam_c]],
                                               np.float32))
    Pinf = np.diag([1.0, lam_c ** 2]).astype(np.float32)
    Q = Pinf - A @ Pinf @ A.T
    Fc = jnp.asarray(A)[..., None]
    cc = jnp.zeros((d, 1, 1), jnp.float32)
    Qc = jnp.asarray(Q)[..., None]
    mu0 = jnp.zeros((d, 1, 1), jnp.float32)
    P0 = jnp.asarray(Pinf)[..., None]
    Hc = jnp.asarray([[1.0, 0.0]], jnp.float32)[..., None]
    r_inv = np.float32(1.0 / 0.04)
    nu = (yj.T[None] * r_inv)[..., None, :].reshape(o, 1, t_len)
    lam = jnp.full((o, o, t_len), r_inv, jnp.float32)

    def fwd_only(acc, nu, lam):
        nu2 = nu * (1 + acc * 1e-30)
        out = log_likelihood_koopman_uniform(Fc, cc, Qc, mu0, P0, Hc,
                                             nu2, lam)
        return out.astype(jnp.float32) * 1e-6

    def fwd_bwd(acc, nu, lam):
        nu2 = nu * (1 + acc * 1e-30)
        val, grads = jax.value_and_grad(
            lambda a: log_likelihood_koopman_uniform(
                Fc, cc, Qc, mu0, P0, Hc, a, lam),
        )(nu2)
        return (val + jnp.sum(jnp.abs(grads))).astype(jnp.float32) * 1e-6

    def fwd_bwd_params(acc, nu, lam):
        # gradient wrt the CONSTANT inputs only (the real training set):
        # per-step cotangents never leave the kernel
        nu2 = nu * (1 + acc * 1e-30)
        val, grads = jax.value_and_grad(
            lambda f, q, p: log_likelihood_koopman_uniform(
                f, cc, q, mu0, p, Hc, nu2, lam), argnums=(0, 1, 2),
        )(Fc, Qc, P0)
        gsum = sum(jnp.sum(jnp.abs(g)) for g in grads)
        return (val + gsum).astype(jnp.float32) * 1e-6

    model = GaussianProcessRegression(
        input_data=(x, yj),
        kernel=Matern32(lengthscale=0.5, variance=1.0),
        chol_obs_covariance=jnp.asarray([[0.2]], jnp.float32))
    mask = trainable_mask(model)

    def full_step(acc, m):
        m2 = m.replace(observations=m.observations * (1 + acc * 1e-30))
        loss, grads = filtered_value_and_grad(lambda mm: mm.loss(), m2, mask)
        gsum = sum(jnp.sum(jnp.abs(l))
                   for l in jax.tree_util.tree_leaves(grads))
        return (loss + gsum).astype(jnp.float32) * 1e-6

    res = {}
    res["A_fwd_only_ms"] = round(timed_slope(fwd_only, (nu, lam)), 3)
    print(json.dumps(res), flush=True)
    res["B_fwd_bwd_sites_ms"] = round(timed_slope(fwd_bwd, (nu, lam)), 3)
    print(json.dumps(res), flush=True)
    res["B2_fwd_bwd_params_ms"] = round(
        timed_slope(fwd_bwd_params, (nu, lam)), 3)
    print(json.dumps(res), flush=True)
    res["C_full_model_step_ms"] = round(timed_slope(full_step, (model,)), 3)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
