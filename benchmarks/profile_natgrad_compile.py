"""Profile trace/lower/compile time of the f64 VGP natgrad step vs T.

Usage: python benchmarks/profile_natgrad_compile.py [T ...]
Prints one line per stage per T.  Diagnostic tool for the natgrad
compile-cliff work (VERDICT r3 #2).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from markovflow_tpu.kernels import Matern32
from markovflow_tpu.likelihoods import Bernoulli
from markovflow_tpu.models.variational import VariationalGaussianProcess
from markovflow_tpu.ssm_natgrad import SSMNaturalGradient


def main():
    ts = [int(float(a)) for a in sys.argv[1:]] or [10_000, 30_000]
    for n in ts:
        rng = np.random.default_rng(1)
        x = np.linspace(0.0, n / 1000.0, n)
        y = (np.sin(2.0 * x) + 0.3 * rng.standard_normal(n) > 0).astype(
            np.float64)[:, None]
        vgp = VariationalGaussianProcess(
            (jnp.asarray(x), jnp.asarray(y)),
            Matern32(lengthscale=0.5, variance=1.0), Bernoulli())
        opt = SSMNaturalGradient(gamma=0.5, naturals_engine="parallel")
        ssm0 = vgp.dist_q.non_trainable_copy()

        def ng_step(ssm):
            new_ssm, _, _ = opt.step(lambda s: vgp.with_dist_q(s).loss(), ssm)
            return new_ssm

        t0 = time.perf_counter()
        traced = jax.jit(ng_step).trace(ssm0)
        t1 = time.perf_counter()
        print(f"T={n}: trace={t1-t0:.1f}s", flush=True)
        lowered = traced.lower()
        t2 = time.perf_counter()
        print(f"T={n}: lower={t2-t1:.1f}s", flush=True)
        compiled = lowered.compile()
        t3 = time.perf_counter()
        print(f"T={n}: compile={t3-t2:.1f}s", flush=True)
        s = compiled(ssm0)
        float(jnp.sum(s.initial_mean))
        t4 = time.perf_counter()
        print(f"T={n}: trace={t1-t0:.1f}s lower={t2-t1:.1f}s "
              f"compile={t3-t2:.1f}s first_run={t4-t3:.2f}s", flush=True)


if __name__ == "__main__":
    main()
