"""On-chip runtime decomposition of the f64 SVGP natgrad step (N=1e5, M=2048).

After the blocked-scan rewrite the step measures ~236 ms — now dominated by
something other than the M-grid scans (the naturals inversion at M=2049 is
K=4 chunks).  Stages, each dispatch-slope timed:

  A. loss_grad   — value_and_grad of the SVGP ELBO wrt q(s(Z))
  B. project_fwd — posterior.predict_f at the N data points (no grad)
  C. kl_fwd      — KL[q || p] on the M-grid (forward only)
  D. roundtrip   — ssm_to_naturals + parallel naturals->SSM at M=2049

Usage: python benchmarks/decompose_svgp.py [N] [M]
"""
from __future__ import annotations

import json
import os
import sys

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
    from markovflow_tpu.likelihoods import Gaussian
    from markovflow_tpu.models import SparseVariationalGaussianProcess
    from markovflow_tpu.ssm_gaussian_transformations import ssm_to_naturals_tl
    from markovflow_tpu.ssm_natgrad import SSMNaturalGradient

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    rng = np.random.default_rng(2)
    span = n / 1000.0
    x = np.linspace(0.0, span, n)
    y = (np.sin(2.0 * x) + 0.2 * rng.standard_normal(n))[:, None]
    z = np.linspace(-0.01, span + 0.01, m)
    xj, yj = jnp.asarray(x, jnp.float64), jnp.asarray(y, jnp.float64)
    svgp = SparseVariationalGaussianProcess(
        kernel=Matern32(lengthscale=0.5, variance=1.0),
        likelihood=Gaussian(variance=0.04),
        inducing_points=jnp.asarray(z, jnp.float64))
    opt = SSMNaturalGradient(gamma=0.5, naturals_engine="parallel")
    ssm0 = svgp.dist_q.non_trainable_copy()
    loss_fn = lambda s: svgp.with_dist_q(s).loss((xj, yj))  # noqa: E731
    tmap = jax.tree_util.tree_map

    def chain(s_scalar, ssm):
        return tmap(lambda a: a * (1 + 1e-30 * s_scalar), ssm)

    @jax.jit
    def loss_grad(ssm):
        loss, g = jax.value_and_grad(loss_fn)(ssm)
        s = loss + sum(jnp.sum(jnp.abs(l))
                       for l in jax.tree_util.tree_leaves(g))
        return chain(s * 1e-30, ssm)

    @jax.jit
    def project_fwd(ssm):
        model = svgp.with_dist_q(ssm)
        f_mu, f_var = model.posterior.predict_f(xj)
        s = jnp.sum(f_mu) + jnp.sum(f_var)
        return chain(s * 1e-30, ssm)

    @jax.jit
    def kl_fwd(ssm):
        model = svgp.with_dist_q(ssm)
        s = jnp.sum(model.dist_q.kl_divergence(model.dist_p))
        return chain(s * 1e-30, ssm)

    @jax.jit
    def roundtrip(ssm):
        theta = ssm_to_naturals_tl(ssm)
        theta2 = tmap(lambda t: t * (1.0 + 1e-30), theta)
        new = opt._naturals_to_ssm_tl(theta2)
        s = sum(jnp.sum(jnp.abs(l))
                for l in jax.tree_util.tree_leaves(new))
        return chain(s * 1e-30, ssm)

    read = lambda s: float(jnp.sum(s.initial_mean))  # noqa: E731
    for name, fn in [("loss_grad", loss_grad), ("project_fwd", project_fwd),
                     ("kl_fwd", kl_fwd), ("roundtrip", roundtrip)]:
        ms, proto = _slope_dispatch(fn, ssm0, read, reps=3)
        print(json.dumps({"metric": f"svgp_{name}_N{n}_M{m}_f64",
                          "value": round(ms, 2), "unit": "ms",
                          "protocol": proto}), flush=True)


if __name__ == "__main__":
    main()
