"""Roofline accounting for the fused Pallas kernels (VERDICT r4 #6).

"Fast" must be justified against the hardware, not only the 50 ms target.
For the GPR hot path at T = 1e6, d = 2, o = 1, f32 on one TPU v5e chip this
script measures the three fused kernels with the honest slope protocol and
reports, per kernel:

  * bytes/step — EXACT per-step HBM traffic of the pallas_call, read off
    its BlockSpecs (constants enter once and are amortized to ~0):
      - uniform filter  : in  nu(o) + lam(o^2) + mask(1)          =  3 f32
                          out m_f(d) + p_f(d^2)                   =  6 f32
                          -> 36 B/step
      - uniform adjoint : in  nu + lam + mask + m_prev(d) + p_prev(d^2)
                          out nubar(o) + lambar(o^2)              =  2 f32
                          -> 44 B/step   (constant-grad sums: VMEM only)
      - smoother kernel : in  E(d^2) + g(d) + L(d^2)              = 10 f32
                          out m_s(d) + P_s(d^2)                   =  6 f32
                          -> 64 B/step   (+ element construction glue,
                             measured separately as smoother-with-glue)
  * achieved HBM bandwidth = total bytes / measured ms, as a fraction of
    the v5e peak (~819 GB/s public number);
  * the FLOP side: the in-kernel Hillis-Steele scan performs
    ~N * ceil(log2(chunk)) combine evaluations (chunk = 4096 -> 12
    levels).  A d = 2 filter combine is ~230 f32 FLOPs (9 dxd matmuls,
    6 matvecs, a 2x2 inverse, ~5 adds — ops/pallas_scan.py:_combine), a
    smoother combine ~90.  These are VPU (8x128 lane) FLOPs — the d <= 6
    block ops never touch the MXU — so the relevant peak is the VPU's
    (~25 TFLOP/s f32 estimate: 197 TFLOP/s bf16 MXU spec / 8), and the
    arithmetic intensity (FLOPs/byte) decides which roofline binds.

Usage: python benchmarks/roofline.py   (needs the TPU)
Prints one JSON line per kernel plus a summary.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

T = 1_000_000
D, O = 2, 1
HBM_PEAK_GBS = 819.0        # TPU v5e public spec
VPU_PEAK_TFLOPS = 25.0      # f32 estimate: 197 bf16-MXU TFLOP/s / 8
LEVELS = 12                 # ceil(log2(chunk=4096)) in-kernel scan levels
FLOPS_COMBINE_FILTER = 230  # d=2 filter combine (see module docstring)
FLOPS_COMBINE_SMOOTHER = 90


def main():
    import jax
    import jax.numpy as jnp

    from markovflow_tpu.config import setup_compilation_cache

    setup_compilation_cache(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))

    from bench import _slope
    from markovflow_tpu.kernels import Matern32
    from markovflow_tpu.ops.kalman import smoother_pipeline_tl
    from markovflow_tpu.ops.pallas_scan import (
        pallas_adjoint_pipeline_uniform, pallas_filter_pipeline_uniform,
        pallas_smoother_scan)

    dtype = jnp.float32
    rng = np.random.default_rng(0)
    kern = Matern32(lengthscale=0.5, variance=1.0)
    dt = 1e-3
    # constant prior-step arrays (uniform grid), TL layout [..., d, *, 1]
    ssm2 = kern.state_space_model(jnp.asarray([0.0, dt, 2 * dt], dtype))
    Fc = jnp.asarray(ssm2.state_transitions[0], dtype)[..., None]
    Qc = jnp.asarray(ssm2.process_covariances[0], dtype)[..., None]
    cc = jnp.zeros((D, 1, 1), dtype)
    mu0 = jnp.zeros((D, 1, 1), dtype)
    P0 = jnp.asarray(ssm2.initial_covariance, dtype)[..., None]
    Hc = jnp.asarray([[1.0, 0.0]], dtype)[..., None]
    y = (np.sin(np.arange(T) * 2e-3)
         + 0.2 * rng.standard_normal(T)).astype(np.float32)
    sigma2 = 0.04
    nu = jnp.asarray(y / sigma2, dtype).reshape(1, 1, T)
    lam = jnp.full((1, 1, T), 1.0 / sigma2, dtype)

    results = {}

    def record(name, ms, proto, bytes_per_step, flops_per_step):
        total_gb = bytes_per_step * T / 1e9
        gbs = total_gb / (ms / 1e3)
        tflops = flops_per_step * T / 1e12 / (ms / 1e3)
        out = {
            "metric": f"roofline_{name}_T{T}_d{D}_f32",
            "value": round(ms, 4), "unit": "ms", "protocol": proto,
            "bytes_per_step": bytes_per_step,
            "achieved_GBps": round(gbs, 1),
            "pct_hbm_roofline": round(100.0 * gbs / HBM_PEAK_GBS, 1),
            "flops_per_step_est": flops_per_step,
            "achieved_TFLOPs_est": round(tflops, 2),
            "pct_vpu_peak_est": round(100.0 * tflops / VPU_PEAK_TFLOPS, 1),
        }
        results[name] = out
        print(json.dumps(out), flush=True)

    # 1. fused uniform filter (forward)
    def filt(acc, nu_, lam_):
        nu2 = nu_ * (1 + acc * 1e-30)
        m_f, p_f, ll = pallas_filter_pipeline_uniform(
            Fc, cc, Qc, mu0, P0, Hc, nu2, lam_)
        return (ll + jnp.sum(m_f[..., -1]) + jnp.sum(p_f[..., -1])
                ).astype(jnp.float32) * 1e-6

    ms, proto = _slope(filt, (nu, lam))
    record("filter", ms, proto, 36, LEVELS * FLOPS_COMBINE_FILTER)

    # saved filtered moments for the backward
    m_f, p_f, _ = jax.jit(lambda a, b: pallas_filter_pipeline_uniform(
        Fc, cc, Qc, mu0, P0, Hc, a, b))(nu, lam)

    # 2. fused uniform Koopman adjoint (backward)
    def adj(acc, nu_, lam_, m_, p_):
        nu2 = nu_ * (1 + acc * 1e-30)
        outs = pallas_adjoint_pipeline_uniform(
            Fc, cc, Qc, mu0, P0, Hc, nu2, lam_, None, m_, p_,
            jnp.ones(()))
        return sum(jnp.sum(o) for o in outs).astype(jnp.float32) * 1e-9

    ms, proto = _slope(adj, (nu, lam, m_f, p_f))
    # backward combine is the smoother composition + per-step grad algebra
    # (~2x a filter combine per level plus the per-step gradient terms)
    record("adjoint", ms, proto, 44, LEVELS * FLOPS_COMBINE_FILTER * 2)

    # 3. smoother: bare kernel and with element-construction glue
    F_full = jnp.broadcast_to(Fc, (D, D, T)).copy()
    c_full = jnp.zeros((D, 1, T), dtype)
    Q_full = jnp.broadcast_to(Qc, (D, D, T)).copy()

    def smoother_glue(acc, m_, p_):
        m2 = m_ * (1 + acc * 1e-30)
        m_s, p_s, _ = smoother_pipeline_tl(F_full, c_full, Q_full, m2, p_,
                                           engine="pallas")
        return (jnp.sum(m_s[..., 0]) + jnp.sum(p_s[..., 0])
                ).astype(jnp.float32) * 1e-6

    ms, proto = _slope(smoother_glue, (m_f, p_f))
    # glue reads F,Q [d^2 each] + m_f,p_f and materializes E,g,L: ~17
    # more f32/step on top of the kernel's 16
    record("smoother_with_glue", ms, proto, 132,
           LEVELS * FLOPS_COMBINE_SMOOTHER + 200)

    # bare smoother kernel on prebuilt elements
    e_all = jnp.broadcast_to(Fc, (D, D, T)) * 0.5
    g_all = jnp.zeros((D, 1, T), dtype).at[..., 0].set(0.1)
    l_all = jnp.broadcast_to(Qc, (D, D, T)).copy()

    def smoother_bare(acc, e_, g_, l_):
        g2 = g_ * (1 + acc * 1e-30)
        m_s, p_s = pallas_smoother_scan((e_, g2, l_))
        return (jnp.sum(m_s[..., 0]) + jnp.sum(p_s[..., 0])
                ).astype(jnp.float32) * 1e-6

    ms, proto = _slope(smoother_bare, (e_all, g_all, l_all))
    record("smoother_kernel", ms, proto, 64, LEVELS * FLOPS_COMBINE_SMOOTHER)

    print(json.dumps({"metric": "roofline_summary", "note": (
        "memory-bound frame: achieved GB/s vs 819 GB/s v5e peak; "
        "compute frame: VPU-FLOP estimates (lane ops, no MXU); "
        "whichever pct is higher is the binding roofline")}))
    return results


if __name__ == "__main__":
    main()
