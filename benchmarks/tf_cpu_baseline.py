"""Reference-style CPU baselines for the BASELINE.md comparisons.

The reference library (TF + the C++ ``banded_matrices`` ops) is not
installable here (no gpflow / banded_matrices wheels), so this measures two
faithful stand-ins for its GPR/CVI hot path (reference call stack SURVEY.md
section 3.1 — banded Cholesky + triangular solves + log-dets, all O(T)
sequential on CPU):

1. ``scipy_banded``: the SpInGP precision ``K^-1 + H^T S^-1 H`` assembled in
   LAPACK banded storage, factorized with ``scipy.linalg.cholesky_banded``
   (LAPACK pbtrf — the same O(T d^2) sequential banded Cholesky the C++ op
   implements) + ``cho_solve_banded`` for the quadratic term.  The forward
   log-likelihood is exactly the reference's 4-term decomposition; the
   reference's training step additionally runs the hand-written C++ gradient
   ops, whose cost is a small multiple of the forward's — so the *forward*
   time reported here is a LOWER bound on the reference's per-step cost.

2. ``tf_scan``: a sequential Kalman-filter log marginal likelihood under
   ``tf.function`` on CPU with a ``GradientTape`` step — the framework-level
   equivalent of training the same model in TF without the C++ ops.

Usage: python benchmarks/tf_cpu_baseline.py [--T 1000000]
Prints one JSON line per baseline.
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np


def matern32_ssm(ts, lengthscale=0.5, variance=1.0):
    """Exact Matern-3/2 discretization (A_k, Q_k) in float64 NumPy."""
    lam = np.sqrt(3.0) / lengthscale
    dt = np.diff(ts)
    e = np.exp(-lam * dt)
    # A = e^{-lam dt} (I + (lam I + F) dt), F = [[0,1],[-lam^2,-2 lam]]
    A = np.zeros((len(dt), 2, 2))
    A[:, 0, 0] = e * (1 + lam * dt)
    A[:, 0, 1] = e * dt
    A[:, 1, 0] = -e * lam * lam * dt
    A[:, 1, 1] = e * (1 - lam * dt)
    P_inf = np.array([[variance, 0.0], [0.0, variance * lam * lam]])
    Q = P_inf[None] - A @ P_inf[None] @ np.transpose(A, (0, 2, 1))
    return A, Q, P_inf


def bench_scipy_banded(T, reps=3):
    """Reference stack 3.1 forward pass: banded posterior precision ->
    cholesky_band -> solves -> log-likelihood terms (all LAPACK)."""
    import scipy.linalg as sla

    rng = np.random.default_rng(0)
    ts = np.linspace(0.0, T / 1000.0, T)
    y = np.sin(2.0 * ts) + 0.2 * rng.standard_normal(T)
    A, Q, P0 = matern32_ssm(ts)
    sigma2 = 0.04
    d, n = 2, T

    def forward():
        # SpInGP precision K^-1 = A^-T Q^-1 A^-1 as banded blocks:
        # D_k = Q_k^-1 + A_{k+1}^T Q_{k+1}^-1 A_{k+1}, off O_k = -Q_k^-1 A_k
        Qi = np.linalg.inv(Q)
        P0i = np.linalg.inv(P0)
        AtQi = np.transpose(A, (0, 2, 1)) @ Qi
        diag = np.empty((n, d, d))
        diag[0] = P0i + AtQi[0] @ A[0]
        diag[1:] = Qi
        diag[1:-1] += AtQi[1:] @ A[1:]
        off = -Qi @ A  # [n-1, d, d] block sub-diagonal
        # observation precision on the first state component
        diag[:, 0, 0] += 1.0 / sigma2
        # pack into LAPACK lower-banded storage ab[i, j] = M[j + i, j]
        bw = 2 * d  # 2x2 blocks -> lower bandwidth 3, plus diagonal
        ab = np.zeros((bw, n * d))
        for bi in range(d):
            for bj in range(d):
                # diagonal blocks
                r = bi - bj
                if r >= 0:
                    ab[r, bj::d][: n] = diag[:, bi, bj]
                # sub-diagonal blocks: M[(k+1)d + bi, k d + bj]
                r2 = d + bi - bj
                ab[r2, bj : (n - 1) * d : d] = off[:, bi, bj]
        L = sla.cholesky_banded(ab, lower=True)
        # quadratic term: solve (K^-1 + H^T S^-1 H) x = H^T S^-1 y
        rhs = np.zeros(n * d)
        rhs[0::d] = y / sigma2
        x = sla.cho_solve_banded((L, True), rhs)
        quad = y @ y / sigma2 - rhs @ x
        logdet_post = 2.0 * np.sum(np.log(L[0]))
        logdet_prior = -(np.linalg.slogdet(P0)[1]
                         + np.linalg.slogdet(Q)[1].sum())
        ll = -0.5 * (quad + logdet_post - logdet_prior
                     + n * np.log(2 * np.pi * sigma2))
        return ll

    ll = forward()
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        forward()
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) * 1e3, float(ll)


def bench_scipy_natgrad_standin(T, reps=3):
    """Stand-in for the reference's natural-gradient step (BASELINE
    configs 2-3; reference ssm_natgrad.py:121-218).

    One natgrad step in the reference chains >= 10 banded C++ passes over
    the T-point block-tridiagonal precision: ssm_to_expectations
    (cholesky_band + Takahashi inverse_from_cholesky_band + solves,
    ssm_gaussian_transformations.py:32-89), the ELBO gradient (Kalman
    forward + the hand-written C++ backward kernels), the
    expectations_to_ssm_params VJP, and naturals_to_ssm_params
    (cholesky_band + solve_triang_band, :333-511).  Every pass is an O(T d^2)
    *sequential* recursion with the same per-block flop shape as LAPACK
    pbtrf, so we measure ONE factorization + ONE solve on the actual
    precision (strict lower bound on any single pass) and also report a
    10-pass model of the full step.  Returns (one_pass_ms, modeled_ms).
    """
    import scipy.linalg as sla

    ts = np.linspace(0.0, T / 1000.0, T)
    A, Q, P0 = matern32_ssm(ts)
    d, n = 2, T
    Qi = np.linalg.inv(Q)
    P0i = np.linalg.inv(P0)
    AtQi = np.transpose(A, (0, 2, 1)) @ Qi
    diag = np.empty((n, d, d))
    diag[0] = P0i + AtQi[0] @ A[0]
    diag[1:] = Qi
    diag[1:-1] += AtQi[1:] @ A[1:]
    diag[:, 0, 0] += 25.0  # site precisions (Bernoulli-scale)
    off = -Qi @ A
    ab = np.zeros((2 * d, n * d))
    for bi in range(d):
        for bj in range(d):
            r = bi - bj
            if r >= 0:
                ab[r, bj::d][:n] = diag[:, bi, bj]
            ab[d + bi - bj, bj : (n - 1) * d : d] = off[:, bi, bj]
    rhs = np.zeros(n * d)
    rhs[0::d] = 1.0

    def one_pass():
        L = sla.cholesky_banded(ab, lower=True)
        return sla.cho_solve_banded((L, True), rhs)

    one_pass()
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        one_pass()
        times.append(time.perf_counter() - t0)
    ms = float(np.median(times)) * 1e3
    return ms, 10.0 * ms


def bench_tf_scan(T, reps=3):
    """Sequential TF Kalman filter (tf.function, CPU) + GradientTape step."""
    import tensorflow as tf

    tf.config.set_visible_devices([], "GPU")
    rng = np.random.default_rng(0)
    ts = np.linspace(0.0, T / 1000.0, T)
    y = (np.sin(2.0 * ts) + 0.2 * rng.standard_normal(T)).astype(np.float64)
    A_np, Q_np, P0 = matern32_ssm(ts)
    sigma2 = tf.constant(0.04, tf.float64)
    A = tf.constant(A_np)
    Q = tf.constant(Q_np)
    H = tf.constant([[1.0, 0.0]], tf.float64)
    yv = tf.constant(y[:, None])

    @tf.function(jit_compile=False)
    def loglik(log_s2):
        s2 = tf.exp(log_s2)

        def step(carry, inp):
            m, P, ll = carry
            a, q, obs = inp
            mp = tf.linalg.matvec(a, m)
            Pp = a @ P @ tf.transpose(a) + q
            S = (H @ Pp @ tf.transpose(H))[0, 0] + s2
            v = obs[0] - (H @ mp[:, None])[0, 0]
            K = (Pp @ tf.transpose(H))[:, 0] / S
            m_new = mp + K * v
            P_new = Pp - K[:, None] * (H @ Pp)
            ll_new = ll - 0.5 * (tf.math.log(2 * np.pi * S) + v * v / S)
            return m_new, P_new, ll_new

        init = (tf.zeros(2, tf.float64), tf.constant(P0),
                tf.constant(0.0, tf.float64))
        # first observation against the prior
        S0 = (H @ tf.constant(P0) @ tf.transpose(H))[0, 0] + s2
        v0 = yv[0, 0]
        K0 = (tf.constant(P0) @ tf.transpose(H))[:, 0] / S0
        m0 = K0 * v0
        P0_post = tf.constant(P0) - K0[:, None] * (H @ tf.constant(P0))
        ll0 = -0.5 * (tf.math.log(2 * np.pi * S0) + v0 * v0 / S0)
        out = tf.scan(step, (A, Q, yv[1:]), initializer=(m0, P0_post, ll0))
        return out[2][-1]

    log_s2 = tf.Variable(tf.math.log(tf.constant(0.04, tf.float64)))

    def train_step():
        with tf.GradientTape() as tape:
            ll = loglik(log_s2)
        g = tape.gradient(ll, log_s2)
        return float(ll), float(g)

    ll, _ = train_step()  # compile
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        train_step()
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) * 1e3, float(ll)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--T", type=int, default=1_000_000)
    ap.add_argument("--skip-tf", action="store_true")
    args = ap.parse_args()

    ms, ll = bench_scipy_banded(args.T)
    print(json.dumps({
        "metric": f"cpu_banded_cholesky_forward_T{args.T}",
        "value": round(ms, 2), "unit": "ms", "loglik": round(ll, 2),
        "note": "LAPACK pbtrf lower bound on reference GPR step"}),
        flush=True)
    for t_ng in (100_000, 2049):
        ms1, ms10 = bench_scipy_natgrad_standin(t_ng)
        print(json.dumps({
            "metric": f"cpu_banded_natgrad_standin_T{t_ng}",
            "value": round(ms1, 2), "unit": "ms",
            "modeled_full_step_ms": round(ms10, 2),
            "note": "one LAPACK banded factorization+solve on the "
                    "block-tridiag precision (strict lower bound per banded "
                    "pass); full natgrad step modeled as 10 passes"}),
            flush=True)
    if not args.skip_tf:
        ms, ll = bench_tf_scan(args.T)
        print(json.dumps({
            "metric": f"tf_cpu_sequential_kalman_train_step_T{args.T}",
            "value": round(ms, 2), "unit": "ms", "loglik": round(ll, 2)}),
            flush=True)


if __name__ == "__main__":
    main()
