"""Independent NumPy Kalman filter/smoother oracle (Sarkka notation).

Hand-written sequential implementation used to validate the parallel-scan
engine, mirroring the reference's oracle strategy
(reference: tests/tools/numpy_kalman_filter.py).
"""
from __future__ import annotations

import numpy as np


def random_ssm(rng, T, d, batch=()):
    """Random stable SSM parameters (numpy, float64)."""
    def rand(*shape):
        return rng.standard_normal(batch + shape)

    mu0 = rand(d)
    l0 = np.tril(rand(d, d)) + 2.0 * np.eye(d)
    A = 0.5 * rand(T, d, d) / np.sqrt(d)
    b = rand(T, d)
    lq_raw = np.tril(rand(T, d, d))
    lq = lq_raw + 2.0 * np.eye(d)
    return mu0, l0, A, b, lq


def joint_mean_cov(mu0, P0, As, bs, Qs):
    """Dense joint mean/covariance of all states (tiny T only)."""
    T, d = As.shape[0], As.shape[-1]
    n = T + 1
    means = [mu0]
    for k in range(T):
        means.append(As[k] @ means[-1] + bs[k])
    # covariance via recursion on blocks
    cov = np.zeros((n * d, n * d))
    cov[:d, :d] = P0
    P = [P0]
    for k in range(T):
        P.append(As[k] @ P[-1] @ As[k].T + Qs[k])
    for i in range(n):
        cov[i * d:(i + 1) * d, i * d:(i + 1) * d] = P[i]
    for i in range(n):
        for j in range(i + 1, n):
            # Cov(x_i, x_j) = P_i @ (A_{j-1}...A_i)^T
            prod = np.eye(d)
            for k in range(i, j):
                prod = As[k] @ prod
            cov[i * d:(i + 1) * d, j * d:(j + 1) * d] = P[i] @ prod.T
            cov[j * d:(j + 1) * d, i * d:(i + 1) * d] = (P[i] @ prod.T).T
    return np.concatenate(means), cov


def kalman_filter(mu0, P0, As, bs, Qs, H, R, ys):
    """Sequential filter over N = T+1 states observed at every step.

    H: [o, d] or [N, o, d]; R: [o, o] or [N, o, o]; ys: [N, o].
    Returns (filtered means [N,d], covs [N,d,d], predicted means/covs, loglik).
    """
    N = ys.shape[0]
    d = mu0.shape[0]
    Hs = np.broadcast_to(H, (N,) + H.shape[-2:])
    Rs = np.broadcast_to(R, (N,) + R.shape[-2:])
    m_pred, p_pred = mu0.copy(), P0.copy()
    mf, pf, mp, pp = [], [], [], []
    loglik = 0.0
    for k in range(N):
        mp.append(m_pred.copy())
        pp.append(p_pred.copy())
        Hk, Rk, yk = Hs[k], Rs[k], ys[k]
        S = Hk @ p_pred @ Hk.T + Rk
        v = yk - Hk @ m_pred
        Sinv = np.linalg.inv(S)
        loglik += -0.5 * (
            v @ Sinv @ v
            + np.linalg.slogdet(S)[1]
            + len(yk) * np.log(2 * np.pi)
        )
        K = p_pred @ Hk.T @ Sinv
        m = m_pred + K @ v
        P = p_pred - K @ S @ K.T
        mf.append(m)
        pf.append(P)
        if k < N - 1:
            m_pred = As[k] @ m + bs[k]
            p_pred = As[k] @ P @ As[k].T + Qs[k]
    return (np.array(mf), np.array(pf), np.array(mp), np.array(pp), loglik)


def rts_smoother(mf, pf, As, bs, Qs):
    """Sequential RTS smoother. Returns (means, covs, gains)."""
    N, d = mf.shape
    ms = [None] * N
    ps = [None] * N
    gains = [None] * (N - 1)
    ms[-1], ps[-1] = mf[-1], pf[-1]
    for k in range(N - 2, -1, -1):
        p_pred = As[k] @ pf[k] @ As[k].T + Qs[k]
        G = pf[k] @ As[k].T @ np.linalg.inv(p_pred)
        gains[k] = G
        m_pred = As[k] @ mf[k] + bs[k]
        ms[k] = mf[k] + G @ (ms[k + 1] - m_pred)
        ps[k] = pf[k] + G @ (ps[k + 1] - p_pred) @ G.T
    return np.array(ms), np.array(ps), np.array(gains)
