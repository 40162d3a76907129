"""SDE utilities: simulation, statistical linearization, drift-difference KL.

Rebuild of ``markovflow/sde/sde_utils.py`` (228 LoC) on lax.scan / vmapped
quadrature so everything jits and vmaps over batched trajectories.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..state_space_model import StateSpaceModel
from .drift import LinearDrift
from .sde import SDE, Gaussian, mvnquad

__all__ = [
    "euler_maruyama",
    "linearize_sde",
    "squared_drift_difference_along_Gaussian_path",
]


def euler_maruyama(sde: SDE, x0, time_grid, key):
    """Simulate dx = f dt + l dB on a homogeneous grid via lax.scan
    (reference: sde_utils.py:29-84).

    x0 [batch, d]; time_grid [N].  Returns [batch, N, d] with x0 at index 0.
    """
    n = time_grid.shape[-1]
    batch, d = x0.shape
    dt = time_grid[1] - time_grid[0]
    noises = jax.random.normal(key, (n - 1, batch, d), x0.dtype)

    def step(x, inp):
        t, eps = inp
        tb = jnp.full((batch, 1), t, x.dtype)
        diff = sde.diffusion(x, tb) * jnp.sqrt(dt)
        x_next = x + sde.drift(x, tb) * dt + jnp.einsum(
            "bij,bj->bi", diff, eps)
        return x_next, x_next

    _, xs = jax.lax.scan(step, x0, (time_grid[:-1], noises))
    return jnp.concatenate([x0[:, None, :], jnp.moveaxis(xs, 0, 1)], axis=1)


def linearize_sde(sde: SDE, transition_times, linearization_path: Gaussian,
                  initial_state: Gaussian) -> StateSpaceModel:
    """Statistical linearization of the SDE along a Gaussian path
    (state_dim 1 only, as in the reference; reference: sde_utils.py:107-158):

        A*_i = E_q[df/dx] dt + I,   b*_i = (E_q[f] - A*_i E_q[x]) dt
    """
    assert sde.state_dim == 1
    q_mean = jnp.atleast_3d(linearization_path.mu)  # (B, N, D)
    q_covar = linearization_path.cov
    if q_covar.ndim == 3:
        q_covar = q_covar[None]
    initial_mean = jnp.atleast_2d(initial_state.mu)  # (B, D)
    init_cov = initial_state.cov
    if init_cov.ndim == 2:
        init_cov = init_cov[None]
    initial_chol = jnp.linalg.cholesky(init_cov)

    e_f = sde.expected_drift(q_mean, q_covar)
    a = sde.expected_gradient_drift(q_mean, q_covar)
    b = e_f - a * q_mean
    a_diag = a[..., None] * jnp.eye(sde.state_dim, dtype=a.dtype)
    q_diff = sde.diffusion(q_mean, transition_times[:-1])
    return LinearDrift(A=a_diag, b=b).to_ssm(
        q=q_diff, transition_times=transition_times,
        initial_mean=initial_mean, initial_chol_covariance=initial_chol)


def squared_drift_difference_along_Gaussian_path(
        sde_p: SDE, linear_drift: LinearDrift, q: Gaussian, dt,
        quadrature_pnts: int = 20):
    """0.5 E_q ||f_L(x) - f_p(x)||^2_{Sigma^{-1}} dt, Riemann-summed over the
    path — equals KL[q || p] when the linear drift is q's
    (reference: sde_utils.py:161-228).  state_dim 1, unbatched.
    """
    assert sde_p.state_dim == 1
    m = q.mu.reshape(-1, 1)  # (N, D)
    s = q.cov.reshape(-1, 1, 1)
    a = linear_drift.A.reshape(-1, 1)
    b = linear_drift.b.reshape(-1, 1)

    sigma = sde_p.q

    def fn(x):
        # x arrives flattened [N * H, 1]; recover per-point A, b
        n_pts = x.shape[0] // m.shape[0]
        a_r = jnp.repeat(a, n_pts, axis=0)
        b_r = jnp.repeat(b, n_pts, axis=0)
        lin = a_r * x + b_r
        prior = sde_p.drift(x, jnp.zeros_like(x))
        return (lin - prior) ** 2 / sigma

    diff = mvnquad(fn, m, s, h=quadrature_pnts)
    return 0.5 * jnp.sum(diff) * dt
