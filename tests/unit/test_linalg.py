"""Unit tests for utils/linalg.py — in particular the pivot-clamped
``psd_cholesky`` used by the posterior-SSM extraction
(kalman_filter.py:247-252) on degenerate grids.

The gradient case pins the round-4 advisor finding: with the naive
``sqrt(maximum(s, 0))`` clamp the *value* is finite but the *gradient* is
NaN exactly when the clamp engages (d/ds sqrt at 0 is inf, times
maximum's zero cotangent).  The double-where guard must keep both finite.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from markovflow_tpu.utils.linalg import psd_cholesky


@pytest.mark.parametrize("d", [1, 2, 3, 4])
def test_psd_cholesky_matches_lapack_on_pd(rng, d):
    a = rng.standard_normal((5, d, d))
    mat = jnp.asarray(a @ np.swapaxes(a, -1, -2) + 0.5 * np.eye(d))
    np.testing.assert_allclose(psd_cholesky(mat), jnp.linalg.cholesky(mat),
                               rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("d", [1, 2, 3])
def test_psd_cholesky_clamps_roundoff_negative(d):
    # a PSD matrix perturbed to have a tiny negative trailing pivot —
    # the deterministic-transition limit that arises from catastrophic
    # cancellation in Q_post on near-coincident time points
    mat = jnp.eye(d).at[-1, -1].set(-1e-16)
    chol = psd_cholesky(mat)
    assert bool(jnp.all(jnp.isfinite(chol)))
    # clamped pivot is exactly zero, not NaN
    assert float(chol[-1, -1]) == 0.0


@pytest.mark.parametrize("d", [1, 2, 3])
def test_psd_cholesky_grad_finite_when_clamp_engages(d):
    def f(m):
        return jnp.sum(psd_cholesky(m))

    # exactly-singular input: the clamp engages on the last pivot
    mat = jnp.eye(d).at[-1, -1].set(0.0)
    g = jax.grad(f)(mat)
    assert bool(jnp.all(jnp.isfinite(g))), g
    # ... and a roundoff-negative input
    mat2 = jnp.eye(d).at[-1, -1].set(-1e-18)
    g2 = jax.grad(f)(mat2)
    assert bool(jnp.all(jnp.isfinite(g2))), g2


def test_psd_cholesky_grad_matches_autodiff_cholesky_on_pd(rng):
    a = rng.standard_normal((3, 3))
    mat = jnp.asarray(a @ a.T + 0.5 * np.eye(3))

    g_ours = jax.grad(lambda m: jnp.sum(psd_cholesky(m)))(mat)
    g_ref = jax.grad(lambda m: jnp.sum(jnp.linalg.cholesky(m)))(mat)
    # both differentiate a function of a symmetric matrix; they distribute
    # the off-diagonal cotangent differently (ours reads only the lower
    # triangle), so compare on symmetric perturbations
    sym = lambda g: g + g.T - jnp.diag(jnp.diag(g))  # noqa: E731
    np.testing.assert_allclose(sym(g_ours), sym(g_ref),
                               rtol=1e-9, atol=1e-10)
