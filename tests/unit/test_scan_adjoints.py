"""Analytic custom-VJP adjoints of the affine prefix scans vs autodiff.

Autodiff through the chunked associative scan unrolls every scan-tree level
into the transpose program (measured 64x the forward eqn count at d = 2,
which pushed the f64 VGP/natgrad graphs past any practical XLA compile
budget).  ops/scans.py therefore ships analytic adjoints:

  affine scan      x_k = F_k x_{k-1} + c_k:
      lam_k = xbar_k + F_{k+1}^T lam_{k+1};  cbar = lam;
      Fbar_k = lam_k x_{k-1}^T
  cov scan         P_k = F_k P_{k-1} F_k^T + Q_k   (+ mean recursion):
      M_k = sym(Pbar_k) + F_{k+1}^T M_{k+1} F_{k+1};  qbar = M;
      Fbar_k += 2 M_k F_k P_{k-1}

These tests pin them against plain autodiff through an un-decorated copy of
the same combine (the oracle), for several batch shapes and state dims, in
float64.  Covariance cotangents follow the canonical symmetric-extension
convention (as in ops/adjoint.py), so the Q-gradient comparison symmetrizes
both sides.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import markovflow_tpu.ops.scans as S


def _oracle_cov_scan(f_tl, c_tl, q_tl):
    def combine(e1, e2):
        f1, c1, q1 = e1
        f2, c2, q2 = e2
        f = S._mm(f2, f1)
        cc = S._mm(f2, c1) + c2
        q = S._mm(f2, S._mm(q1, S._t(f2))) + q2
        return f, cc, 0.5 * (q + S._t(q))

    _, ms, ps = jax.lax.associative_scan(
        combine, (f_tl, c_tl, q_tl), axis=f_tl.ndim - 1)
    return ms, ps


def _oracle_affine_scan(F, c):
    f_tl = jnp.moveaxis(F, -3, -1)
    c_tl = jnp.moveaxis(c[..., None], -3, -1)

    def combine(e1, e2):
        f1, c1 = e1
        f2, c2 = e2
        return S._mm(f2, f1), S._mm(f2, c1) + c2

    _, xs = jax.lax.associative_scan(
        combine, (f_tl, c_tl), axis=f_tl.ndim - 1)
    return jnp.moveaxis(xs[..., 0, :], -1, -2)


@pytest.mark.parametrize("d", [
    pytest.param(1, marks=pytest.mark.slow),
    2,
    pytest.param(3, marks=pytest.mark.slow),
])
def test_affine_cov_scan_adjoint_matches_autodiff(batch_shape, d, rng):
    n = 17
    f = jnp.asarray(rng.standard_normal(batch_shape + (d, d, n))) * 0.5
    c = jnp.asarray(rng.standard_normal(batch_shape + (d, 1, n)))
    half = rng.standard_normal(batch_shape + (d, d, n)) * 0.3
    q = jnp.asarray(np.einsum("...ikn,...jkn->...ijn", half, half))
    wm = jnp.asarray(rng.standard_normal(batch_shape + (d, 1, n)))
    wp_half = rng.standard_normal(batch_shape + (d, d, n))
    wp = jnp.asarray(wp_half + np.swapaxes(wp_half, -3, -2))

    def loss(scan):
        def inner(f, c, q):
            ms, ps = scan(f, c, q)
            return jnp.sum(ms * wm) + jnp.sum(ps * wp)
        return inner

    v1 = loss(S.affine_cov_scan_tl)(f, c, q)
    v2 = loss(_oracle_cov_scan)(f, c, q)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-12)
    g1 = jax.grad(loss(S.affine_cov_scan_tl), argnums=(0, 1, 2))(f, c, q)
    g2 = jax.grad(loss(_oracle_cov_scan), argnums=(0, 1, 2))(f, c, q)
    sym = lambda a: 0.5 * (a + jnp.swapaxes(a, -3, -2))
    np.testing.assert_allclose(g1[0], g2[0], rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(g1[1], g2[1], rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(sym(g1[2]), sym(g2[2]), rtol=1e-9, atol=1e-11)


@pytest.mark.parametrize("d", [
    pytest.param(1, marks=pytest.mark.slow),
    3,
])
def test_affine_scan_adjoint_matches_autodiff(batch_shape, d, rng):
    n = 13
    F = jnp.asarray(rng.standard_normal(batch_shape + (n, d, d))) * 0.5
    c = jnp.asarray(rng.standard_normal(batch_shape + (n, d)))
    w = jnp.asarray(rng.standard_normal(batch_shape + (n, d)))

    def loss(scan):
        return lambda F, c: jnp.sum(scan(F, c) * w)

    g1 = jax.grad(loss(S.affine_scan), argnums=(0, 1))(F, c)
    g2 = jax.grad(loss(_oracle_affine_scan), argnums=(0, 1))(F, c)
    np.testing.assert_allclose(g1[0], g2[0], rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(g1[1], g2[1], rtol=1e-9, atol=1e-11)


@pytest.mark.slow
def test_affine_scan_adjoint_broadcast_sample_dims(rng):
    """The sampling path broadcasts c over leading sample dims (IWVI
    reparameterized gradients flow through this)."""
    n, d = 9, 2
    F = jnp.asarray(rng.standard_normal((n, d, d))) * 0.5
    c = jnp.asarray(rng.standard_normal((4, n, d)))
    w = jnp.asarray(rng.standard_normal((4, n, d)))

    def loss(F, c):
        return jnp.sum(S.affine_scan(F, c) * w)

    gF, gc = jax.grad(loss, argnums=(0, 1))(F, c)
    assert gF.shape == F.shape and gc.shape == c.shape
    eps = 1e-6
    idx = (0, 0, 1)
    fd = (loss(F.at[idx].add(eps), c) - loss(F.at[idx].add(-eps), c)) / (
        2 * eps)
    np.testing.assert_allclose(float(gF[idx]), float(fd), rtol=1e-5)


def test_adjoint_under_chunking_threshold_boundary(rng):
    """Same answers on either side of the chunked-scan threshold."""
    d = 2
    for n in (64,):
        f = jnp.asarray(rng.standard_normal((d, d, n))) * 0.4
        c = jnp.asarray(rng.standard_normal((d, 1, n)))
        half = rng.standard_normal((d, d, n)) * 0.3
        q = jnp.asarray(np.einsum("ikn,jkn->ijn", half, half))
        wm = jnp.asarray(rng.standard_normal((d, 1, n)))

        def loss_chunked(f, c, q):
            old = (S.CHUNK_THRESHOLD, S.CHUNK,
                   S.CHUNK_THRESHOLD_F64, S.CHUNK_F64)
            try:
                S.CHUNK_THRESHOLD = S.CHUNK = 16
                S.CHUNK_THRESHOLD_F64 = S.CHUNK_F64 = 16
                ms, _ = S.affine_cov_scan_tl(f, c, q)
            finally:
                (S.CHUNK_THRESHOLD, S.CHUNK,
                 S.CHUNK_THRESHOLD_F64, S.CHUNK_F64) = old
            return jnp.sum(ms * wm)

        def loss_flat(f, c, q):
            ms, _ = S.affine_cov_scan_tl(f, c, q)
            return jnp.sum(ms * wm)

        g1 = jax.grad(loss_chunked, argnums=(0, 1, 2))(f, c, q)
        g2 = jax.grad(loss_flat, argnums=(0, 1, 2))(f, c, q)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(a, b, rtol=1e-9, atol=1e-11)


def test_forward_mode_raises_by_default_and_works_in_context(rng):
    """Custom-VJP scans have no JVP rule; the forward_mode_ad() escape
    hatch must (a) make jax.jvp work and agree with finite differences,
    and (b) leave reverse-mode equal to the analytic-adjoint default."""
    n, d = 9, 2
    F = jnp.asarray(rng.standard_normal((n, d, d))) * 0.5
    c = jnp.asarray(rng.standard_normal((n, d)))
    w = jnp.asarray(rng.standard_normal((n, d)))
    dc = jnp.asarray(rng.standard_normal((n, d)))

    def loss(c_):
        return jnp.sum(S.affine_scan(F, c_) * w)

    with pytest.raises(TypeError):
        jax.jvp(loss, (c,), (dc,))

    with S.forward_mode_ad():
        val, tang = jax.jvp(loss, (c,), (dc,))
        eps = 1e-6
        fd = (loss(c + eps * dc) - loss(c - eps * dc)) / (2 * eps)
        np.testing.assert_allclose(float(tang), float(fd), rtol=1e-6)
        g_fwd = jax.grad(loss)(c)
    g_analytic = jax.grad(loss)(c)
    np.testing.assert_allclose(g_fwd, g_analytic, rtol=1e-9, atol=1e-11)
    # the flag is restored on exit
    assert S._ANALYTIC_ADJOINTS is True


@pytest.mark.slow
def test_forward_mode_hessian_through_cov_scan(rng):
    """jax.hessian through the cov scan inside the hatch (the use case the
    round-4 advisor flagged: second-order work through marginals)."""
    n, d = 6, 2
    f = jnp.asarray(rng.standard_normal((d, d, n))) * 0.4
    c0 = jnp.asarray(rng.standard_normal((d, 1, n)))
    half = rng.standard_normal((d, d, n)) * 0.3
    q = jnp.asarray(np.einsum("ikn,jkn->ijn", half, half))
    wm = jnp.asarray(rng.standard_normal((d, 1, n)))

    def loss(c_):
        ms, ps = S.affine_cov_scan_tl(f, c_, q)
        return jnp.sum(ms * wm) + 0.1 * jnp.sum(ps * ps)

    with S.forward_mode_ad():
        h = jax.hessian(loss)(c0)
    assert h.shape == c0.shape + c0.shape
    # Hessian is symmetric under index exchange
    hm = h.reshape(c0.size, c0.size)
    np.testing.assert_allclose(hm, hm.T, rtol=1e-8, atol=1e-10)
