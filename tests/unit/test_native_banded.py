"""Native C++ host-kernel parity vs the scan implementations.

Forward values AND gradients (the C++ VJP kernels vs JAX autodiff through
the ``lax.scan`` recursions), mirroring how the reference validates its
C++ ``banded_matrices`` gradients against finite differences
(reference: banded_matrices tests; markovflow/block_tri_diag.py:22-31).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from markovflow_tpu import native
from markovflow_tpu.block_tri_diag import (
    LowerTriangularBlockTriDiagonal,
    SymmetricBlockTriDiagonal,
)

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain on this host")

RNG = np.random.default_rng(7)


def rand_spd_tri(nb, d, batch=()):
    m = RNG.standard_normal(batch + (nb * d, nb * d))
    a = m @ np.swapaxes(m, -1, -2) + 3 * nb * d * np.eye(nb * d)
    diag = np.stack(
        [a[..., k * d:(k + 1) * d, k * d:(k + 1) * d] for k in range(nb)], -3)
    if nb > 1:
        lower = np.stack(
            [a[..., (k + 1) * d:(k + 2) * d, k * d:(k + 1) * d]
             for k in range(nb - 1)], -3)
    else:
        lower = np.zeros(batch + (0, d, d))
    return jnp.asarray(diag), jnp.asarray(lower)


@pytest.mark.parametrize("batch", [(), (3,), (2, 3)])
@pytest.mark.parametrize("nb,d", [(1, 2), (7, 1), (6, 3), (5, 4)])
def test_forward_parity(batch, nb, d):
    diag, lower = rand_spd_tri(nb, d, batch)
    sym = SymmetricBlockTriDiagonal(diag, lower)
    ref = sym.cholesky()
    nat = sym.cholesky(engine="native")
    np.testing.assert_allclose(nat.diag, ref.diag, rtol=1e-11, atol=1e-12)
    if nb > 1:
        np.testing.assert_allclose(nat.lower, ref.lower, rtol=1e-11,
                                   atol=1e-12)

        rhs = jnp.asarray(RNG.standard_normal(batch + (nb, d)))
        for tr in (False, True):
            np.testing.assert_allclose(
                ref.solve(rhs, transpose_left=tr, engine="native"),
                ref.solve(rhs, transpose_left=tr),
                rtol=1e-10, atol=1e-12)

        zd, zo = ref.sparse_inverse_band()
        zd_n, zo_n = ref.sparse_inverse_band(engine="native")
        np.testing.assert_allclose(zd_n, zd, rtol=1e-10, atol=1e-12)
        np.testing.assert_allclose(zo_n, zo, rtol=1e-10, atol=1e-12)

        uo, dc = sym.upper_diagonal_lower()
        uo_n, dc_n = sym.upper_diagonal_lower(engine="native")
        np.testing.assert_allclose(uo_n, uo, rtol=1e-10, atol=1e-12)
        np.testing.assert_allclose(dc_n, dc, rtol=1e-10, atol=1e-12)


def test_cholesky_gradient_parity():
    nb, d = 6, 3
    diag, lower = rand_spd_tri(nb, d)
    w1 = jnp.asarray(RNG.standard_normal((nb, d, d)))
    w2 = jnp.asarray(RNG.standard_normal((nb - 1, d, d)))

    def loss(dg, lo, engine):
        # upstream symmetrize: precision inputs are symmetric by
        # construction everywhere in the library; the two engines'
        # cotangents agree on the symmetric subspace (banded.cc notes)
        dg = (dg + jnp.swapaxes(dg, -1, -2)) / 2
        L = SymmetricBlockTriDiagonal(dg, lo).cholesky(engine=engine)
        return jnp.sum(w1 * L.diag) + jnp.sum(w2 * L.lower)

    g_ref = jax.grad(loss, argnums=(0, 1))(diag, lower, "scan")
    g_nat = jax.grad(loss, argnums=(0, 1))(diag, lower, "native")
    for a, b in zip(g_ref, g_nat):
        np.testing.assert_allclose(b, a, rtol=1e-9, atol=1e-11)


@pytest.mark.parametrize("transpose", [False, True])
def test_solve_gradient_parity(transpose):
    nb, d = 6, 3
    diag, lower = rand_spd_tri(nb, d)
    L = SymmetricBlockTriDiagonal(diag, lower).cholesky()
    rhs = jnp.asarray(RNG.standard_normal((nb, d)))
    w = jnp.asarray(RNG.standard_normal((nb, d)))

    def loss(ld, ll, r, engine):
        lt = LowerTriangularBlockTriDiagonal(ld, ll)
        return jnp.sum(w * lt.solve(r, transpose_left=transpose,
                                    engine=engine))

    g_ref = jax.grad(loss, argnums=(0, 1, 2))(L.diag, L.lower, rhs, "scan")
    g_nat = jax.grad(loss, argnums=(0, 1, 2))(L.diag, L.lower, rhs, "native")
    for a, b in zip(g_ref, g_nat):
        np.testing.assert_allclose(b, a, rtol=1e-9, atol=1e-11)


def test_sparse_inverse_gradient_parity():
    nb, d = 6, 3
    diag, lower = rand_spd_tri(nb, d)
    L = SymmetricBlockTriDiagonal(diag, lower).cholesky()
    w1 = jnp.asarray(RNG.standard_normal((nb, d, d)))
    w2 = jnp.asarray(RNG.standard_normal((nb - 1, d, d)))

    def loss(ld, ll, engine):
        zd, zo = LowerTriangularBlockTriDiagonal(ld, ll).sparse_inverse_band(
            engine=engine)
        return jnp.sum(w1 * zd) + jnp.sum(w2 * zo)

    g_ref = jax.grad(loss, argnums=(0, 1))(L.diag, L.lower, "scan")
    g_nat = jax.grad(loss, argnums=(0, 1))(L.diag, L.lower, "native")
    for a, b in zip(g_ref, g_nat):
        np.testing.assert_allclose(b, a, rtol=1e-9, atol=1e-11)


def test_native_under_jit_and_vmap():
    nb, d = 5, 2
    diag, lower = rand_spd_tri(nb, d)
    ref = SymmetricBlockTriDiagonal(diag, lower).cholesky()

    jit_chol = jax.jit(
        lambda dg, lo: SymmetricBlockTriDiagonal(dg, lo)
        .cholesky(engine="native").diag)
    np.testing.assert_allclose(jit_chol(diag, lower), ref.diag, rtol=1e-11)

    bdiag = jnp.stack([diag, 2.0 * diag])
    blower = jnp.stack([lower, 2.0 * lower])
    out = jax.vmap(lambda dg, lo: SymmetricBlockTriDiagonal(dg, lo)
                   .cholesky(engine="native").diag)(bdiag, blower)
    ref2 = SymmetricBlockTriDiagonal(2.0 * diag, 2.0 * lower).cholesky()
    np.testing.assert_allclose(out[0], ref.diag, rtol=1e-11)
    np.testing.assert_allclose(out[1], ref2.diag, rtol=1e-11)


def test_float32_variant():
    nb, d = 5, 2
    diag, lower = rand_spd_tri(nb, d)
    diag32 = diag.astype(jnp.float32)
    lower32 = lower.astype(jnp.float32)
    ref = SymmetricBlockTriDiagonal(diag32, lower32).cholesky()
    nat = SymmetricBlockTriDiagonal(diag32, lower32).cholesky(engine="native")
    assert nat.diag.dtype == jnp.float32
    np.testing.assert_allclose(nat.diag, ref.diag, rtol=2e-5, atol=1e-6)


def test_non_psd_input_gives_nan():
    nb, d = 4, 2
    diag = jnp.asarray(np.stack([-np.eye(d)] * nb))
    lower = jnp.asarray(np.zeros((nb - 1, d, d)))
    nat = SymmetricBlockTriDiagonal(diag, lower).cholesky(engine="native")
    assert bool(jnp.isnan(nat.diag).any())
