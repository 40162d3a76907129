"""Block-tridiag ops vs dense NumPy (pattern: reference tests/unit/test_block_tri_diag.py)."""
import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose

from markovflow_tpu.block_tri_diag import (
    LowerTriangularBlockTriDiagonal,
    SymmetricBlockTriDiagonal,
)


def _random_spd_tridiag(rng, n, d):
    """A well-conditioned symmetric block-tridiagonal matrix + its dense form."""
    diag = rng.standard_normal((n, d, d))
    diag = diag @ np.swapaxes(diag, -1, -2) + 5.0 * np.eye(d) * d
    lower = 0.3 * rng.standard_normal((n - 1, d, d))
    btd = SymmetricBlockTriDiagonal(jnp.asarray(diag), jnp.asarray(lower))
    return btd, np.asarray(btd.to_dense())


@pytest.mark.parametrize("d", [1, 2, 3])
@pytest.mark.parametrize("n", [1, 2, 5])
def test_cholesky_matches_dense(rng, n, d):
    btd, dense = _random_spd_tridiag(rng, n, d)
    chol = btd.cholesky()
    assert_allclose(np.asarray(chol.to_dense()), np.linalg.cholesky(dense),
                    atol=1e-10)


@pytest.mark.parametrize("transpose", [False, True])
def test_solve_matches_dense(rng, transpose):
    n, d = 5, 3
    btd, dense = _random_spd_tridiag(rng, n, d)
    chol = btd.cholesky()
    dense_l = np.linalg.cholesky(dense)
    rhs = rng.standard_normal((n, d))
    x = chol.solve(jnp.asarray(rhs), transpose_left=transpose)
    mat = dense_l.T if transpose else dense_l
    expected = np.linalg.solve(mat, rhs.reshape(-1)).reshape(n, d)
    assert_allclose(np.asarray(x), expected, atol=1e-10)


def test_abs_log_det(rng):
    n, d = 4, 2
    btd, dense = _random_spd_tridiag(rng, n, d)
    chol = btd.cholesky()
    expected = 0.5 * np.linalg.slogdet(dense)[1]
    assert_allclose(np.asarray(chol.abs_log_det()), expected, atol=1e-10)


def test_block_diagonal_of_inverse(rng):
    n, d = 6, 2
    btd, dense = _random_spd_tridiag(rng, n, d)
    chol = btd.cholesky()
    z_diag, z_off = chol.sparse_inverse_band()
    dense_inv = np.linalg.inv(dense)
    for k in range(n):
        assert_allclose(np.asarray(z_diag)[k],
                        dense_inv[k * d:(k + 1) * d, k * d:(k + 1) * d],
                        atol=1e-9)
    for k in range(n - 1):
        assert_allclose(np.asarray(z_off)[k],
                        dense_inv[(k + 1) * d:(k + 2) * d, k * d:(k + 1) * d],
                        atol=1e-9)


def test_upper_diagonal_lower_roundtrip(rng):
    n, d = 5, 3
    btd, dense = _random_spd_tridiag(rng, n, d)
    u_off, d_chol = btd.upper_diagonal_lower()
    # Rebuild dense U and D, check U D U^T = dense.
    U = np.eye(n * d)
    for k in range(n - 1):
        U[k * d:(k + 1) * d, (k + 1) * d:(k + 2) * d] = np.asarray(u_off)[k]
    D = np.zeros((n * d, n * d))
    for k in range(n):
        dc = np.asarray(d_chol)[k]
        D[k * d:(k + 1) * d, k * d:(k + 1) * d] = dc @ dc.T
    assert_allclose(U @ D @ U.T, dense, atol=1e-9)


def test_block_mult_vector(rng):
    n, d = 5, 2
    btd, dense = _random_spd_tridiag(rng, n, d)
    vec = rng.standard_normal((n, d))
    out = btd.block_mult_vector(jnp.asarray(vec))
    assert_allclose(np.asarray(out).reshape(-1), dense @ vec.reshape(-1),
                    atol=1e-10)


def test_add(rng):
    n, d = 4, 2
    a, dense_a = _random_spd_tridiag(rng, n, d)
    b, dense_b = _random_spd_tridiag(rng, n, d)
    assert_allclose(np.asarray((a + b).to_dense()), dense_a + dense_b,
                    atol=1e-12)


def test_batched_cholesky(rng):
    n, d, batch = 4, 2, (3,)
    diag = rng.standard_normal(batch + (n, d, d))
    diag = diag @ np.swapaxes(diag, -1, -2) + 5.0 * np.eye(d) * d
    lower = 0.3 * rng.standard_normal(batch + (n - 1, d, d))
    btd = SymmetricBlockTriDiagonal(jnp.asarray(diag), jnp.asarray(lower))
    chol = btd.cholesky()
    for i in range(batch[0]):
        single = SymmetricBlockTriDiagonal(jnp.asarray(diag[i]),
                                           jnp.asarray(lower[i]))
        dense = np.asarray(single.to_dense())
        got = np.asarray(
            LowerTriangularBlockTriDiagonal(chol.diag[i], chol.lower[i]).to_dense()
        )
        assert_allclose(got, np.linalg.cholesky(dense), atol=1e-10)


def test_dense_mult_matches_dense(rng):
    """dense_mult (band x dense matrix, reference: block_tri_diag.py:175)
    equals the materialized product."""
    from markovflow_tpu.block_tri_diag import SymmetricBlockTriDiagonal

    n, d, m = 5, 2, 3
    diag_raw = rng.standard_normal((n, d, d))
    diag = diag_raw @ np.swapaxes(diag_raw, -1, -2) + 3 * np.eye(d)
    lower = rng.standard_normal((n - 1, d, d))
    mat = SymmetricBlockTriDiagonal(jnp.asarray(diag), jnp.asarray(lower))
    right = jnp.asarray(rng.standard_normal((n * d, m)))
    got = mat.dense_mult(right)
    want = np.asarray(mat.to_dense()) @ np.asarray(right)
    assert_allclose(np.asarray(got), want, atol=1e-10)


def test_band_layout_round_trip(rng):
    """as_band / banded_to_block_tri (reference block_to_band/band_to_block
    parity): round trip preserves the matrix."""
    from markovflow_tpu.block_tri_diag import (
        LowerTriangularBlockTriDiagonal,
        SymmetricBlockTriDiagonal,
        banded_to_block_tri,
    )

    n, d = 4, 2
    diag_raw = rng.standard_normal((n, d, d))
    diag = diag_raw @ np.swapaxes(diag_raw, -1, -2) + 3 * np.eye(d)
    lower = rng.standard_normal((n - 1, d, d))
    sym = SymmetricBlockTriDiagonal(jnp.asarray(diag), jnp.asarray(lower))
    band = sym.as_band()
    assert band.shape == (2 * d, n * d)
    back = banded_to_block_tri(band, n, d, symmetric=True)
    assert_allclose(np.asarray(back.to_dense()), np.asarray(sym.to_dense()),
                    atol=1e-12)

    chol = sym.cholesky()
    band_l = chol.as_band()
    back_l = banded_to_block_tri(band_l, n, d, symmetric=False)
    assert_allclose(np.asarray(back_l.to_dense()),
                    np.asarray(chol.to_dense()), atol=1e-12)


def _random_spd_btd(rng, n, d, batch=()):
    """Random SPD block-tridiagonal (diag, lower) via M = B B^T + n*I with B
    block-bidiagonal."""
    bd = rng.standard_normal(batch + (n, d, d))
    bl = 0.5 * rng.standard_normal(batch + (n - 1, d, d))
    diag = bd @ np.swapaxes(bd, -1, -2) + (n + d) * np.eye(d)
    diag[..., 1:, :, :] += bl @ np.swapaxes(bl, -1, -2)
    lower = bl @ np.swapaxes(bd[..., :-1, :, :], -1, -2)
    return jnp.asarray(diag), jnp.asarray(lower)


@pytest.mark.parametrize("n", [2, 5, 8, 16, 33])
@pytest.mark.parametrize("d", [1, 3, 8])
def test_cr_solve_and_log_det_match_dense(rng, n, d):
    """Cyclic-reduction solve / log-det (the O(log N)-depth d > 6 engine)
    vs dense NumPy."""
    diag, lower = _random_spd_btd(rng, n, d)
    mat = SymmetricBlockTriDiagonal(diag, lower)
    dense = np.asarray(mat.to_dense())
    rhs = rng.standard_normal((n, d))
    x = mat.cr_solve(jnp.asarray(rhs))
    expected = np.linalg.solve(dense, rhs.reshape(-1)).reshape(n, d)
    assert_allclose(np.asarray(x), expected, atol=1e-8)
    ld = float(mat.cr_abs_log_det())
    assert_allclose(ld, np.linalg.slogdet(dense)[1], atol=1e-8)


@pytest.mark.slow
def test_cr_solve_batched(rng):
    n, d, batch = 9, 2, (3,)
    diag, lower = _random_spd_btd(rng, n, d, batch)
    mat = SymmetricBlockTriDiagonal(diag, lower)
    dense = np.asarray(mat.to_dense())
    rhs = rng.standard_normal(batch + (n, d))
    x = np.asarray(mat.cr_solve(jnp.asarray(rhs)))
    for b in range(batch[0]):
        expected = np.linalg.solve(dense[b], rhs[b].reshape(-1)).reshape(n, d)
        assert_allclose(x[b], expected, atol=1e-8)


def test_cholesky_d8_matches_dense(rng):
    """Block Cholesky at d = 8 (beyond the Pallas closed-form range) equals
    the dense Cholesky of the assembled matrix."""
    n, d = 6, 8
    diag, lower = _random_spd_btd(rng, n, d)
    mat = SymmetricBlockTriDiagonal(diag, lower)
    chol = mat.cholesky()
    dense_l = np.linalg.cholesky(np.asarray(mat.to_dense()))
    assert_allclose(np.asarray(chol.to_dense()), dense_l, atol=1e-8)


# --- banded x banded algebra (reference: banded_matrices product_band_band
# / solve_triang_band; tests/tools/state_space_model.py:126-200) ----------

def _tril_block_band(dense_np, n, d, r):
    """Dense -> BlockBandedLowerTriangular with r block subdiagonals."""
    from markovflow_tpu.block_tri_diag import BlockBandedLowerTriangular
    bands = []
    for o in range(r + 1):
        blk = np.stack([dense_np[(k + o) * d:(k + o + 1) * d,
                                 k * d:(k + 1) * d] for k in range(n - o)])
        bands.append(jnp.asarray(blk))
    return BlockBandedLowerTriangular(bands)


@pytest.mark.parametrize("n,d", [(1, 2), (4, 1), (5, 3)])
def test_product_block_band_matches_dense(rng, n, d):
    from markovflow_tpu.block_tri_diag import product_block_band
    a, dense_a = _random_spd_tridiag(rng, n, d)
    b, dense_b = _random_spd_tridiag(rng, n, d)
    la = np.tril(dense_a)
    lb = np.tril(dense_b)
    r = min(2, n - 1)

    def tril_band_np(m):
        out = np.zeros_like(m)
        for o in range(r + 1):
            for k in range(n - o):
                out[(k + o) * d:(k + o + 1) * d, k * d:(k + 1) * d] = \
                    m[(k + o) * d:(k + o + 1) * d, k * d:(k + 1) * d]
        return out

    # plain lower x lower
    got = product_block_band(_tril_block_band(la, n, d, min(1, n - 1)),
                             _tril_block_band(lb, n, d, min(1, n - 1)),
                             result_lower_blocks=r).to_dense()
    assert_allclose(np.asarray(got), tril_band_np(la @ lb), atol=1e-10)
    # transpose_left: tril(A)^T @ tril(B), band-truncated
    got = product_block_band(_tril_block_band(la, n, d, min(1, n - 1)),
                             _tril_block_band(lb, n, d, min(1, n - 1)),
                             result_lower_blocks=r,
                             transpose_left=True).to_dense()
    assert_allclose(np.asarray(got), tril_band_np(la.T @ lb), atol=1e-10)
    # symmetrise_left: full symmetric A times lower B (the SpInGP
    # precision-assembly pattern, reference tests/tools:126-141)
    got = product_block_band(a, _tril_block_band(lb, n, d, min(1, n - 1)),
                             result_lower_blocks=r,
                             symmetrise_left=True).to_dense()
    assert_allclose(np.asarray(got), tril_band_np(dense_a @ lb), atol=1e-10)


@pytest.mark.parametrize("transpose", [False, True])
@pytest.mark.parametrize("n,d", [(1, 2), (5, 2), (6, 1)])
def test_solve_triang_block_band_matches_dense(rng, n, d, transpose):
    from markovflow_tpu.block_tri_diag import solve_triang_block_band
    a, dense_a = _random_spd_tridiag(rng, n, d)
    b, dense_b = _random_spd_tridiag(rng, n, d)
    chol = a.cholesky()
    l_dense = np.asarray(chol.to_dense())
    lb = np.tril(dense_b)
    r = min(2, n - 1)
    x_full = np.linalg.solve(l_dense.T if transpose else l_dense, lb)
    got = solve_triang_block_band(
        chol, _tril_block_band(lb, n, d, min(1, n - 1)),
        result_lower_blocks=r, transpose_left=transpose).to_dense()
    want = np.zeros_like(x_full)
    for o in range(r + 1):
        for k in range(n - o):
            want[(k + o) * d:(k + o + 1) * d, k * d:(k + 1) * d] = \
                x_full[(k + o) * d:(k + o + 1) * d, k * d:(k + 1) * d]
    assert_allclose(np.asarray(got), want, atol=1e-9)


def test_solve_triang_block_band_full_width(rng):
    """result_lower_blocks = N-1 reproduces the full lower triangle — the
    chol_state_covariance pattern (reference tests/tools:158-200)."""
    from markovflow_tpu.block_tri_diag import solve_triang_block_band
    n, d = 4, 2
    a, _ = _random_spd_tridiag(rng, n, d)
    b, dense_b = _random_spd_tridiag(rng, n, d)
    chol = a.cholesky()
    lb = np.tril(dense_b)
    got = solve_triang_block_band(
        chol, _tril_block_band(lb, n, d, 1),
        result_lower_blocks=n - 1).to_dense()
    want = np.linalg.solve(np.asarray(chol.to_dense()), lb)
    assert_allclose(np.asarray(got), want, atol=1e-9)
