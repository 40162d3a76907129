"""Block-tridiagonal linear algebra.

TPU-native replacement for the reference's ``markovflow/block_tri_diag.py``
(592 LoC) + the C++ ``banded_matrices`` TF ops it wraps
(reference: markovflow/block_tri_diag.py:22-31).  Storage is *block-first*
instead of band-first: a symmetric block-tridiagonal matrix over ``N`` states
of dim ``d`` is ``(diag [..., N, d, d], lower [..., N-1, d, d])`` where
``lower[k]`` is block ``(k+1, k)``.  This keeps every op a batched small-matrix
op with the time axis on TPU lanes; the sequential recursions (Cholesky, solve,
sparse inverse) are ``lax.scan`` reference implementations — the inference
engines avoid them entirely via associative-scan formulations in
:mod:`markovflow_tpu.ops`.

Gradients: everything here is built from differentiable jnp/lax ops, so JAX
autodiff replaces the C++ library's hand-written gradients.

Engines: the sequential recursions accept ``engine="scan"`` (default:
``lax.scan``, device-agnostic, autodiff) or ``engine="native"`` — the C++
host kernels of :mod:`markovflow_tpu.native` (this build's counterpart of
the reference's C++ ``banded_matrices`` library, with hand-written VJP
kernels), dispatched via ``jax.pure_callback``.  The native engine is for
host/CPU deployments; TPU hot paths use the associative-scan/Pallas
formulations in :mod:`markovflow_tpu.ops` and never come through here.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from .utils.linalg import symmetrize, tlt

__all__ = ["SymmetricBlockTriDiagonal", "LowerTriangularBlockTriDiagonal",
           "BlockBandedLowerTriangular", "banded_to_block_tri",
           "product_block_band", "solve_triang_block_band"]


def _move_time_front(x, batch_ndim):
    """[batch..., N, d, *] -> [N, batch..., d, *] for lax.scan."""
    return jnp.moveaxis(x, batch_ndim, 0)


class _BlockTriDiagonal:
    """Common storage/shape logic (reference: block_tri_diag.py:37-289)."""

    def __init__(self, diag: jnp.ndarray, lower: Optional[jnp.ndarray] = None):
        self.diag = diag
        self.lower = lower
        if lower is not None:
            assert lower.shape[-1] == diag.shape[-1]
            assert lower.shape[-3] == diag.shape[-3] - 1

    @property
    def block_dim(self) -> int:
        return self.diag.shape[-1]

    @property
    def num_blocks(self) -> int:
        return self.diag.shape[-3]

    @property
    def batch_shape(self):
        return self.diag.shape[:-3]

    @property
    def outer_dim(self) -> int:
        return self.num_blocks * self.block_dim

    def to_dense(self) -> jnp.ndarray:
        """Materialize as [..., N*d, N*d] (for tests / tiny problems only)."""
        n, d = self.num_blocks, self.block_dim
        out = jnp.zeros(self.batch_shape + (n * d, n * d), self.diag.dtype)
        for k in range(n):
            out = out.at[..., k * d : (k + 1) * d, k * d : (k + 1) * d].set(
                self.diag[..., k, :, :]
            )
        if self.lower is not None:
            for k in range(n - 1):
                blk = self.lower[..., k, :, :]
                out = out.at[
                    ..., (k + 1) * d : (k + 2) * d, k * d : (k + 1) * d
                ].set(blk)
                if isinstance(self, SymmetricBlockTriDiagonal):
                    out = out.at[
                        ..., k * d : (k + 1) * d, (k + 1) * d : (k + 2) * d
                    ].set(tlt(blk))
        return out

    def block_mult_vector(self, vec: jnp.ndarray) -> jnp.ndarray:
        """Multiply by a block vector [..., N, d] -> [..., N, d].

        (Replaces ``product_band_mat``, reference: block_tri_diag.py:175-231.)
        """
        out = jnp.einsum("...nij,...nj->...ni", self.diag, vec)
        if self.lower is not None:
            lo = jnp.einsum("...nij,...nj->...ni", self.lower, vec[..., :-1, :])
            out = out.at[..., 1:, :].add(lo)
            if isinstance(self, SymmetricBlockTriDiagonal):
                up = jnp.einsum("...nji,...nj->...ni", self.lower, vec[..., 1:, :])
                out = out.at[..., :-1, :].add(up)
        return out

    def as_band(self) -> jnp.ndarray:
        """Lower-banded storage [..., 2d, N*d]: row ``r`` holds the ``r``-th
        subdiagonal, padded with zeros on the right (LAPACK-style; the
        layout the reference's C++ ops use — reference:
        block_tri_diag.py:91, ``block_to_band``)."""
        n, d = self.num_blocks, self.block_dim
        dense = self.to_dense()
        dim = n * d
        rows = []
        for r in range(2 * d):
            diag_r = jnp.diagonal(dense, offset=-r, axis1=-2, axis2=-1)
            pad = jnp.zeros(diag_r.shape[:-1] + (dim - diag_r.shape[-1],),
                            diag_r.dtype)
            rows.append(jnp.concatenate([diag_r, pad], axis=-1))
        return jnp.stack(rows, axis=-2)

    def dense_mult(self, right: jnp.ndarray) -> jnp.ndarray:
        """Multiply by a dense matrix [..., N*d, m] -> [..., N*d, m]
        without materializing the band (reference: block_tri_diag.py:175,
        ``product_band_mat`` with a matrix right-hand side)."""
        n, d = self.num_blocks, self.block_dim
        m = right.shape[-1]
        cols = jnp.moveaxis(
            right.reshape(right.shape[:-2] + (n, d, m)), -1, 0)  # [m,...,N,d]
        out = jax.vmap(self.block_mult_vector)(cols)
        return jnp.moveaxis(out, 0, -1).reshape(right.shape)


class LowerTriangularBlockTriDiagonal(_BlockTriDiagonal):
    """Block-bidiagonal lower-triangular matrix (e.g. a Cholesky factor).

    Reference: markovflow/block_tri_diag.py:291-382.
    """

    def solve(self, rhs: jnp.ndarray, transpose_left: bool = False,
              engine: str = "scan") -> jnp.ndarray:
        """Solve ``L x = rhs`` (or ``L^T x = rhs``) for block vector rhs [..., N, d].

        Block forward/backward substitution via ``lax.scan``
        (replaces ``solve_triang_mat``, reference: block_tri_diag.py:339-351);
        ``engine="native"`` uses the C++ host kernel instead.
        """
        if engine == "native" and self.lower is not None:
            from . import native

            return native.solve_bidiag(self.diag, self.lower, rhs,
                                       transpose_left)
        batch_ndim = rhs.ndim - 2
        diag_t = _move_time_front(self.diag, batch_ndim)
        rhs_t = _move_time_front(rhs, batch_ndim)
        solve = jax.scipy.linalg.solve_triangular

        if not transpose_left:
            if self.lower is None:
                x = solve(self.diag, rhs[..., None], lower=True)[..., 0]
                return x
            lower_t = _move_time_front(self.lower, batch_ndim)

            x0 = solve(diag_t[0], rhs_t[0][..., None], lower=True)[..., 0]

            def step(x_prev, inp):
                d_k, l_k, r_k = inp
                resid = r_k - jnp.einsum("...ij,...j->...i", l_k, x_prev)
                x_k = solve(d_k, resid[..., None], lower=True)[..., 0]
                return x_k, x_k

            _, xs = jax.lax.scan(step, x0, (diag_t[1:], lower_t, rhs_t[1:]))
            out = jnp.concatenate([x0[None], xs], axis=0)
        else:
            if self.lower is None:
                return solve(tlt(self.diag), rhs[..., None], lower=False)[..., 0]
            lower_t = _move_time_front(self.lower, batch_ndim)

            xN = solve(tlt(diag_t[-1]), rhs_t[-1][..., None], lower=False)[..., 0]

            def step_bwd(x_next, inp):
                d_k, l_k, r_k = inp
                resid = r_k - jnp.einsum("...ji,...j->...i", l_k, x_next)
                x_k = solve(tlt(d_k), resid[..., None], lower=False)[..., 0]
                return x_k, x_k

            _, xs = jax.lax.scan(
                step_bwd, xN, (diag_t[:-1], lower_t, rhs_t[:-1]), reverse=True
            )
            out = jnp.concatenate([xs, xN[None]], axis=0)
        return jnp.moveaxis(out, 0, batch_ndim)

    def abs_log_det(self) -> jnp.ndarray:
        """log |det L| = sum log |diag entries| (reference: block_tri_diag.py:353-382)."""
        diags = jnp.diagonal(self.diag, axis1=-2, axis2=-1)
        return jnp.sum(jnp.log(jnp.abs(diags)), axis=(-1, -2))

    def block_diagonal_of_inverse(self, engine: str = "scan") -> jnp.ndarray:
        """Block diagonal of (L L^T)^{-1} — the Takahashi sparse-inverse recursion.

        Replaces ``inverse_from_cholesky_band``
        (reference: block_tri_diag.py:318-338).  Returns [..., N, d, d].
        """
        diag_blocks, _ = self.sparse_inverse_band(engine=engine)
        return diag_blocks

    def sparse_inverse_band(self, engine: str = "scan"):
        """Band (diag, subdiag) of Z = (L L^T)^{-1}.

        Backward Takahashi recursion:
          Z_NN      = D_N^{-T} D_N^{-1}
          Z_{k+1,k} = -Z_{k+1,k+1} L_{k+1,k} D_k^{-1}
          Z_kk      = D_k^{-T} D_k^{-1} - Z_{k+1,k}^T L_{k+1,k} D_k^{-1}

        ``engine="native"`` runs the C++ host kernel (hand-written VJP).
        """
        if engine == "native" and self.lower is not None:
            from . import native

            return native.sparse_inverse_band(self.diag, self.lower)
        d = self.block_dim
        eye = jnp.eye(d, dtype=self.diag.dtype)
        solve = jax.scipy.linalg.solve_triangular
        d_inv = solve(self.diag, jnp.broadcast_to(eye, self.diag.shape), lower=True)
        dtd = jnp.einsum("...ji,...jk->...ik", d_inv, d_inv)  # D^{-T} D^{-1}

        if self.lower is None:
            return dtd, None

        batch_ndim = self.diag.ndim - 3
        dtd_t = _move_time_front(dtd, batch_ndim)
        lower_t = _move_time_front(self.lower, batch_ndim)
        d_inv_t = _move_time_front(d_inv, batch_ndim)

        def step(z_next, inp):
            dtd_k, l_k, dinv_k = inp
            ld = jnp.einsum("...ij,...jk->...ik", l_k, dinv_k)
            z_off = -jnp.einsum("...ij,...jk->...ik", z_next, ld)
            z_kk = dtd_k - jnp.einsum("...ji,...jk->...ik", z_off, ld)
            return symmetrize(z_kk), (z_kk, z_off)

        z_last = dtd_t[-1]
        _, (z_diags, z_offs) = jax.lax.scan(
            step, z_last, (dtd_t[:-1], lower_t, d_inv_t[:-1]), reverse=True
        )
        z_diag = jnp.concatenate([z_diags, z_last[None]], axis=0)
        return (
            jnp.moveaxis(z_diag, 0, batch_ndim),
            jnp.moveaxis(z_offs, 0, batch_ndim),
        )


class SymmetricBlockTriDiagonal(_BlockTriDiagonal):
    """Symmetric block-tridiagonal matrix (e.g. an SSM precision).

    Reference: markovflow/block_tri_diag.py:384-545.
    """

    def __add__(self, other: "SymmetricBlockTriDiagonal") -> "SymmetricBlockTriDiagonal":
        if other.lower is None:
            lower = self.lower
        elif self.lower is None:
            lower = other.lower
        else:
            lower = self.lower + other.lower
        return SymmetricBlockTriDiagonal(self.diag + other.diag, lower)

    def add_block_diagonal(self, blocks: jnp.ndarray) -> "SymmetricBlockTriDiagonal":
        return SymmetricBlockTriDiagonal(self.diag + blocks, self.lower)

    def cholesky(self, engine: str = "scan") -> LowerTriangularBlockTriDiagonal:
        """Block Cholesky L with P = L L^T, L block-bidiagonal.

        Sequential-scan reference implementation of ``cholesky_band``
        (reference: block_tri_diag.py:424-436); ``engine="native"`` runs the
        C++ host kernel (hand-written VJP).
        """
        if engine == "native" and self.lower is not None:
            from . import native

            l_diag, l_lower = native.cholesky_bidiag(self.diag, self.lower)
            return LowerTriangularBlockTriDiagonal(l_diag, l_lower)
        if self.lower is None:
            return LowerTriangularBlockTriDiagonal(jnp.linalg.cholesky(self.diag))
        batch_ndim = self.diag.ndim - 3
        diag_t = _move_time_front(self.diag, batch_ndim)
        lower_t = _move_time_front(self.lower, batch_ndim)
        solve = jax.scipy.linalg.solve_triangular

        l0 = jnp.linalg.cholesky(diag_t[0])

        def step(l_prev, inp):
            d_k, low_k = inp
            # C_k = low_k @ L_prev^{-T}
            c_k = tlt(solve(l_prev, tlt(low_k), lower=True))
            s_k = d_k - jnp.einsum("...ij,...kj->...ik", c_k, c_k)
            l_k = jnp.linalg.cholesky(symmetrize(s_k))
            return l_k, (l_k, c_k)

        _, (l_diags, c_offs) = jax.lax.scan(step, l0, (diag_t[1:], lower_t))
        l_diag = jnp.concatenate([l0[None], l_diags], axis=0)
        return LowerTriangularBlockTriDiagonal(
            jnp.moveaxis(l_diag, 0, batch_ndim), jnp.moveaxis(c_offs, 0, batch_ndim)
        )

    # --- cyclic-reduction engine (O(log N) depth, any d, any dtype) -------
    def _cr_levels(self):
        """Cyclic-reduction elimination data.

        Each level eliminates the odd-indexed blocks (whose diagonal is the
        CR pivot — block-diagonal in the reordered system, exactly the
        decomposition whose conditional statistics the reference exposes at
        conditionals.py:258-376); the Schur complement on the even-indexed
        blocks is again block-tridiagonal with half the blocks.  log2(N)
        levels, each fully vectorized over blocks — the O(log N)-depth
        engine for d > 6 / float64 where the Pallas scan kernels don't
        apply.

        Per level ``(chol_odd [n_o,d,d], bm [n_e,d,d], bp [n_e,d,d], n)``:
        ``bm[j] = block(2j, 2j-1)`` (zero at j=0), ``bp[j] = block(2j, 2j+1)``
        (zero at j=n_e-1 for odd n).  Returns (levels, final diag block).
        """
        solve = jax.scipy.linalg.solve_triangular
        eye = jnp.eye(self.block_dim, dtype=self.diag.dtype)
        diag, lower = self.diag, self.lower
        if lower is None and diag.shape[-3] > 1:
            lower = jnp.zeros(diag.shape[:-3]
                              + (diag.shape[-3] - 1,) + diag.shape[-2:],
                              diag.dtype)
        levels = []
        while diag.shape[-3] > 1:
            n = diag.shape[-3]
            n_o, n_e = n // 2, (n + 1) // 2
            d_odd = diag[..., 1::2, :, :]
            chol_odd = jnp.linalg.cholesky(symmetrize(d_odd))
            d_even = diag[..., 0::2, :, :]
            zero = jnp.zeros_like(diag[..., :1, :, :])

            def padded(x, target):
                p = target - x.shape[-3]
                if p <= 0:
                    return x[..., :target, :, :]
                return jnp.concatenate([x] + [zero] * p, axis=-3)

            bm = padded(jnp.concatenate(
                [zero, lower[..., 1::2, :, :]], axis=-3), n_e)
            bp = tlt(padded(lower[..., 0::2, :, :], n_e))
            # chol of the odd block each coupling pairs with (identity pad
            # where the coupling is zero keeps the solves well-defined)
            eye_blk = jnp.broadcast_to(
                eye, chol_odd.shape[:-3] + (1,) + eye.shape)
            chol_p = jnp.concatenate([chol_odd, eye_blk], axis=-3) \
                if n_e > n_o else chol_odd
            chol_prev = jnp.concatenate(
                [eye_blk, chol_odd], axis=-3)[..., :n_e, :, :]

            def dsolve(chol, mat):
                y = solve(chol, mat, lower=True)
                return solve(tlt(chol), y, lower=False)

            w_minus = dsolve(chol_prev, tlt(bm))   # D_{2j-1}^{-1} bm_j^T
            w_plus = dsolve(chol_p, tlt(bp))       # D_{2j+1}^{-1} bp_j^T
            new_diag = symmetrize(d_even - bm @ w_minus - bp @ w_plus)
            new_lower = None
            if n_e > 1:
                # block(2j+2, 2j+1) D^{-1} block(2j+1, 2j)
                #   = bm[j+1] @ (D_odd[j]^{-1} bp[j]^T)
                new_lower = -(bm[..., 1:, :, :] @ w_plus[..., : n_e - 1, :, :])
            levels.append((chol_odd, bm, bp, n))
            diag, lower = new_diag, new_lower
        return levels, diag[..., 0, :, :]

    def cr_solve(self, rhs: jnp.ndarray) -> jnp.ndarray:
        """Solve ``P x = rhs`` (rhs [..., N, d]) by cyclic reduction —
        O(log N) sequential depth (vs the O(N) scan of :meth:`cholesky` +
        substitution); any block dim, any dtype."""
        levels, d_final = self._cr_levels()
        solve = jax.scipy.linalg.solve_triangular

        def dsolve_vec(chol, vec):
            y = solve(chol, vec[..., None], lower=True)
            return solve(tlt(chol), y, lower=False)[..., 0]

        mv = lambda m, v: jnp.einsum("...nij,...nj->...ni", m, v)
        mtv = lambda m, v: jnp.einsum("...nji,...nj->...ni", m, v)

        rhs_stack = []
        r = rhs
        for chol_odd, bm, bp, n in levels:
            rhs_stack.append(r)
            n_o, n_e = n // 2, (n + 1) // 2
            z = dsolve_vec(chol_odd, r[..., 1::2, :])  # D_odd^{-1} r_odd
            zpad = jnp.zeros(z.shape[:-2] + (1, z.shape[-1]), z.dtype)
            z_p = jnp.concatenate([z, zpad], axis=-2)[..., :n_e, :]
            z_prev = jnp.concatenate([zpad, z], axis=-2)[..., :n_e, :]
            r = r[..., 0::2, :] - mv(bm, z_prev) - mv(bp, z_p)

        x = jnp.linalg.solve(d_final, r[..., 0, :, None])[..., 0][..., None, :]
        for (chol_odd, bm, bp, n), r_lvl in zip(reversed(levels),
                                                reversed(rhs_stack)):
            n_o, n_e = n // 2, (n + 1) // 2
            x_even = x                               # [..., n_e, d]
            r_odd = r_lvl[..., 1::2, :]
            # x_odd_j = D_odd_j^{-1} (r_odd_j - bp_j^T x_even_j
            #                                  - bm_{j+1}^T x_even_{j+1})
            left = mtv(bp[..., :n_o, :, :], x_even[..., :n_o, :])
            zpadm = jnp.zeros_like(bm[..., :1, :, :])
            bm_next = jnp.concatenate([bm, zpadm], axis=-3)[..., 1 : n_o + 1,
                                                            :, :]
            zpadx = jnp.zeros_like(x_even[..., :1, :])
            xe_next = jnp.concatenate([x_even, zpadx],
                                      axis=-2)[..., 1 : n_o + 1, :]
            x_odd = dsolve_vec(chol_odd, r_odd - left - mtv(bm_next, xe_next))
            out = jnp.zeros(x.shape[:-2] + (n, x.shape[-1]), x.dtype)
            out = out.at[..., 0::2, :].set(x_even)
            out = out.at[..., 1::2, :].set(x_odd)
            x = out
        return x

    def cr_abs_log_det(self) -> jnp.ndarray:
        """log |P| by cyclic reduction: the sum of the odd-pivot log
        determinants across levels plus the final block's."""
        levels, d_final = self._cr_levels()
        total = jnp.linalg.slogdet(d_final)[1]
        for chol_odd, _, _, _ in levels:
            diags = jnp.diagonal(chol_odd, axis1=-2, axis2=-1)
            total = total + 2.0 * jnp.sum(jnp.log(jnp.abs(diags)),
                                          axis=(-1, -2))
        return total

    def upper_diagonal_lower(self, engine: str = "scan"):
        """Factor P = U D U^T with U unit-upper-block-bidiagonal, D block-diag.

        ``engine="native"`` runs the C++ host kernel (forward only — use
        the scan engine under ``grad``).

        Backward Riccati recursion (replaces the reference's ``tf.while_loop``
        at block_tri_diag.py:438-545):
            D_N = P_NN;  D_k = P_kk - P_{k+1,k}^T D_{k+1}^{-1} P_{k+1,k}
            U_k (block (k, k+1)) = P_{k+1,k}^T D_{k+1}^{-1}
        Returns ``(u_off [..., N-1, d, d], d_chol [..., N, d, d])`` where
        ``u_off[k]`` is the off-diagonal block of U and ``d_chol`` the Cholesky
        factors of the D blocks.  For an SSM precision this recovers
        ``A_{k+1} = -U_k^T``-style transitions and ``Q_{k+1}^{-1} = D_{k+1}``.
        """
        if self.lower is None:
            return None, jnp.linalg.cholesky(self.diag)
        if engine == "native":
            from . import native

            return native.udu(self.diag, self.lower)
        batch_ndim = self.diag.ndim - 3
        diag_t = _move_time_front(self.diag, batch_ndim)
        lower_t = _move_time_front(self.lower, batch_ndim)

        d_last = diag_t[-1]

        def step(d_next, inp):
            p_kk, p_off = inp  # p_off = P_{k+1,k}
            chol_next = jnp.linalg.cholesky(symmetrize(d_next))
            # X = D_{k+1}^{-1} P_{k+1,k}
            y = jax.scipy.linalg.solve_triangular(chol_next, p_off, lower=True)
            d_k = p_kk - jnp.einsum("...ji,...jk->...ik", y, y)
            x = jax.scipy.linalg.solve_triangular(
                tlt(chol_next), y, lower=False
            )
            u_k = tlt(x)  # P_{k+1,k}^T D_{k+1}^{-1}
            return d_k, (d_k, u_k)

        _, (d_blocks, u_offs) = jax.lax.scan(
            step, d_last, (diag_t[:-1], lower_t), reverse=True
        )
        d_all = jnp.concatenate([d_blocks, d_last[None]], axis=0)
        d_chol = jnp.linalg.cholesky(symmetrize(d_all))
        return (
            jnp.moveaxis(u_offs, 0, batch_ndim),
            jnp.moveaxis(d_chol, 0, batch_ndim),
        )


def banded_to_block_tri(band: jnp.ndarray, num_blocks: int, block_dim: int,
                        symmetric: bool = True):
    """Lower-banded storage [..., 2d, N*d] -> block-tridiagonal object
    (reference: block_tri_diag.py:549, ``_banded_to_block_tri`` /
    ``band_to_block``).  Entries outside the block-tridiagonal pattern are
    ignored; for ``symmetric=True`` the band holds the lower triangle and
    the diagonal blocks are mirrored."""
    n, d = num_blocks, block_dim
    dim = n * d
    batch = band.shape[:-2]
    dense = jnp.zeros(batch + (dim, dim), band.dtype)
    ii = jnp.arange(dim)
    for r in range(2 * d):
        vals = band[..., r, : dim - r]
        dense = dense.at[..., ii[r:], ii[: dim - r]].set(vals)
    diag = jnp.stack(
        [dense[..., k * d:(k + 1) * d, k * d:(k + 1) * d]
         for k in range(n)], axis=-3)
    lower = None
    if n > 1:
        lower = jnp.stack(
            [dense[..., (k + 1) * d:(k + 2) * d, k * d:(k + 1) * d]
             for k in range(n - 1)], axis=-3)
    if symmetric:
        diag = jnp.tril(diag) + tlt(jnp.tril(diag, k=-1))
        return SymmetricBlockTriDiagonal(diag, lower)
    return LowerTriangularBlockTriDiagonal(diag, lower)


class BlockBandedLowerTriangular:
    """General lower block-banded matrix: ``bands[o]`` ([..., N-o, d, d])
    holds the ``o``-th block subdiagonal, ``bands[o][..., k, :, :]`` =
    block ``(k + o, k)``.  The result type of the banded×banded algebra
    below (the reference's general ``BandedMatrixTensor`` restricted to the
    block-aligned lower-banded case every markovflow call site uses).
    """

    def __init__(self, bands: Sequence[jnp.ndarray]):
        assert len(bands) >= 1
        n, d = bands[0].shape[-3], bands[0].shape[-1]
        for o, b in enumerate(bands):
            assert b.shape[-3] == n - o and b.shape[-2:] == (d, d), (
                f"band {o}: {b.shape} incompatible with N={n}, d={d}")
        self.bands = list(bands)

    @property
    def num_blocks(self) -> int:
        return self.bands[0].shape[-3]

    @property
    def block_dim(self) -> int:
        return self.bands[0].shape[-1]

    @property
    def lower_block_bandwidth(self) -> int:
        return len(self.bands) - 1

    def row_aligned(self) -> jnp.ndarray:
        """[..., N, r+1, d, d] with ``[..., i, o]`` = block ``(i, i - o)``
        (zero where ``i < o``) — the scan-friendly layout."""
        n = self.num_blocks
        rows = []
        for o, b in enumerate(self.bands):
            pad = jnp.zeros(b.shape[:-3] + (o,) + b.shape[-2:], b.dtype)
            rows.append(jnp.concatenate([pad, b], axis=-3))
        return jnp.stack(rows, axis=-3)

    def to_dense(self) -> jnp.ndarray:
        n, d = self.num_blocks, self.block_dim
        batch = self.bands[0].shape[:-3]
        out = jnp.zeros(batch + (n * d, n * d), self.bands[0].dtype)
        for o, b in enumerate(self.bands):
            for k in range(n - o):
                out = out.at[..., (k + o) * d:(k + o + 1) * d,
                             k * d:(k + 1) * d].set(b[..., k, :, :])
        return out


def _as_block_banded(m) -> BlockBandedLowerTriangular:
    if isinstance(m, BlockBandedLowerTriangular):
        return m
    n = m.num_blocks
    bands = [m.diag]
    if m.lower is not None:
        bands.append(m.lower)
    elif n > 1:
        bands.append(jnp.zeros(m.diag.shape[:-3] + (n - 1,)
                               + m.diag.shape[-2:], m.diag.dtype))
    return BlockBandedLowerTriangular(bands)


def product_block_band(left, right, result_lower_blocks: int,
                       transpose_left: bool = False,
                       symmetrise_left: bool = False
                       ) -> BlockBandedLowerTriangular:
    """Banded × banded product with a band-truncated result — the block
    equivalent of the C++ ``product_band_band``
    (reference: tests/tools/state_space_model.py:126-155, banded_matrices).

    ``left``/``right`` are :class:`BlockBandedLowerTriangular` (or the two
    block-tridiagonal classes above, auto-converted to their lower bands).
    With ``symmetrise_left`` the left operand is treated as symmetric
    (its strict upper triangle mirrored from the stored lower bands); with
    ``transpose_left`` it enters as ``leftᵀ``.  Only block subdiagonals
    ``0..result_lower_blocks`` of the product are formed — entries outside
    are dropped exactly as the reference op does.  Pure block convolution
    (one einsum per (o_l, o_r) pair): fully parallel over the time axis.
    """
    lb = _as_block_banded(left)
    rb = _as_block_banded(right)
    assert not (transpose_left and symmetrise_left)
    n, d = lb.num_blocks, lb.block_dim
    assert rb.num_blocks == n and rb.block_dim == d
    batch = jnp.broadcast_shapes(lb.bands[0].shape[:-3],
                                 rb.bands[0].shape[:-3])
    dtype = jnp.result_type(lb.bands[0].dtype, rb.bands[0].dtype)

    # left blocks as (offset -> band array), offset may be negative
    # (superdiagonal) under transpose/symmetrise; left_off[s][k] = block
    # (k + s, k) for s >= 0, and block (k, k - s) = stored[k]ᵀ for s < 0.
    left_off = {}
    for o, b in enumerate(lb.bands):
        if transpose_left:
            left_off[-o] = tlt(b)
        else:
            left_off[o] = b
            if symmetrise_left and o > 0:
                left_off[-o] = tlt(b)

    out = [jnp.zeros(batch + (n - o, d, d), dtype)
           for o in range(result_lower_blocks + 1)]
    for s, a in left_off.items():           # result(i, j) += L(i, k) R(k, j)
        for o_r, r in enumerate(rb.bands):  # k = i - s, o_r = k - j
            o = s + o_r                     # result offset i - j
            if o < 0 or o > result_lower_blocks:
                continue
            # valid rows i: L(i, i-s) needs i-s in [0, n-1-max(0,s)] and
            # R(i-s, i-o) needs i-o in [0, n-1-o_r]
            i0 = max(o, s, 0)
            i1 = n + min(0, s)
            if i1 <= i0:
                continue
            # L(i, i-s): s >= 0 bands are column-indexed (a[k]=block(k+s,k),
            # k = i-s); s < 0 (transposed) bands are row-indexed (a[i] =
            # block(i, i-s))
            ai = (a[..., i0 - s:i1 - s, :, :] if s >= 0
                  else a[..., i0:i1, :, :])
            # R(i-s, i-o): band o_r column-indexed by j = i-o
            rj = r[..., i0 - o:i1 - o, :, :]
            prod = jnp.einsum("...nij,...njk->...nik", ai, rj)
            out[o] = out[o].at[..., i0 - o:i1 - o, :, :].add(prod)
    return BlockBandedLowerTriangular(out)


def solve_triang_block_band(chol: LowerTriangularBlockTriDiagonal, right,
                            result_lower_blocks: int,
                            transpose_left: bool = False
                            ) -> BlockBandedLowerTriangular:
    """``L⁻¹ B`` (or ``L⁻ᵀ B``) restricted to a block band — the block
    equivalent of the C++ ``solve_triang_band``
    (reference: ssm_gaussian_transformations.py:473-481,
    tests/tools/state_space_model.py:194-200).

    ``chol`` is lower block-bidiagonal, ``B`` lower block-banded.  The
    returned subdiagonal blocks ``0..result_lower_blocks`` are *exact*:

    * ``transpose_left=False``: ``X = L⁻¹B`` is lower-triangular; row
      recursion ``Xᵢ. = Dᵢ⁻¹(Bᵢ. − Lᵢ,ᵢ₋₁ Xᵢ₋₁.)`` touches only offsets
      ``o-1`` of the previous row, so a width-(r+1) window is closed.
    * ``transpose_left=True``: ``X = L⁻ᵀB`` vanishes below block offset
      ``q`` = B's bandwidth (upper-triangular ``L⁻ᵀ`` × lower-banded
      ``B``), so the backward recursion over a width-(max(r,q)+1) window
      is closed — the ``o = q`` element's ``o+1`` neighbour is exactly
      zero.  Requested offsets beyond ``q`` return zero blocks.

    Sequential ``lax.scan`` over rows (this is the API-parity path, like
    the C++ op it replaces; the inference engines never call it on hot
    paths — they use the associative-scan/Pallas formulations).
    """
    rb = _as_block_banded(right)
    n, d = rb.num_blocks, rb.block_dim
    r = result_lower_blocks
    q = rb.lower_block_bandwidth
    solve = jax.scipy.linalg.solve_triangular

    if transpose_left:
        # window width: max(r, q) + 1 so the recursion is closed; truncate
        # to r+1 at the end.
        w = max(r, q)
    else:
        w = r
    # row-aligned B padded to window width w
    brow = rb.row_aligned()  # [..., N, q+1, d, d]
    if w > q:
        pad = jnp.zeros(brow.shape[:-3] + (w - q,) + brow.shape[-2:],
                        brow.dtype)
        brow = jnp.concatenate([brow, pad], axis=-3)
    else:
        brow = brow[..., : w + 1, :, :]

    batch_ndim = brow.ndim - 4
    brow_t = jnp.moveaxis(brow, batch_ndim, 0)          # [N, ..., w+1, d, d]
    diag_t = _move_time_front(chol.diag, batch_ndim)    # [N, ..., d, d]
    if chol.lower is None:
        low = jnp.zeros(chol.diag.shape[:-3] + (n - 1,) + chol.diag.shape[-2:],
                        chol.diag.dtype)
    else:
        low = chol.lower
    low_t = _move_time_front(low, batch_ndim)           # [N-1, ..., d, d]
    zrow = jnp.zeros_like(brow_t[0])

    if not transpose_left:
        def step(w_prev, inp):
            d_k, l_k, b_k = inp
            # shift offsets: X_{i-1, i-o} is the previous row's offset o-1
            shifted = jnp.concatenate(
                [jnp.zeros_like(w_prev[..., :1, :, :]),
                 w_prev[..., :-1, :, :]], axis=-3)
            resid = b_k - jnp.einsum("...ij,...njk->...nik",
                                     l_k, shifted)
            x_k = solve(jnp.broadcast_to(d_k[..., None, :, :], resid.shape),
                        resid, lower=True)
            return x_k, x_k

        x0 = solve(jnp.broadcast_to(diag_t[0][..., None, :, :],
                                    brow_t[0].shape),
                   brow_t[0], lower=True)
        _, xs = jax.lax.scan(
            step, x0,
            (diag_t[1:], low_t, brow_t[1:]))
        rows = jnp.concatenate([x0[None], xs], axis=0)
    else:
        def step_bwd(w_next, inp):
            d_k, l_k, b_k = inp  # l_k = L_{k+1,k} (zero for the last row)
            # X_{i+1, i-o} is the next row's offset o+1; offset w+1 ≡ 0
            shifted = jnp.concatenate(
                [w_next[..., 1:, :, :],
                 jnp.zeros_like(w_next[..., :1, :, :])], axis=-3)
            resid = b_k - jnp.einsum("...ji,...njk->...nik", l_k, shifted)
            x_k = solve(jnp.broadcast_to(tlt(d_k)[..., None, :, :],
                                         resid.shape), resid, lower=False)
            return x_k, x_k

        low_ext = jnp.concatenate(
            [low_t, jnp.zeros((1,) + diag_t.shape[1:], diag_t.dtype)], axis=0)
        _, rows = jax.lax.scan(
            step_bwd, zrow, (diag_t, low_ext, brow_t), reverse=True)

    rows = jnp.moveaxis(rows, 0, batch_ndim)  # [..., N, w+1, d, d]
    bands = []
    for o in range(r + 1):
        if o <= w:
            bands.append(rows[..., o:, o, :, :])
        else:  # beyond the closure width: exactly zero
            bands.append(jnp.zeros(rows.shape[:-4] + (n - o, d, d),
                                   rows.dtype))
    return BlockBandedLowerTriangular(bands)
