// Native host kernels for block-tridiagonal linear algebra.
//
// C++ counterpart of the reference's `banded_matrices` TF op library
// (reference: markovflow/block_tri_diag.py:22-31 imports; the ops live in
// secondmind-labs/banded_matrices) — forward kernels AND hand-written
// gradient (VJP) kernels, like the C++ library the reference wraps.
//
// Storage is the block-first layout of markovflow_tpu.block_tri_diag:
//   diag  [nb, d, d]   block (k, k)
//   lower [nb-1, d, d] block (k+1, k)
// all row-major contiguous.  Every routine is sequential in the block index
// (these are the O(N)-depth recursions; the TPU inference engines use
// associative scans instead — this library serves the CPU/host path, where
// a tight C++ loop beats an XLA:CPU `lax.scan` by avoiding per-step
// dispatch and tiny-GEMM overhead).
//
// Math conventions match markovflow_tpu/block_tri_diag.py exactly,
// including the `symmetrize` calls in the Cholesky recursion, so the VJP
// kernels agree with JAX autodiff through the scan implementation to
// roundoff (asserted in tests/unit/test_native_banded.py).
//
// Build: g++ -O3 -shared -fPIC banded.cc -o libmfbanded.so   (see build.py)

#include <cmath>
#include <cstring>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// small dense helpers (d x d blocks, row-major), templated on real type
// ---------------------------------------------------------------------------

// lower Cholesky of symmetric A (reads lower triangle only); returns false
// on a non-positive pivot.  L strictly-upper entries are zeroed.
template <typename T>
bool chol_d(long d, const T* A, T* L) {
  for (long i = 0; i < d; ++i) {
    for (long j = 0; j <= i; ++j) {
      T s = A[i * d + j];
      for (long k = 0; k < j; ++k) s -= L[i * d + k] * L[j * d + k];
      if (i == j) {
        if (!(s > T(0))) return false;
        L[i * d + i] = std::sqrt(s);
      } else {
        L[i * d + j] = s / L[j * d + j];
      }
    }
    for (long j = i + 1; j < d; ++j) L[i * d + j] = T(0);
  }
  return true;
}

// X <- L^{-1} B for lower-triangular L [d,d], B [d,m] (forward substitution)
template <typename T>
void trsm_lower(long d, long m, const T* L, const T* B, T* X) {
  for (long c = 0; c < m; ++c) {
    for (long i = 0; i < d; ++i) {
      T s = B[i * m + c];
      for (long k = 0; k < i; ++k) s -= L[i * d + k] * X[k * m + c];
      X[i * m + c] = s / L[i * d + i];
    }
  }
}

// X <- L^{-T} B for lower-triangular L [d,d], B [d,m] (back substitution)
template <typename T>
void trsm_lower_t(long d, long m, const T* L, const T* B, T* X) {
  for (long c = 0; c < m; ++c) {
    for (long i = d - 1; i >= 0; --i) {
      T s = B[i * m + c];
      for (long k = i + 1; k < d; ++k) s -= L[k * d + i] * X[k * m + c];
      X[i * m + c] = s / L[i * d + i];
    }
  }
}

// C <- alpha * op(A) op(B) + beta * C, with op in {identity, transpose}
template <typename T>
void gemm(long d, bool ta, bool tb, T alpha, const T* A, const T* B, T beta,
          T* C) {
  for (long i = 0; i < d; ++i)
    for (long j = 0; j < d; ++j) {
      T s = T(0);
      for (long k = 0; k < d; ++k) {
        T a = ta ? A[k * d + i] : A[i * d + k];
        T b = tb ? B[j * d + k] : B[k * d + j];
        s += a * b;
      }
      // BLAS beta==0 semantics: never read C (it may be uninitialized)
      C[i * d + j] = alpha * s + (beta == T(0) ? T(0) : beta * C[i * d + j]);
    }
}

// y <- A^{(T)} x for block A [d,d], vectors [d]
template <typename T>
void gemv(long d, bool ta, const T* A, const T* x, T* y) {
  for (long i = 0; i < d; ++i) {
    T s = T(0);
    for (long k = 0; k < d; ++k) s += (ta ? A[k * d + i] : A[i * d + k]) * x[k];
    y[i] = s;
  }
}

template <typename T>
void transpose_d(long d, const T* A, T* At) {
  for (long i = 0; i < d; ++i)
    for (long j = 0; j < d; ++j) At[i * d + j] = A[j * d + i];
}

// VJP of L = chol(A) (A symmetric, only lower triangle read): given
// cotangent Lb (may be full; strictly-upper part ignored by masking), write
// Ab (lower-triangle cotangent wrt the *lower triangle read* of A; the
// caller handles any upstream symmetrize).  Standard blocked-reverse
// algorithm, level-2 (Murray 2016, "Differentiation of the Cholesky
// decomposition"), in-place on a copy of Lb.
template <typename T>
void chol_vjp_d(long d, const T* L, const T* Lb_in, T* Ab) {
  std::vector<T> Lb(d * d);
  // mask to lower triangle (chol output upper is structurally zero)
  for (long i = 0; i < d; ++i)
    for (long j = 0; j < d; ++j)
      Lb[i * d + j] = (j <= i) ? Lb_in[i * d + j] : T(0);
  // reverse of the unblocked Cholesky loop
  for (long j = d - 1; j >= 0; --j) {
    // column j of L below diagonal: L[i][j], i > j
    // reverse: L[i][j] = s / L[j][j]
    for (long i = d - 1; i > j; --i) {
      T lb = Lb[i * d + j];
      // s = A[i][j] - sum_k L[i][k] L[j][k]
      // L[i][j] = s / L[j][j]
      Ab[i * d + j] = lb / L[j * d + j];
      Lb[j * d + j] -= lb * L[i * d + j] / L[j * d + j];
      for (long k = 0; k < j; ++k) {
        Lb[i * d + k] -= Ab[i * d + j] * L[j * d + k];
        Lb[j * d + k] -= Ab[i * d + j] * L[i * d + k];
      }
    }
    // diagonal: L[j][j] = sqrt(s)
    T lb = Lb[j * d + j];
    T ab = lb / (T(2) * L[j * d + j]);
    Ab[j * d + j] = ab;
    for (long k = 0; k < j; ++k) Lb[j * d + k] -= T(2) * ab * L[j * d + k];
    // zero strictly upper of Ab row j
    for (long k = j + 1; k < d; ++k) Ab[j * d + k] = T(0);
  }
}

// ---------------------------------------------------------------------------
// forward kernels
// ---------------------------------------------------------------------------

// Block-bidiagonal Cholesky of a symmetric block-tridiagonal matrix.
//   L_0 = chol(diag_0)
//   C_k = low_k L_{k-1}^{-T}            (stored in l_lower[k-1])
//   S_k = sym(diag_k - C_k C_k^T)
//   L_k = chol(S_k)
// Mirrors SymmetricBlockTriDiagonal.cholesky (block_tri_diag.py:248-275),
// including the symmetrize on S_k (block 0 is used as-is, like the scan).
template <typename T>
long cholesky_bidiag(long nb, long d, const T* diag, const T* lower,
                     T* l_diag, T* l_lower) {
  const long dd = d * d;
  if (!chol_d(d, diag, l_diag)) return 1;
  std::vector<T> tmp(dd), s(dd);
  for (long k = 1; k < nb; ++k) {
    const T* lowk = lower + (k - 1) * dd;
    T* ck = l_lower + (k - 1) * dd;
    // C_k^T = L_{k-1}^{-1} low_k^T  ->  solve then transpose
    std::vector<T> lowt(dd);
    transpose_d(d, lowk, lowt.data());
    trsm_lower(d, d, l_diag + (k - 1) * dd, lowt.data(), tmp.data());
    transpose_d(d, tmp.data(), ck);
    // S_k = diag_k - C_k C_k^T, then symmetrize
    std::memcpy(s.data(), diag + k * dd, sizeof(T) * dd);
    gemm(d, false, true, T(-1), ck, ck, T(1), s.data());
    for (long i = 0; i < d; ++i)
      for (long j = 0; j < i; ++j) {
        T v = (s[i * d + j] + s[j * d + i]) / T(2);
        s[i * d + j] = v;
        s[j * d + i] = v;
      }
    if (!chol_d(d, s.data(), l_diag + k * dd)) return k + 1;
  }
  return 0;
}

// VJP of cholesky_bidiag: inputs are the outputs (l_diag, l_lower) and
// their cotangents; writes cotangents wrt (diag, lower).  The `symmetrize`
// inside the forward makes the S_k cotangent symmetric:
//   Sb_k = sym_adj(chol_vjp(L_k, Lb_k))   with sym_adj(G) = (G + G^T)/2
//   diag_b_k = Sb_k
//   Cb_k += -(Sb_k + Sb_k^T) C_k = -2 Sb_k C_k   (Sb_k symmetric)
//   from C_k = low_k L_{k-1}^{-T}:
//     low_b_k  = Cb_k L_{k-1}^{-1}
//     Lb_{k-1} += -low_b_k^T C_k  (lower-masked)
// Block 0 has no symmetrize (matches the scan code): diag_b_0 is the raw
// lower-triangular chol cotangent.
template <typename T>
long cholesky_bidiag_vjp(long nb, long d, const T* l_diag, const T* l_lower,
                         const T* ct_ldiag, const T* ct_llower, T* ct_diag,
                         T* ct_lower) {
  const long dd = d * d;
  std::vector<T> lb(dd), sb(dd), cb(dd), tmp(dd), tmp2(dd);
  // running cotangent on L_k (accumulates the contribution from step k+1)
  std::vector<T> lb_carry(dd, T(0));
  for (long k = nb - 1; k >= 1; --k) {
    const T* Lk = l_diag + k * dd;
    const T* Ck = l_lower + (k - 1) * dd;
    const T* Lprev = l_diag + (k - 1) * dd;
    // total cotangent on L_k
    for (long i = 0; i < dd; ++i) lb[i] = ct_ldiag[k * dd + i] + lb_carry[i];
    chol_vjp_d(d, Lk, lb.data(), sb.data());
    // symmetrize-adjoint: Sb <- (Sb + Sb^T)/2
    for (long i = 0; i < d; ++i)
      for (long j = 0; j < i; ++j) {
        T v = (sb[i * d + j] + sb[j * d + i]) / T(2);
        sb[i * d + j] = v;
        sb[j * d + i] = v;
      }
    std::memcpy(ct_diag + k * dd, sb.data(), sizeof(T) * dd);
    // Cb = ct_llower[k-1] - 2 Sb C_k
    std::memcpy(cb.data(), ct_llower + (k - 1) * dd, sizeof(T) * dd);
    gemm(d, false, false, T(-2), sb.data(), Ck, T(1), cb.data());
    // low_b_k = Cb L_{k-1}^{-1}  ->  (L_{k-1}^{-T} Cb^T)^T
    transpose_d(d, cb.data(), tmp.data());
    trsm_lower_t(d, d, Lprev, tmp.data(), tmp2.data());
    transpose_d(d, tmp2.data(), ct_lower + (k - 1) * dd);
    // Lb_{k-1} carry = -low_b_k^T C_k, lower-masked
    gemm(d, true, false, T(-1), ct_lower + (k - 1) * dd, Ck, T(0),
         lb_carry.data());
    for (long i = 0; i < d; ++i)
      for (long j = i + 1; j < d; ++j) lb_carry[i * d + j] = T(0);
  }
  // block 0: no symmetrize in the forward
  for (long i = 0; i < dd; ++i) lb[i] = ct_ldiag[i] + lb_carry[i];
  chol_vjp_d(d, l_diag, lb.data(), ct_diag);
  return 0;
}

// Solve L x = rhs (transpose=0) or L^T x = rhs (transpose=1) for block
// vector rhs [nb, d, m].  Mirrors LowerTriangularBlockTriDiagonal.solve
// (block_tri_diag.py:130-174).
template <typename T>
long solve_bidiag(long nb, long d, long m, int transpose, const T* l_diag,
                  const T* l_lower, const T* rhs, T* out) {
  const long dd = d * d, dm = d * m;
  std::vector<T> resid(dm);
  if (!transpose) {
    trsm_lower(d, m, l_diag, rhs, out);
    for (long k = 1; k < nb; ++k) {
      std::memcpy(resid.data(), rhs + k * dm, sizeof(T) * dm);
      // resid -= L_{k,k-1} x_{k-1}
      const T* lk = l_lower + (k - 1) * dd;
      for (long i = 0; i < d; ++i)
        for (long c = 0; c < m; ++c) {
          T s = resid[i * m + c];
          for (long j = 0; j < d; ++j)
            s -= lk[i * d + j] * out[(k - 1) * dm + j * m + c];
          resid[i * m + c] = s;
        }
      trsm_lower(d, m, l_diag + k * dd, resid.data(), out + k * dm);
    }
  } else {
    trsm_lower_t(d, m, l_diag + (nb - 1) * dd, rhs + (nb - 1) * dm,
                 out + (nb - 1) * dm);
    for (long k = nb - 2; k >= 0; --k) {
      std::memcpy(resid.data(), rhs + k * dm, sizeof(T) * dm);
      // resid -= L_{k+1,k}^T x_{k+1}
      const T* lk = l_lower + k * dd;
      for (long i = 0; i < d; ++i)
        for (long c = 0; c < m; ++c) {
          T s = resid[i * m + c];
          for (long j = 0; j < d; ++j)
            s -= lk[j * d + i] * out[(k + 1) * dm + j * m + c];
          resid[i * m + c] = s;
        }
      trsm_lower_t(d, m, l_diag + k * dd, resid.data(), out + k * dm);
    }
  }
  return 0;
}

// Band (diag, subdiag) of Z = (L L^T)^{-1} — Takahashi backward recursion.
// Mirrors LowerTriangularBlockTriDiagonal.sparse_inverse_band
// (block_tri_diag.py:190-227), including the symmetrize on Z_kk carries.
//   Dinv_k = L_k^{-1};  DtD_k = Dinv_k^T Dinv_k
//   Z_{nb-1} = DtD_{nb-1}
//   LD_k   = L_{k+1,k} Dinv_k
//   Zoff_k = -Z_{k+1} LD_k                      (block (k+1, k))
//   Z_k    = sym(DtD_k - Zoff_k^T LD_k)
template <typename T>
long sparse_inverse_band(long nb, long d, const T* l_diag, const T* l_lower,
                         T* z_diag, T* z_off) {
  const long dd = d * d;
  std::vector<T> dinv(nb * dd), eye(dd, T(0)), ld(dd), carry(dd);
  for (long i = 0; i < d; ++i) eye[i * d + i] = T(1);
  for (long k = 0; k < nb; ++k)
    trsm_lower(d, d, l_diag + k * dd, eye.data(), dinv.data() + k * dd);
  // Z_{nb-1} = Dinv^T Dinv
  gemm(d, true, false, T(1), dinv.data() + (nb - 1) * dd,
       dinv.data() + (nb - 1) * dd, T(0), z_diag + (nb - 1) * dd);
  std::memcpy(carry.data(), z_diag + (nb - 1) * dd, sizeof(T) * dd);
  for (long k = nb - 2; k >= 0; --k) {
    gemm(d, false, false, T(1), l_lower + k * dd, dinv.data() + k * dd, T(0),
         ld.data());
    // Zoff_k = -carry @ ld
    gemm(d, false, false, T(-1), carry.data(), ld.data(), T(0), z_off + k * dd);
    // Z_k = DtD_k - Zoff_k^T ld
    gemm(d, true, false, T(1), dinv.data() + k * dd, dinv.data() + k * dd,
         T(0), z_diag + k * dd);
    gemm(d, true, false, T(-1), z_off + k * dd, ld.data(), T(1),
         z_diag + k * dd);
    // carry = sym(Z_k) — the scan symmetrizes the carry, not the output
    for (long i = 0; i < d; ++i)
      for (long j = 0; j < d; ++j)
        carry[i * d + j] =
            (z_diag[k * dd + i * d + j] + z_diag[k * dd + j * d + i]) / T(2);
  }
  return 0;
}

// VJP of sparse_inverse_band: exact reverse-mode sweep of the Takahashi
// recursion above (the reference's C++ library ships this gradient for
// `inverse_from_cholesky_band`).  Forward executes k = nb-2 .. 0, so the
// reverse sweep runs k = 0 .. nb-2, accumulating the carry cotangent
// upward; per-op adjoints:
//   carry_k = sym(zdiag_k)        ->  zdiag_b += (carry_b + carry_b^T)/2
//   zdiag_k = dtd_k - zoff_k^T ld ->  dtd_b += zdiag_b;
//                                     zoff_b += -ld zdiag_b^T;
//                                     ld_b   += -zoff_k zdiag_b
//   zoff_k  = -carry_{k+1} ld     ->  carry_b_{k+1} += -zoff_b ld^T;
//                                     ld_b += -carry_{k+1}^T zoff_b
//   ld      = lower_k dinv_k      ->  lower_b += ld_b dinv_k^T;
//                                     dinv_b  += lower_k^T ld_b
//   dtd_k   = dinv_k^T dinv_k     ->  dinv_b  += dinv_k (dtd_b + dtd_b^T)
//   dinv_k  = L_k^{-1}            ->  L_b += -dinv^T dinv_b dinv^T (tril)
template <typename T>
long sparse_inverse_band_vjp(long nb, long d, const T* l_diag,
                             const T* l_lower, const T* ct_zdiag,
                             const T* ct_zoff, T* ct_ldiag, T* ct_llower) {
  const long dd = d * d;
  std::vector<T> dinv(nb * dd), eye(dd, T(0));
  std::vector<T> carry(nb * dd);  // forward carries: carry[k] used at step k-1
  std::vector<T> ld(dd), tmp(dd), tmp2(dd);
  std::vector<T> dinv_b(nb * dd, T(0)), carry_b(nb * dd, T(0));
  for (long i = 0; i < d; ++i) eye[i * d + i] = T(1);
  for (long k = 0; k < nb; ++k)
    trsm_lower(d, d, l_diag + k * dd, eye.data(), dinv.data() + k * dd);
  // re-run the forward to recover the carries (cheap, O(nb d^3))
  // carry[nb-1] = dtd_{nb-1} (unsymmetrized init, matching the scan)
  gemm(d, true, false, T(1), dinv.data() + (nb - 1) * dd,
       dinv.data() + (nb - 1) * dd, T(0), carry.data() + (nb - 1) * dd);
  std::vector<T> zoff_k(dd), zdiag_k(dd);
  std::vector<T> zdiag_all((nb > 1 ? nb - 1 : 0) * dd),
      zoff_all((nb > 1 ? nb - 1 : 0) * dd);
  for (long k = nb - 2; k >= 0; --k) {
    gemm(d, false, false, T(1), l_lower + k * dd, dinv.data() + k * dd, T(0),
         ld.data());
    gemm(d, false, false, T(-1), carry.data() + (k + 1) * dd, ld.data(), T(0),
         zoff_all.data() + k * dd);
    gemm(d, true, false, T(1), dinv.data() + k * dd, dinv.data() + k * dd,
         T(0), zdiag_all.data() + k * dd);
    gemm(d, true, false, T(-1), zoff_all.data() + k * dd, ld.data(), T(1),
         zdiag_all.data() + k * dd);
    for (long i = 0; i < d; ++i)
      for (long j = 0; j < d; ++j)
        carry[k * dd + i * d + j] = (zdiag_all[k * dd + i * d + j] +
                                     zdiag_all[k * dd + j * d + i]) /
                                    T(2);
  }
  // reverse sweep
  std::vector<T> zdb(dd), zob(dd), ldb(dd), dtdb(dd);
  for (long k = 0; k <= nb - 2; ++k) {
    gemm(d, false, false, T(1), l_lower + k * dd, dinv.data() + k * dd, T(0),
         ld.data());
    // total zdiag_b at k: output cotangent + sym-adjoint of carry_b[k]
    for (long i = 0; i < d; ++i)
      for (long j = 0; j < d; ++j)
        zdb[i * d + j] = ct_zdiag[k * dd + i * d + j] +
                         (carry_b[k * dd + i * d + j] +
                          carry_b[k * dd + j * d + i]) /
                             T(2);
    // dtd_b = zdb (only consumer)
    // zoff_b total = output cotangent + (-ld zdb^T)
    std::memcpy(zob.data(), ct_zoff + k * dd, sizeof(T) * dd);
    gemm(d, false, true, T(-1), ld.data(), zdb.data(), T(1), zob.data());
    // ld_b = -zoff_k zdb - carry_{k+1}^T zob
    gemm(d, false, false, T(-1), zoff_all.data() + k * dd, zdb.data(), T(0),
         ldb.data());
    gemm(d, true, false, T(-1), carry.data() + (k + 1) * dd, zob.data(), T(1),
         ldb.data());
    // carry_b[k+1] += -zob ld^T
    gemm(d, false, true, T(-1), zob.data(), ld.data(), T(0), tmp.data());
    for (long i = 0; i < dd; ++i) carry_b[(k + 1) * dd + i] += tmp[i];
    // lower_b[k] = ldb dinv^T ; dinv_b[k] += lower^T ldb
    gemm(d, false, true, T(1), ldb.data(), dinv.data() + k * dd, T(0),
         ct_llower + k * dd);
    gemm(d, true, false, T(1), l_lower + k * dd, ldb.data(), T(0), tmp.data());
    for (long i = 0; i < dd; ++i) dinv_b[k * dd + i] += tmp[i];
    // dinv_b[k] += dinv (dtd_b + dtd_b^T) with dtd_b = zdb
    for (long i = 0; i < d; ++i)
      for (long j = 0; j < d; ++j)
        tmp[i * d + j] = zdb[i * d + j] + zdb[j * d + i];
    gemm(d, false, false, T(1), dinv.data() + k * dd, tmp.data(), T(0),
         tmp2.data());
    for (long i = 0; i < dd; ++i) dinv_b[k * dd + i] += tmp2[i];
  }
  // final block: zdiag_{nb-1} = dtd = dinv^T dinv, plus unsymmetrized carry
  {
    const long k = nb - 1;
    for (long i = 0; i < dd; ++i)
      tmp[i] = ct_zdiag[k * dd + i] + carry_b[k * dd + i];
    for (long i = 0; i < d; ++i)
      for (long j = 0; j < d; ++j)
        tmp2[i * d + j] = tmp[i * d + j] + tmp[j * d + i];
    gemm(d, false, false, T(1), dinv.data() + k * dd, tmp2.data(), T(0),
         tmp.data());
    for (long i = 0; i < dd; ++i) dinv_b[k * dd + i] += tmp[i];
  }
  // L_b[k] = -dinv^T dinv_b dinv^T, tril-masked
  for (long k = 0; k < nb; ++k) {
    gemm(d, true, false, T(1), dinv.data() + k * dd, dinv_b.data() + k * dd,
         T(0), tmp.data());
    gemm(d, false, true, T(-1), tmp.data(), dinv.data() + k * dd, T(0),
         tmp2.data());
    for (long i = 0; i < d; ++i)
      for (long j = 0; j < d; ++j)
        ct_ldiag[k * dd + i * d + j] = (j <= i) ? tmp2[i * d + j] : T(0);
  }
  return 0;
}

// UDU^T factorization of a symmetric block-tridiagonal P: backward Riccati.
// Mirrors SymmetricBlockTriDiagonal.upper_diagonal_lower
// (block_tri_diag.py:402-442).
//   D_{nb-1} = P_{nb-1,nb-1}
//   cholnext = chol(sym(D_{k+1}))
//   Y = cholnext^{-1} P_{k+1,k}
//   D_k = P_kk - Y^T Y
//   U_k = (cholnext^{-T} Y)^T            (block (k, k+1) of U)
// outputs: u_off [nb-1, d, d], d_chol [nb, d, d] = chol(sym(D_k)).
template <typename T>
long udu(long nb, long d, const T* diag, const T* lower, T* u_off,
         T* d_chol) {
  const long dd = d * d;
  std::vector<T> dnext(dd), csym(dd), cn(dd), y(dd), x(dd), dk(dd);
  std::memcpy(dnext.data(), diag + (nb - 1) * dd, sizeof(T) * dd);
  for (long k = nb - 2; k >= 0; --k) {
    for (long i = 0; i < d; ++i)
      for (long j = 0; j < d; ++j)
        csym[i * d + j] = (dnext[i * d + j] + dnext[j * d + i]) / T(2);
    if (!chol_d(d, csym.data(), cn.data())) return k + 2;
    trsm_lower(d, d, cn.data(), lower + k * dd, y.data());
    std::memcpy(dk.data(), diag + k * dd, sizeof(T) * dd);
    gemm(d, true, false, T(-1), y.data(), y.data(), T(1), dk.data());
    trsm_lower_t(d, d, cn.data(), y.data(), x.data());
    transpose_d(d, x.data(), u_off + k * dd);
    std::memcpy(dnext.data(), dk.data(), sizeof(T) * dd);
    // store D_k for the final cholesky sweep below (reuse d_chol as scratch)
    std::memcpy(d_chol + k * dd, dk.data(), sizeof(T) * dd);
  }
  std::memcpy(d_chol + (nb - 1) * dd, diag + (nb - 1) * dd, sizeof(T) * dd);
  // chol(sym(D_k)) for every block
  std::vector<T> s(dd), l(dd);
  for (long k = 0; k < nb; ++k) {
    for (long i = 0; i < d; ++i)
      for (long j = 0; j < d; ++j)
        s[i * d + j] =
            (d_chol[k * dd + i * d + j] + d_chol[k * dd + j * d + i]) / T(2);
    if (!chol_d(d, s.data(), l.data())) return k + 2;
    std::memcpy(d_chol + k * dd, l.data(), sizeof(T) * dd);
  }
  return 0;
}

}  // namespace

// ---------------------------------------------------------------------------
// C ABI (f64 + f32), batched: leading `batch` independent problems
// ---------------------------------------------------------------------------

extern "C" {

#define MF_BATCHED(NAME, CALL_STMT)                                         \
  long rc = 0;                                                              \
  for (long b = 0; b < batch && rc == 0; ++b) {                             \
    CALL_STMT;                                                              \
  }                                                                         \
  return rc;

long mf_cholesky_bidiag_f64(long batch, long nb, long d, const double* diag,
                            const double* lower, double* l_diag,
                            double* l_lower) {
  const long sd = nb * d * d, sl = (nb - 1) * d * d;
  MF_BATCHED(cholesky, rc = cholesky_bidiag(nb, d, diag + b * sd,
                                            lower + b * sl, l_diag + b * sd,
                                            l_lower + b * sl))
}

long mf_cholesky_bidiag_f32(long batch, long nb, long d, const float* diag,
                            const float* lower, float* l_diag,
                            float* l_lower) {
  const long sd = nb * d * d, sl = (nb - 1) * d * d;
  MF_BATCHED(cholesky, rc = cholesky_bidiag(nb, d, diag + b * sd,
                                            lower + b * sl, l_diag + b * sd,
                                            l_lower + b * sl))
}

long mf_cholesky_bidiag_vjp_f64(long batch, long nb, long d,
                                const double* l_diag, const double* l_lower,
                                const double* ct_ldiag,
                                const double* ct_llower, double* ct_diag,
                                double* ct_lower) {
  const long sd = nb * d * d, sl = (nb - 1) * d * d;
  MF_BATCHED(cvjp, rc = cholesky_bidiag_vjp(
                 nb, d, l_diag + b * sd, l_lower + b * sl, ct_ldiag + b * sd,
                 ct_llower + b * sl, ct_diag + b * sd, ct_lower + b * sl))
}

long mf_cholesky_bidiag_vjp_f32(long batch, long nb, long d,
                                const float* l_diag, const float* l_lower,
                                const float* ct_ldiag, const float* ct_llower,
                                float* ct_diag, float* ct_lower) {
  const long sd = nb * d * d, sl = (nb - 1) * d * d;
  MF_BATCHED(cvjp, rc = cholesky_bidiag_vjp(
                 nb, d, l_diag + b * sd, l_lower + b * sl, ct_ldiag + b * sd,
                 ct_llower + b * sl, ct_diag + b * sd, ct_lower + b * sl))
}

long mf_solve_bidiag_f64(long batch, long nb, long d, long m, int transpose,
                         const double* l_diag, const double* l_lower,
                         const double* rhs, double* out) {
  const long sd = nb * d * d, sl = (nb - 1) * d * d, sr = nb * d * m;
  MF_BATCHED(solve, rc = solve_bidiag(nb, d, m, transpose, l_diag + b * sd,
                                      l_lower + b * sl, rhs + b * sr,
                                      out + b * sr))
}

long mf_solve_bidiag_f32(long batch, long nb, long d, long m, int transpose,
                         const float* l_diag, const float* l_lower,
                         const float* rhs, float* out) {
  const long sd = nb * d * d, sl = (nb - 1) * d * d, sr = nb * d * m;
  MF_BATCHED(solve, rc = solve_bidiag(nb, d, m, transpose, l_diag + b * sd,
                                      l_lower + b * sl, rhs + b * sr,
                                      out + b * sr))
}

long mf_sparse_inverse_band_f64(long batch, long nb, long d,
                                const double* l_diag, const double* l_lower,
                                double* z_diag, double* z_off) {
  const long sd = nb * d * d, sl = (nb - 1) * d * d;
  MF_BATCHED(takahashi, rc = sparse_inverse_band(nb, d, l_diag + b * sd,
                                                 l_lower + b * sl,
                                                 z_diag + b * sd,
                                                 z_off + b * sl))
}

long mf_sparse_inverse_band_f32(long batch, long nb, long d,
                                const float* l_diag, const float* l_lower,
                                float* z_diag, float* z_off) {
  const long sd = nb * d * d, sl = (nb - 1) * d * d;
  MF_BATCHED(takahashi, rc = sparse_inverse_band(nb, d, l_diag + b * sd,
                                                 l_lower + b * sl,
                                                 z_diag + b * sd,
                                                 z_off + b * sl))
}

long mf_sparse_inverse_band_vjp_f64(long batch, long nb, long d,
                                    const double* l_diag,
                                    const double* l_lower,
                                    const double* ct_zdiag,
                                    const double* ct_zoff, double* ct_ldiag,
                                    double* ct_llower) {
  const long sd = nb * d * d, sl = (nb - 1) * d * d;
  MF_BATCHED(tvjp, rc = sparse_inverse_band_vjp(
                 nb, d, l_diag + b * sd, l_lower + b * sl, ct_zdiag + b * sd,
                 ct_zoff + b * sl, ct_ldiag + b * sd, ct_llower + b * sl))
}

long mf_sparse_inverse_band_vjp_f32(long batch, long nb, long d,
                                    const float* l_diag, const float* l_lower,
                                    const float* ct_zdiag,
                                    const float* ct_zoff, float* ct_ldiag,
                                    float* ct_llower) {
  const long sd = nb * d * d, sl = (nb - 1) * d * d;
  MF_BATCHED(tvjp, rc = sparse_inverse_band_vjp(
                 nb, d, l_diag + b * sd, l_lower + b * sl, ct_zdiag + b * sd,
                 ct_zoff + b * sl, ct_ldiag + b * sd, ct_llower + b * sl))
}

long mf_udu_f64(long batch, long nb, long d, const double* diag,
                const double* lower, double* u_off, double* d_chol) {
  const long sd = nb * d * d, sl = (nb - 1) * d * d;
  MF_BATCHED(udu, rc = udu(nb, d, diag + b * sd, lower + b * sl,
                           u_off + b * sl, d_chol + b * sd))
}

long mf_udu_f32(long batch, long nb, long d, const float* diag,
                const float* lower, float* u_off, float* d_chol) {
  const long sd = nb * d * d, sl = (nb - 1) * d * d;
  MF_BATCHED(udu, rc = udu(nb, d, diag + b * sd, lower + b * sl,
                           u_off + b * sl, d_chol + b * sd))
}

}  // extern "C"
