"""Native C++ host kernels for block-tridiagonal linear algebra.

The reference delegates its banded algebra to a C++ TF op library with
hand-written gradients (``banded-matrices==0.0.6``; reference:
markovflow/block_tri_diag.py:22-31, setup.py:15).  This package is its
counterpart here: ``banded.cc`` implements the block-bidiagonal Cholesky,
triangular solves, Takahashi sparse inverse, and UDU factorization as tight
sequential C++ loops — forward AND reverse (VJP) kernels — compiled on
demand with the system toolchain and exposed to JAX through
``jax.pure_callback`` + ``jax.custom_vjp``.

Role in the architecture: the TPU inference engines never call these (they
use O(log T)-depth associative scans / Pallas kernels); the native kernels
serve the *host* path — CPU deployments and the sequential API-parity
methods of :mod:`markovflow_tpu.block_tri_diag`, where a C++ loop beats an
XLA:CPU ``lax.scan`` by avoiding per-step dispatch and tiny-GEMM overhead.
Select with ``engine="native"`` on the block_tri_diag methods (the default
``engine="scan"`` keeps everything pure-XLA and device-agnostic).

Numerics match the scan implementations to roundoff, including gradient
conventions (asserted in tests/unit/test_native_banded.py).
"""
from __future__ import annotations

import ctypes
import functools
import hashlib
import os
import subprocess
import sys

import numpy as np

__all__ = ["available", "cholesky_bidiag", "solve_bidiag",
           "sparse_inverse_band", "udu"]

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "banded.cc")


@functools.lru_cache(maxsize=1)
def _lib():
    """Compile (once, content-hashed) and load the shared library.

    Returns None when no working C++ toolchain is available — callers fall
    back to the scan implementations.
    """
    try:
        with open(_SRC, "rb") as f:
            src = f.read()
        tag = hashlib.sha256(src).hexdigest()[:16]
        build_dir = os.path.join(_HERE, "_build")
        so_path = os.path.join(build_dir, f"libmfbanded-{tag}.so")
        if not os.path.exists(so_path):
            os.makedirs(build_dir, exist_ok=True)
            tmp = so_path + f".tmp{os.getpid()}"
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
                 "-o", tmp],
                check=True, capture_output=True, timeout=300)
            os.replace(tmp, so_path)  # atomic under concurrent builders
        lib = ctypes.CDLL(so_path)
    except Exception as e:  # noqa: BLE001 — any failure means "unavailable"
        print(f"markovflow_tpu.native: build/load failed ({e}); "
              "native engine unavailable", file=sys.stderr)
        return None

    L = ctypes.c_long
    I = ctypes.c_int
    for suffix, T in (("f64", ctypes.c_double), ("f32", ctypes.c_float)):
        P = ctypes.POINTER(T)
        for name, extra in (
            (f"mf_cholesky_bidiag_{suffix}", [P, P, P, P]),
            (f"mf_cholesky_bidiag_vjp_{suffix}", [P, P, P, P, P, P]),
            (f"mf_sparse_inverse_band_{suffix}", [P, P, P, P]),
            (f"mf_sparse_inverse_band_vjp_{suffix}", [P, P, P, P, P, P]),
            (f"mf_udu_{suffix}", [P, P, P, P]),
        ):
            fn = getattr(lib, name)
            fn.argtypes = [L, L, L] + extra
            fn.restype = L
        fn = getattr(lib, f"mf_solve_bidiag_{suffix}")
        fn.argtypes = [L, L, L, L, I, P, P, P, P]
        fn.restype = L
    return lib


def available() -> bool:
    return _lib() is not None


def _suffix(dtype) -> str:
    if dtype == np.float64:
        return "f64"
    if dtype == np.float32:
        return "f32"
    raise TypeError(f"native kernels support f32/f64 only, got {dtype}")


def _ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(
        ctypes.c_double if a.dtype == np.float64 else ctypes.c_float))


def _flatten_batch(arrs, core_ndims):
    """Broadcast leading batch dims and flatten them to one axis."""
    batches = [a.shape[: a.ndim - c] for a, c in zip(arrs, core_ndims)]
    batch = np.broadcast_shapes(*batches)
    bsz = int(np.prod(batch)) if batch else 1
    out = []
    for a, c in zip(arrs, core_ndims):
        core = a.shape[a.ndim - c:]
        a = np.broadcast_to(a, batch + core)
        # explicit batch size: -1 is not inferable for empty cores (nb == 1)
        out.append(np.ascontiguousarray(a.reshape((bsz,) + core)))
    return batch, out


def _nanfill(*arrs):
    for a in arrs:
        a.fill(np.nan)


# --------------------------------------------------------------------------
# host-side implementations (NumPy in / NumPy out)
# --------------------------------------------------------------------------

def _host_cholesky(diag, lower):
    lib = _lib()
    batch, (dg, lo) = _flatten_batch([diag, lower], [3, 3])
    nb, d = dg.shape[-3], dg.shape[-1]
    l_diag = np.empty_like(dg)
    l_lower = np.empty_like(lo)
    fn = getattr(lib, f"mf_cholesky_bidiag_{_suffix(dg.dtype)}")
    rc = fn(dg.shape[0], nb, d, _ptr(dg), _ptr(lo), _ptr(l_diag),
            _ptr(l_lower))
    if rc != 0:
        _nanfill(l_diag, l_lower)
    shape = batch + (nb, d, d)
    return l_diag.reshape(shape), l_lower.reshape(batch + (nb - 1, d, d))


def _host_cholesky_vjp(l_diag, l_lower, ct_ldiag, ct_llower):
    lib = _lib()
    batch, (ld, ll, cd, cl) = _flatten_batch(
        [l_diag, l_lower, ct_ldiag, ct_llower], [3, 3, 3, 3])
    nb, d = ld.shape[-3], ld.shape[-1]
    ct_diag = np.empty_like(ld)
    ct_lower = np.empty_like(ll)
    fn = getattr(lib, f"mf_cholesky_bidiag_vjp_{_suffix(ld.dtype)}")
    fn(ld.shape[0], nb, d, _ptr(ld), _ptr(ll), _ptr(cd), _ptr(cl),
       _ptr(ct_diag), _ptr(ct_lower))
    return (ct_diag.reshape(batch + (nb, d, d)),
            ct_lower.reshape(batch + (nb - 1, d, d)))


def _host_solve(l_diag, l_lower, rhs, *, transpose):
    lib = _lib()
    batch, (ld, ll, r) = _flatten_batch([l_diag, l_lower, rhs], [3, 3, 2])
    nb, d = ld.shape[-3], ld.shape[-1]
    out = np.empty_like(r)
    fn = getattr(lib, f"mf_solve_bidiag_{_suffix(ld.dtype)}")
    rc = fn(ld.shape[0], nb, d, 1, int(transpose), _ptr(ld), _ptr(ll),
            _ptr(r), _ptr(out))
    if rc != 0:
        _nanfill(out)
    return out.reshape(batch + (nb, d))


def _host_sparse_inverse(l_diag, l_lower):
    lib = _lib()
    batch, (ld, ll) = _flatten_batch([l_diag, l_lower], [3, 3])
    nb, d = ld.shape[-3], ld.shape[-1]
    z_diag = np.empty_like(ld)
    z_off = np.empty_like(ll)
    fn = getattr(lib, f"mf_sparse_inverse_band_{_suffix(ld.dtype)}")
    rc = fn(ld.shape[0], nb, d, _ptr(ld), _ptr(ll), _ptr(z_diag), _ptr(z_off))
    if rc != 0:
        _nanfill(z_diag, z_off)
    return (z_diag.reshape(batch + (nb, d, d)),
            z_off.reshape(batch + (nb - 1, d, d)))


def _host_sparse_inverse_vjp(l_diag, l_lower, ct_zdiag, ct_zoff):
    lib = _lib()
    batch, (ld, ll, cd, cl) = _flatten_batch(
        [l_diag, l_lower, ct_zdiag, ct_zoff], [3, 3, 3, 3])
    nb, d = ld.shape[-3], ld.shape[-1]
    ct_ldiag = np.empty_like(ld)
    ct_llower = np.empty_like(ll)
    fn = getattr(lib, f"mf_sparse_inverse_band_vjp_{_suffix(ld.dtype)}")
    fn(ld.shape[0], nb, d, _ptr(ld), _ptr(ll), _ptr(cd), _ptr(cl),
       _ptr(ct_ldiag), _ptr(ct_llower))
    return (ct_ldiag.reshape(batch + (nb, d, d)),
            ct_llower.reshape(batch + (nb - 1, d, d)))


def _host_udu(diag, lower):
    lib = _lib()
    batch, (dg, lo) = _flatten_batch([diag, lower], [3, 3])
    nb, d = dg.shape[-3], dg.shape[-1]
    u_off = np.empty_like(lo)
    d_chol = np.empty_like(dg)
    fn = getattr(lib, f"mf_udu_{_suffix(dg.dtype)}")
    rc = fn(dg.shape[0], nb, d, _ptr(dg), _ptr(lo), _ptr(u_off), _ptr(d_chol))
    if rc != 0:
        _nanfill(u_off, d_chol)
    return (u_off.reshape(batch + (nb - 1, d, d)),
            d_chol.reshape(batch + (nb, d, d)))


# --------------------------------------------------------------------------
# JAX-facing ops (pure_callback + custom_vjp)
# --------------------------------------------------------------------------

def _callback(host_fn, out_shapes, *args):
    import jax

    return jax.pure_callback(host_fn, out_shapes, *args,
                             vmap_method="legacy_vectorized")


def _sds(shape, dtype):
    import jax

    return jax.ShapeDtypeStruct(shape, dtype)


def _chol_shapes(diag, lower):
    return (_sds(diag.shape, diag.dtype), _sds(lower.shape, lower.dtype))


import jax  # noqa: E402  (deferred: keep module importable without backend)
import jax.numpy as jnp  # noqa: E402


@jax.custom_vjp
def cholesky_bidiag(diag, lower):
    """Block-bidiagonal Cholesky of a symmetric block-tridiagonal matrix
    on the host (C++): same function as
    ``SymmetricBlockTriDiagonal.cholesky`` (native ``cholesky_band``)."""
    return _callback(_host_cholesky, _chol_shapes(diag, lower), diag, lower)


def _chol_fwd(diag, lower):
    out = cholesky_bidiag(diag, lower)
    return out, out


def _chol_bwd(res, cts):
    l_diag, l_lower = res
    ct_ldiag, ct_llower = cts
    return _callback(_host_cholesky_vjp, _chol_shapes(l_diag, l_lower),
                     l_diag, l_lower, ct_ldiag, ct_llower)


cholesky_bidiag.defvjp(_chol_fwd, _chol_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def solve_bidiag(l_diag, l_lower, rhs, transpose=False):
    """Solve ``L x = rhs`` (or ``L^T x = rhs``) for block vector rhs
    [..., N, d] with L block-bidiagonal, on the host (C++): same function
    as ``LowerTriangularBlockTriDiagonal.solve`` (native
    ``solve_triang_mat``)."""
    return _callback(
        functools.partial(_host_solve, transpose=bool(transpose)),
        _sds(rhs.shape, rhs.dtype), l_diag, l_lower, rhs)


def _solve_fwd(l_diag, l_lower, rhs, transpose):
    x = solve_bidiag(l_diag, l_lower, rhs, transpose)
    return x, (l_diag, l_lower, x)


def _solve_bwd(transpose, res, ct_x):
    l_diag, l_lower, x = res
    # rhs cotangent: the opposite-transpose solve with the same factor
    ct_rhs = solve_bidiag(l_diag, l_lower, ct_x, not transpose)
    if not transpose:
        g, v = ct_rhs, x       # Lbar = -g v^T patterned
    else:
        g, v = x, ct_rhs
    ct_diag = -jnp.einsum("...ni,...nj->...nij", g, v)
    ct_diag = jnp.tril(ct_diag)
    ct_lower = -jnp.einsum("...ni,...nj->...nij", g[..., 1:, :],
                           v[..., :-1, :])
    return ct_diag, ct_lower, ct_rhs


solve_bidiag.defvjp(_solve_fwd, _solve_bwd)


@jax.custom_vjp
def sparse_inverse_band(l_diag, l_lower):
    """Band (diag, subdiag) of ``(L L^T)^{-1}`` — the Takahashi recursion on
    the host (C++), forward and hand-written VJP: same function as
    ``LowerTriangularBlockTriDiagonal.sparse_inverse_band`` (native
    ``inverse_from_cholesky_band``)."""
    return _callback(_host_sparse_inverse, _chol_shapes(l_diag, l_lower),
                     l_diag, l_lower)


def _spinv_fwd(l_diag, l_lower):
    out = sparse_inverse_band(l_diag, l_lower)
    return out, (l_diag, l_lower)


def _spinv_bwd(res, cts):
    l_diag, l_lower = res
    ct_zdiag, ct_zoff = cts
    return _callback(_host_sparse_inverse_vjp,
                     _chol_shapes(l_diag, l_lower),
                     l_diag, l_lower, ct_zdiag, ct_zoff)


sparse_inverse_band.defvjp(_spinv_fwd, _spinv_bwd)


def udu(diag, lower):
    """UDU^T factorization (backward Riccati) on the host (C++), forward
    only: same function as
    ``SymmetricBlockTriDiagonal.upper_diagonal_lower``.  Differentiation is
    not defined for the native path — use the scan engine under ``grad``.
    Returns ``(u_off, d_chol)``."""
    return _callback(_host_udu,
                     (_sds(lower.shape, lower.dtype),
                      _sds(diag.shape, diag.dtype)),
                     diag, lower)
