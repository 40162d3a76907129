"""Combinator kernels swept across batch shapes and output dims, with
gradient checks against analytic Gram oracles.

Mirrors the reference's combinator sweeps
(reference: tests/integration/test_kernels.py:107-149 — gradient
comparisons of Sum/Product vs gpflow dense kernels; and
tests/integration/test_f_covariance.py:108-131 — f-covariances of
combinator kernels across batch shapes).

Every test here parametrizes over >= 2 batch shapes; the multi-output
tests also parametrize over >= 2 output dims; each combinator family has
at least one gradient assertion (SSM path vs analytic formula, both
differentiated by JAX so the oracle shares no SSM code).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose

from markovflow_tpu.kernels import (
    FactorAnalysisKernel,
    IndependentMultiOutput,
    IndependentMultiOutputStack,
    Matern12,
    Matern32,
    Matern52,
    Product,
    StackKernel,
    Sum,
)

SQRT3, SQRT5 = np.sqrt(3.0), np.sqrt(5.0)
TS = np.array([0.0, 0.3, 0.9, 1.0, 2.5])
BATCH_SHAPES = [(), (3,), (2, 1)]


def k12(r, ell, var):
    return var * jnp.exp(-r / ell)


def k32(r, ell, var):
    lam = SQRT3 / ell
    return var * (1 + lam * r) * jnp.exp(-lam * r)


def k52(r, ell, var):
    lam = SQRT5 / ell
    return var * (1 + lam * r + lam**2 * r**2 / 3.0) * jnp.exp(-lam * r)


def batched_ts(batch_shape):
    """Time grids with distinct per-batch offsets, shape batch + (N,)."""
    n_batch = int(np.prod(batch_shape, dtype=int))
    offs = np.linspace(0.0, 0.11, n_batch).reshape(batch_shape + (1,))
    return np.broadcast_to(TS, batch_shape + (len(TS),)) + offs


def dense_f_cov_batched(kernel, ts):
    """Dense Cov(f(t_i), f(t_j)) per batch element, from SSM + emission.

    ts: batch + (N,).  Returns batch + (N, p, N, p).
    """
    ssm = kernel.state_space_model(jnp.asarray(ts))
    em = kernel.generate_emission_model(jnp.asarray(ts))
    batch = ts.shape[:-1]
    n, p, d = ts.shape[-1], kernel.output_dim, kernel.state_dim
    A = np.broadcast_to(np.asarray(ssm.state_transitions),
                        batch + (n - 1, d, d))
    covs = np.broadcast_to(np.asarray(ssm.marginal_covariances),
                           batch + (n, d, d))
    H = np.broadcast_to(np.asarray(em.emission_matrix), batch + (n, p, d))
    out = np.zeros(batch + (n, p, n, p))
    for b in np.ndindex(*batch) if batch else [()]:
        for i in range(n):
            for j in range(i, n):
                prod = np.eye(d)
                for k in range(i, j):
                    prod = A[b + (k,)] @ prod
                cij = covs[b + (i,)] @ prod.T
                blk = H[b + (i,)] @ cij @ H[b + (j,)].T
                out[b + (i, slice(None), j, slice(None))] = blk
                out[b + (j, slice(None), i, slice(None))] = blk.T
    return out


def analytic_gram(kfuncs, ts, combine):
    """batch + (N, N) Gram from analytic k(r) functions."""
    r = jnp.abs(ts[..., :, None] - ts[..., None, :])
    return combine([kf(r) for kf in kfuncs])


# ---------------------------------------------------------------------------
# Sum / Product: values across batch shapes + gradient wrt each child's
# lengthscale
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("batch_shape", BATCH_SHAPES,
                         ids=["scalar", "b3", "b2x1"])
@pytest.mark.parametrize("family", ["sum", "product"])
def test_sum_product_gram_batched(batch_shape, family):
    kernel_cls, combine = {
        "sum": (Sum, lambda gs: gs[0] + gs[1] + gs[2]),
        "product": (Product, lambda gs: gs[0] * gs[1] * gs[2]),
    }[family]
    kernel = kernel_cls([Matern12(lengthscale=0.7, variance=1.3),
                         Matern32(lengthscale=1.1, variance=0.4),
                         Matern52(lengthscale=0.9, variance=0.6)])
    ts = batched_ts(batch_shape)
    got = dense_f_cov_batched(kernel, ts)[..., :, 0, :, 0]
    expected = analytic_gram(
        [lambda r: k12(r, 0.7, 1.3), lambda r: k32(r, 1.1, 0.4),
         lambda r: k52(r, 0.9, 0.6)], jnp.asarray(ts), combine)
    assert_allclose(got, np.asarray(expected), atol=1e-8)


@pytest.mark.parametrize("batch_shape", [(), (3,)], ids=["scalar", "b3"])
@pytest.mark.parametrize("family", ["sum", "product"])
def test_sum_product_gradients_batched(batch_shape, family):
    """d/d(ell_i) of sum of Cov(f_0, f_1) over the batch: SSM path vs
    analytic formula (both autodiffed — the oracle shares no SSM code)."""
    kernel_cls, combine = {
        "sum": (Sum, lambda gs: gs[0] + gs[1]),
        "product": (Product, lambda gs: gs[0] * gs[1]),
    }[family]
    ts = jnp.asarray(batched_ts(batch_shape))

    def cov01_ssm(ells):
        kernel = kernel_cls([Matern12(lengthscale=ells[0], variance=1.3),
                             Matern32(lengthscale=ells[1], variance=0.4)])
        ssm = kernel.state_space_model(ts)
        a = ssm.state_transitions
        p = ssm.marginal_covariances
        em = kernel.generate_emission_model(ts)
        h = em.emission_matrix
        # Cov(f_0, f_1) = H_0 (P_0 A_0^T) H_1^T, summed over the batch
        c01 = p[..., 0, :, :] @ jnp.swapaxes(a[..., 0, :, :], -1, -2)
        blk = h[..., 0, :, :] @ c01 @ jnp.swapaxes(h[..., 1, :, :], -1, -2)
        return jnp.sum(blk)

    def cov01_analytic(ells):
        r = jnp.abs(ts[..., 1] - ts[..., 0])
        return jnp.sum(combine([k12(r, ells[0], 1.3), k32(r, ells[1], 0.4)]))

    ells = jnp.asarray([0.7, 1.1])
    g_ssm = jax.jit(jax.grad(cov01_ssm))(ells)
    g_ana = jax.jit(jax.grad(cov01_analytic))(ells)
    assert_allclose(np.asarray(g_ssm), np.asarray(g_ana), rtol=1e-8)


# ---------------------------------------------------------------------------
# IndependentMultiOutput: >= 2 output dims x >= 2 batch shapes + gradient
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("batch_shape", BATCH_SHAPES,
                         ids=["scalar", "b3", "b2x1"])
@pytest.mark.parametrize("num_outputs", [2, 3])
def test_independent_multi_output_batched(batch_shape, num_outputs):
    children = [Matern12(lengthscale=0.7, variance=1.3),
                Matern32(lengthscale=1.1, variance=0.4),
                Matern52(lengthscale=0.9, variance=0.6)][:num_outputs]
    kfuncs = [lambda r: k12(r, 0.7, 1.3), lambda r: k32(r, 1.1, 0.4),
              lambda r: k52(r, 0.9, 0.6)][:num_outputs]
    kernel = IndependentMultiOutput(children)
    assert kernel.output_dim == num_outputs
    ts = batched_ts(batch_shape)
    got = dense_f_cov_batched(kernel, ts)
    tsj = jnp.asarray(ts)
    for i, kf in enumerate(kfuncs):
        assert_allclose(got[..., :, i, :, i],
                        np.asarray(analytic_gram([kf], tsj, lambda g: g[0])),
                        atol=1e-8)
        for j in range(num_outputs):
            if j != i:
                assert_allclose(got[..., :, i, :, j], 0.0, atol=1e-10)


@pytest.mark.parametrize("num_outputs", [2, 3])
def test_independent_multi_output_gradient(num_outputs):
    ts = jnp.asarray(TS)

    def probe_ssm(ell):
        children = [Matern32(lengthscale=ell, variance=1.3),
                    Matern12(lengthscale=1.1, variance=0.4),
                    Matern52(lengthscale=0.9, variance=0.6)][:num_outputs]
        kernel = IndependentMultiOutput(children)
        ssm = kernel.state_space_model(ts)
        a, p = ssm.state_transitions, ssm.marginal_covariances
        h = kernel.generate_emission_model(ts).emission_matrix
        blk = h[0] @ (p[0] @ a[0].T) @ h[1].T
        return blk[0, 0]  # Cov(f^0(t_0), f^0(t_1)) = child-0 kernel

    def probe_analytic(ell):
        return k32(jnp.abs(ts[1] - ts[0]), ell, 1.3)

    g1 = jax.jit(jax.grad(probe_ssm))(0.7)
    g2 = jax.jit(jax.grad(probe_analytic))(0.7)
    assert_allclose(float(g1), float(g2), rtol=1e-8)


# ---------------------------------------------------------------------------
# FactorAnalysisKernel: >= 2 output dims x >= 2 batch shapes + gradient
# ---------------------------------------------------------------------------

def _fa_kernel(B, ell0=0.7):
    latents = [Matern12(lengthscale=ell0, variance=1.3),
               Matern32(lengthscale=1.1, variance=0.4)]
    output_dim = B.shape[0]
    weight_fn = lambda t: jnp.broadcast_to(
        jnp.eye(output_dim), t.shape + (output_dim, output_dim))
    return FactorAnalysisKernel(weight_fn, latents, output_dim=output_dim,
                                loading=jnp.asarray(B),
                                trainable_loading=False)


@pytest.mark.parametrize("batch_shape", [(), (3,)], ids=["scalar", "b3"])
@pytest.mark.parametrize("output_dim", [2, 3])
def test_factor_analysis_batched(batch_shape, output_dim, rng):
    B = rng.standard_normal((output_dim, 2))
    kernel = _fa_kernel(B)
    ts = batched_ts(batch_shape)
    got = dense_f_cov_batched(kernel, ts)
    tsj = jnp.asarray(ts)
    r = jnp.abs(tsj[..., :, None] - tsj[..., None, :])
    diag = jnp.stack([k12(r, 0.7, 1.3), k32(r, 1.1, 0.4)], -1)  # ...N,N,2
    # Cov(f_i, f_j) = B diag(k_l(r_ij)) B^T
    expected = jnp.einsum("pl,...l,ql->...pq", jnp.asarray(B), diag,
                          jnp.asarray(B))
    got_t = np.moveaxis(got, -3, -2)  # batch,N,p,N,p -> batch,N,N,p,p
    assert_allclose(got_t, np.asarray(expected), atol=1e-8)


def test_factor_analysis_gradient(rng):
    B = rng.standard_normal((3, 2))
    ts = jnp.asarray(TS)

    def probe_ssm(ell):
        kernel = _fa_kernel(B, ell0=ell)
        ssm = kernel.state_space_model(ts)
        a, p = ssm.state_transitions, ssm.marginal_covariances
        h = kernel.generate_emission_model(ts).emission_matrix
        return (h[0] @ (p[0] @ a[0].T) @ h[1].T)[0, 0]

    def probe_analytic(ell):
        r = jnp.abs(ts[1] - ts[0])
        Bj = jnp.asarray(B)
        return (Bj @ jnp.diag(jnp.stack([k12(r, ell, 1.3),
                                         k32(r, 1.1, 0.4)])) @ Bj.T)[0, 0]

    g1 = jax.jit(jax.grad(probe_ssm))(0.7)
    g2 = jax.jit(jax.grad(probe_analytic))(0.7)
    assert_allclose(float(g1), float(g2), rtol=1e-8)


# ---------------------------------------------------------------------------
# StackKernel / IndependentMultiOutputStack: stack sizes x leading batch
# shapes + gradient
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("lead_shape", [(), (2,)], ids=["none", "lead2"])
@pytest.mark.parametrize("stack_cls", [StackKernel,
                                       IndependentMultiOutputStack])
def test_stack_kernels_batched(lead_shape, stack_cls):
    children = [Matern12(lengthscale=0.7, variance=1.3),
                Matern32(lengthscale=1.1, variance=0.4),
                Matern52(lengthscale=0.9, variance=0.6)]
    kernel = stack_cls(children)
    n_k = len(children)
    ts = np.broadcast_to(TS, lead_shape + (n_k, len(TS))).copy()
    ssm = kernel.state_space_model(jnp.asarray(ts))
    assert ssm.batch_shape == lead_shape + (n_k,)
    assert ssm.state_dim == 3  # max child dim (Matern52)
    em = kernel.generate_emission_model(jnp.asarray(ts))
    f_var = em.project_state_covariance_to_f(ssm.marginal_covariances)
    expected = np.broadcast_to(np.array([1.3, 0.4, 0.6]),
                               lead_shape + (len(TS), n_k))
    got = np.asarray(f_var)
    if stack_cls is StackKernel:
        # StackEmission keeps output as the trailing num_kernels axis
        assert got.shape == lead_shape + (len(TS), n_k)
        assert_allclose(got, expected, atol=1e-8)
    else:
        assert got.shape == lead_shape + (len(TS), n_k)
        assert_allclose(got, expected, atol=1e-8)


def test_stack_kernel_gradient():
    ts2 = jnp.broadcast_to(jnp.asarray(TS), (2, len(TS)))

    def probe_ssm(ell):
        kernel = StackKernel([Matern32(lengthscale=ell, variance=1.3),
                              Matern12(lengthscale=1.1, variance=0.4)])
        ssm = kernel.state_space_model(ts2)
        a, p = ssm.state_transitions, ssm.marginal_covariances
        h = kernel.generate_emission_model(ts2).emission_matrix
        blk = h[:, 0] @ (p[:, 0] @ jnp.swapaxes(a[:, 0], -1, -2)) \
            @ jnp.swapaxes(h[:, 1], -1, -2)
        return blk[0, 0, 0]  # child-0 Cov(f(t_0), f(t_1))

    def probe_analytic(ell):
        return k32(jnp.abs(jnp.asarray(TS)[1] - jnp.asarray(TS)[0]), ell, 1.3)

    g1 = jax.jit(jax.grad(probe_ssm))(0.7)
    g2 = jax.jit(jax.grad(probe_analytic))(0.7)
    assert_allclose(float(g1), float(g2), rtol=1e-8)
