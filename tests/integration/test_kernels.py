"""Kernels validated against analytic Gram matrices
(pattern: reference tests/integration/test_kernels.py:28-130)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose

from markovflow_tpu.kernels import (
    Constant,
    HarmonicOscillator,
    IndependentMultiOutput,
    LatentExponentiallyGenerated,
    Matern12,
    Matern32,
    Matern52,
    OrnsteinUhlenbeck,
    PiecewiseKernel,
    Product,
    StackKernel,
    Sum,
)

SQRT3, SQRT5 = np.sqrt(3.0), np.sqrt(5.0)
ELL, VAR = 0.7, 1.3


def dense_f_cov(kernel, ts):
    """Dense Cov(f(t_i), f(t_j)) from the kernel's SSM + emission."""
    ssm = kernel.state_space_model(jnp.asarray(ts))
    em = kernel.generate_emission_model(jnp.asarray(ts))
    A = np.asarray(ssm.state_transitions)
    covs = np.asarray(ssm.marginal_covariances)
    H = np.asarray(em.emission_matrix)
    n = len(ts)
    out = np.zeros((n, kernel.output_dim, n, kernel.output_dim))
    for i in range(n):
        for j in range(i, n):
            c = covs[i]
            prod = np.eye(kernel.state_dim)
            for k in range(i, j):
                prod = A[k] @ prod
            cij = c @ prod.T  # Cov(x_i, x_j)
            out[i, :, j, :] = H[i] @ cij @ H[j].T
            out[j, :, i, :] = out[i, :, j, :].T
    return out


def gram(kfunc, ts):
    r = np.abs(ts[:, None] - ts[None, :])
    return kfunc(r)


TS = np.array([0.0, 0.3, 0.9, 1.0, 2.5, 3.1])

ANALYTIC = {
    "matern12": (
        lambda: Matern12(lengthscale=ELL, variance=VAR),
        lambda r: VAR * np.exp(-r / ELL),
    ),
    "matern32": (
        lambda: Matern32(lengthscale=ELL, variance=VAR),
        lambda r: VAR * (1 + SQRT3 * r / ELL) * np.exp(-SQRT3 * r / ELL),
    ),
    "matern52": (
        lambda: Matern52(lengthscale=ELL, variance=VAR),
        lambda r: VAR * (1 + SQRT5 * r / ELL + 5 * r**2 / (3 * ELL**2))
        * np.exp(-SQRT5 * r / ELL),
    ),
    "ou": (
        lambda: OrnsteinUhlenbeck(decay=1.7, diffusion=0.8),
        lambda r: 0.8 / (2 * 1.7) * np.exp(-1.7 * r),
    ),
    "constant": (
        lambda: Constant(variance=VAR, jitter=1e-12),
        lambda r: VAR * np.ones_like(r),
    ),
    "harmonic": (
        lambda: HarmonicOscillator(variance=VAR, period=1.9, jitter=1e-12),
        lambda r: VAR * np.cos(2 * np.pi * r / 1.9),
    ),
}


@pytest.mark.parametrize("name", list(ANALYTIC))
def test_kernel_gram_matches_analytic(name):
    make, kfunc = ANALYTIC[name]
    kernel = make()
    got = dense_f_cov(kernel, TS)[:, 0, :, 0]
    assert_allclose(got, gram(kfunc, TS), atol=1e-9)


def test_sum_kernel():
    kernel = Sum([Matern12(lengthscale=ELL, variance=VAR),
                  Matern32(lengthscale=1.1, variance=0.4)])
    expected = gram(lambda r: VAR * np.exp(-r / ELL), TS) + gram(
        lambda r: 0.4 * (1 + SQRT3 * r / 1.1) * np.exp(-SQRT3 * r / 1.1), TS)
    got = dense_f_cov(kernel, TS)[:, 0, :, 0]
    assert_allclose(got, expected, atol=1e-9)


def test_product_kernel():
    kernel = Product([Matern12(lengthscale=ELL, variance=VAR),
                      Matern32(lengthscale=1.1, variance=0.4)])
    expected = gram(lambda r: VAR * np.exp(-r / ELL), TS) * gram(
        lambda r: 0.4 * (1 + SQRT3 * r / 1.1) * np.exp(-SQRT3 * r / 1.1), TS)
    got = dense_f_cov(kernel, TS)[:, 0, :, 0]
    assert_allclose(got, expected, atol=1e-9)


def test_independent_multi_output():
    k1 = Matern12(lengthscale=ELL, variance=VAR)
    k2 = Matern32(lengthscale=1.1, variance=0.4)
    kernel = IndependentMultiOutput([k1, k2])
    assert kernel.output_dim == 2
    got = dense_f_cov(kernel, TS)
    assert_allclose(got[:, 0, :, 0], gram(lambda r: VAR * np.exp(-r / ELL), TS),
                    atol=1e-9)
    assert_allclose(
        got[:, 1, :, 1],
        gram(lambda r: 0.4 * (1 + SQRT3 * r / 1.1) * np.exp(-SQRT3 * r / 1.1),
             TS),
        atol=1e-9)
    assert_allclose(got[:, 0, :, 1], 0.0, atol=1e-12)


def test_leg_kernel():
    rng = np.random.default_rng(0)
    d = 3
    N = rng.standard_normal((d, d)) * 0.5
    R = rng.standard_normal((d, d))
    B = rng.standard_normal((2, d))
    kernel = LatentExponentiallyGenerated(N=N, R=R, B=B)
    got = dense_f_cov(kernel, TS)
    import scipy.linalg as sla

    F = -0.5 * (N @ N.T + R - R.T)
    for i in range(len(TS)):
        for j in range(i, len(TS)):
            expected = B @ sla.expm(F * (TS[j] - TS[i])).T @ B.T
            assert_allclose(got[i, :, j, :], expected, atol=1e-8)


def test_piecewise_kernel():
    k1 = Matern32(lengthscale=0.5, variance=1.0)
    k2 = Matern32(lengthscale=2.0, variance=2.0)
    kernel = PiecewiseKernel([k1, k2], change_points=jnp.asarray([1.0]))
    ts = np.array([0.0, 0.4, 0.8, 1.2, 1.9, 2.4])  # no transition crosses 1.0?
    # (0.8 -> 1.2 crosses; reference has the same restriction — transitions
    # must not cross change points, so use points aligned with the boundary)
    ts = np.array([0.0, 0.4, 1.0, 1.6, 2.4])
    ssm = kernel.state_space_model(jnp.asarray(ts))
    A = np.asarray(ssm.state_transitions)
    # segment 0 transitions use k1, segment >= 1 use k2
    a1 = np.asarray(k1.state_transitions(jnp.asarray([0.4, 0.6])))
    a2 = np.asarray(k2.state_transitions(jnp.asarray([0.6, 0.8])))
    assert_allclose(A[0], a1[0], atol=1e-12)
    assert_allclose(A[1], a1[1], atol=1e-12)
    assert_allclose(A[2], a2[0], atol=1e-12)
    assert_allclose(A[3], a2[1], atol=1e-12)


def test_stack_kernel():
    k1 = Matern12(lengthscale=ELL, variance=VAR)
    k2 = Matern32(lengthscale=1.1, variance=0.4)
    kernel = StackKernel([k1, k2])
    ts = jnp.broadcast_to(jnp.asarray(TS), (2, len(TS)))
    ssm = kernel.state_space_model(ts)
    assert ssm.batch_shape == (2,)
    assert ssm.state_dim == 2  # max child dim
    em = kernel.generate_emission_model(ts)
    means, covs = ssm.marginals
    f_var = em.project_state_covariance_to_f(covs)
    assert f_var.shape == (len(TS), 2)
    assert_allclose(np.asarray(f_var)[:, 0], VAR, atol=1e-9)
    assert_allclose(np.asarray(f_var)[:, 1], 0.4, atol=1e-9)


def test_kernel_gradients_match_analytic():
    """d(Gram)/d(lengthscale) via SSM path == via analytic formula
    (pattern: reference test_kernels.py:107-149)."""
    ts = jnp.asarray(TS)

    def gram_ssm(ell):
        kernel = Matern32(lengthscale=ell, variance=VAR)
        ssm = kernel.state_space_model(ts)
        covs = ssm.marginal_covariances
        # just the variance terms (diagonal of Gram) as a probe
        em = kernel.generate_emission_model(ts)
        return jnp.sum(em.project_state_covariance_to_f(covs))

    def gram_analytic(ell):
        return VAR * len(TS) * 1.0  # diagonal is variance, indep of ell

    g = jax.jit(jax.grad(gram_ssm))(0.7)
    assert_allclose(float(g), 0.0, atol=1e-8)

    def offdiag_ssm(ell):
        kernel = Matern32(lengthscale=ell, variance=VAR)
        ssm = kernel.state_space_model(ts)
        a = ssm.state_transitions
        p = ssm.marginal_covariances
        # Cov(f_0, f_1) = (P_0 A_0^T)[0, 0]
        return (p[0] @ a[0].T)[0, 0]

    def offdiag_analytic(ell):
        lam = SQRT3 / ell
        r = TS[1] - TS[0]
        return VAR * (1 + lam * r) * jnp.exp(-lam * r)

    g1 = jax.jit(jax.grad(offdiag_ssm))(0.7)
    g2 = jax.jit(jax.grad(offdiag_analytic))(0.7)
    assert_allclose(float(g1), float(g2), rtol=1e-9)


def test_state_mean_offsets():
    kernel = Matern32(lengthscale=ELL, variance=VAR).set_state_mean(
        jnp.asarray([2.0, 0.0]))
    ssm = kernel.state_space_model(jnp.asarray(TS))
    means = np.asarray(ssm.marginal_means)
    assert_allclose(means[:, 0], 2.0, atol=1e-9)


def test_piecewise_kernel_nonzero_state_means():
    """Per-segment state offsets b_k = (I - A_k) m_seg with nonzero child
    means (reference: piecewise_stationary.py:248-288) — the marginal means
    must follow the NumPy mean recursion, and off-grid conditional
    prediction must agree with the SSM built on the refined grid."""
    from markovflow_tpu.conditionals import conditional_predict

    m1, m2 = 1.5, -0.7
    k1 = Matern32(lengthscale=0.5, variance=1.0).set_state_mean(
        jnp.asarray([m1, 0.0]))
    k2 = Matern32(lengthscale=2.0, variance=2.0).set_state_mean(
        jnp.asarray([m2, 0.0]))
    kernel = PiecewiseKernel([k1, k2], change_points=jnp.asarray([1.0]))
    ts = np.array([0.0, 0.4, 1.0, 1.6, 2.4])
    ssm = kernel.state_space_model(jnp.asarray(ts))

    # oracle: forward mean recursion with per-segment child transitions/means
    A = np.asarray(ssm.state_transitions)
    mean = np.array([m1, 0.0])
    means = [mean]
    seg_means = {0: np.array([m1, 0.0]), 1: np.array([m1, 0.0]),
                 2: np.array([m2, 0.0]), 3: np.array([m2, 0.0])}
    for k in range(4):
        m_seg = seg_means[k]
        mean = A[k] @ mean + (m_seg - A[k] @ m_seg)
        means.append(mean)
    assert_allclose(np.asarray(ssm.marginal_means), np.stack(means),
                    atol=1e-9)
    # the last mean has NOT converged back to m2 yet — the offsets matter
    assert abs(means[-1][0] - m2) > 1e-3

    # off-grid conditional prediction == marginals of the union-grid SSM
    t_new = np.array([0.2, 0.7, 1.3, 2.0])
    pred_means, pred_covs = conditional_predict(
        jnp.asarray(t_new), jnp.asarray(ts), kernel, ssm)
    union = np.sort(np.concatenate([ts, t_new]))
    ssm_u = kernel.state_space_model(jnp.asarray(union))
    idx = np.searchsorted(union, t_new)
    assert_allclose(np.asarray(pred_means),
                    np.asarray(ssm_u.marginal_means)[idx], atol=1e-7)
    assert_allclose(np.asarray(pred_covs),
                    np.asarray(ssm_u.marginal_covariances)[idx], atol=1e-7)
