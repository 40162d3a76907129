"""StateSpaceModel vs dense NumPy (pattern: reference tests/unit/test_state_space_model.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose

from markovflow_tpu import StateSpaceModel
from tests.tools.numpy_kalman import joint_mean_cov, random_ssm


def make_ssm(rng, T=6, d=2, batch=()):
    mu0, l0, A, b, lq = random_ssm(rng, T, d, batch)
    ssm = StateSpaceModel(*[jnp.asarray(x) for x in (mu0, l0, A, b, lq)])
    return ssm, (mu0, l0 @ np.swapaxes(l0, -1, -2), A, b,
                 lq @ np.swapaxes(lq, -1, -2))


def test_marginals_match_dense(rng):
    T, d = 6, 2
    ssm, (mu0, P0, A, b, Q) = make_ssm(rng, T, d)
    mean, cov = joint_mean_cov(mu0, P0, A, b, Q)
    means, covs = ssm.marginals
    assert_allclose(np.asarray(means).reshape(-1), mean, atol=1e-9)
    for k in range(T + 1):
        assert_allclose(np.asarray(covs)[k],
                        cov[k * d:(k + 1) * d, k * d:(k + 1) * d], atol=1e-9)


def test_subsequent_covariances(rng):
    T, d = 4, 2
    ssm, (mu0, P0, A, b, Q) = make_ssm(rng, T, d)
    _, cov = joint_mean_cov(mu0, P0, A, b, Q)
    sub = np.asarray(ssm.subsequent_covariances())
    for k in range(T):
        # Cov(x_{k+1}, x_k)
        assert_allclose(sub[k],
                        cov[(k + 1) * d:(k + 2) * d, k * d:(k + 1) * d],
                        atol=1e-9)


def test_precision_is_inverse_of_joint_cov(rng):
    T, d = 5, 2
    ssm, (mu0, P0, A, b, Q) = make_ssm(rng, T, d)
    _, cov = joint_mean_cov(mu0, P0, A, b, Q)
    prec_dense = np.asarray(ssm.precision().to_dense())
    assert_allclose(prec_dense, np.linalg.inv(cov), atol=1e-8)


def test_log_det_precision(rng):
    T, d = 5, 2
    ssm, (mu0, P0, A, b, Q) = make_ssm(rng, T, d)
    _, cov = joint_mean_cov(mu0, P0, A, b, Q)
    assert_allclose(np.asarray(ssm.log_det_precision),
                    -np.linalg.slogdet(cov)[1], atol=1e-8)


def test_log_pdf_matches_dense(rng):
    T, d = 5, 2
    ssm, (mu0, P0, A, b, Q) = make_ssm(rng, T, d)
    mean, cov = joint_mean_cov(mu0, P0, A, b, Q)
    x = rng.standard_normal((T + 1, d))
    got = np.asarray(ssm.log_pdf(jnp.asarray(x)))
    diff = x.reshape(-1) - mean
    expected = -0.5 * (
        diff @ np.linalg.solve(cov, diff)
        + np.linalg.slogdet(cov)[1]
        + (T + 1) * d * np.log(2 * np.pi)
    )
    assert_allclose(got, expected, atol=1e-9)


def test_kl_divergence_matches_dense(rng):
    T, d = 5, 2
    q, (mu0q, P0q, Aq, bq, Qq) = make_ssm(rng, T, d)
    p, (mu0p, P0p, Ap, bp, Qp) = make_ssm(rng, T, d)
    mq, cq = joint_mean_cov(mu0q, P0q, Aq, bq, Qq)
    mp_, cp = joint_mean_cov(mu0p, P0p, Ap, bp, Qp)
    n = (T + 1) * d
    cp_inv = np.linalg.inv(cp)
    diff = mp_ - mq
    expected = 0.5 * (
        np.trace(cp_inv @ cq)
        + diff @ cp_inv @ diff
        - n
        + np.linalg.slogdet(cp)[1]
        - np.linalg.slogdet(cq)[1]
    )
    assert_allclose(np.asarray(q.kl_divergence(p)), expected, rtol=1e-8)
    assert_allclose(np.asarray(q.kl_divergence(q)), 0.0, atol=1e-9)


def test_sample_moments(rng):
    """Samples match marginal moments within MC error (pattern:
    reference tests/tools/check_distributions.py)."""
    T, d = 4, 2
    ssm, _ = make_ssm(rng, T, d)
    n_samples = 200_000
    samples = ssm.sample(jax.random.PRNGKey(0), (n_samples,))
    assert samples.shape == (n_samples, T + 1, d)
    emp_mean = np.asarray(samples).mean(axis=0)
    means, covs = ssm.marginals
    assert_allclose(emp_mean, np.asarray(means), atol=0.05)
    centered = np.asarray(samples) - emp_mean
    for k in range(T + 1):
        emp_cov = centered[:, k].T @ centered[:, k] / n_samples
        assert_allclose(emp_cov, np.asarray(covs)[k], atol=0.1)


def test_batched_ssm(rng, batch_shape):
    T, d = 4, 2
    ssm, _ = make_ssm(rng, T, d, batch=batch_shape)
    means, covs = ssm.marginals
    assert means.shape == batch_shape + (T + 1, d)
    assert covs.shape == batch_shape + (T + 1, d, d)
    kl = ssm.kl_divergence(ssm)
    assert kl.shape == batch_shape
    assert_allclose(np.asarray(kl), np.zeros(batch_shape), atol=1e-8)


def test_trainable_copy_roundtrip(rng):
    ssm, _ = make_ssm(rng, 4, 2)
    tssm = ssm.trainable_copy()
    assert_allclose(np.asarray(tssm.marginal_means),
                    np.asarray(ssm.marginal_means), atol=1e-9)
    # pytree flattening keeps working through jit
    loss = jax.jit(lambda m: jnp.sum(m.marginal_means ** 2))
    assert np.isfinite(float(loss(tssm)))
