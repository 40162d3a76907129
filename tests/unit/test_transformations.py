"""Round-trip tests for parameter transformations
(pattern: reference tests/unit/test_ssm_gaussian_transformations.py)."""
import jax.numpy as jnp
import pytest
import numpy as np
from numpy.testing import assert_allclose

from markovflow_tpu import StateSpaceModel
from markovflow_tpu.ssm_gaussian_transformations import (
    expectations_to_ssm_params,
    naturals_to_ssm_params,
    naturals_to_ssm_params_no_smoothing,
    ssm_to_expectations,
    ssm_to_naturals,
    ssm_to_naturals_no_smoothing,
)
from tests.tools.numpy_kalman import random_ssm


def make_ssm(rng, T=6, d=2):
    mu0, l0, A, b, lq = random_ssm(rng, T, d)
    return StateSpaceModel(*[jnp.asarray(v) for v in (mu0, l0, A, b, lq)])


def assert_ssm_equal(ssm_params, ssm, atol=1e-8):
    a_s, b_s, chol_p0, chol_q_s, mu0 = ssm_params
    assert_allclose(np.asarray(a_s), np.asarray(ssm.state_transitions),
                    atol=atol)
    assert_allclose(np.asarray(b_s), np.asarray(ssm.state_offsets), atol=atol)
    assert_allclose(np.asarray(mu0), np.asarray(ssm.initial_mean), atol=atol)
    p0 = chol_p0 @ np.swapaxes(np.asarray(chol_p0), -1, -2)
    assert_allclose(np.asarray(p0), np.asarray(ssm.initial_covariance),
                    atol=atol)
    q = np.asarray(chol_q_s) @ np.swapaxes(np.asarray(chol_q_s), -1, -2)
    assert_allclose(q, np.asarray(ssm.process_covariances), atol=atol)


def test_expectations_roundtrip(rng):
    ssm = make_ssm(rng)
    eta = ssm_to_expectations(ssm)
    assert_ssm_equal(expectations_to_ssm_params(*eta), ssm)


def test_naturals_roundtrip(rng):
    ssm = make_ssm(rng)
    theta = ssm_to_naturals(ssm)
    assert_ssm_equal(naturals_to_ssm_params(*theta), ssm)


def test_naturals_no_smoothing_roundtrip(rng):
    ssm = make_ssm(rng)
    theta = ssm_to_naturals_no_smoothing(ssm)
    assert_ssm_equal(naturals_to_ssm_params_no_smoothing(*theta), ssm)


def test_naturals_match_precision(rng):
    """theta_diag/subdiag vs the SSM precision built independently."""
    ssm = make_ssm(rng)
    _, theta_diag, theta_subdiag = ssm_to_naturals(ssm)
    prec = ssm.precision()
    assert_allclose(np.asarray(-2.0 * theta_diag), np.asarray(prec.diag),
                    atol=1e-9)
    assert_allclose(np.asarray(-theta_subdiag), np.asarray(prec.lower),
                    atol=1e-9)


def test_theta_linear_is_precision_times_mean(rng):
    ssm = make_ssm(rng)
    theta_linear, _, _ = ssm_to_naturals(ssm)
    prec = ssm.precision()
    expected = prec.block_mult_vector(ssm.marginal_means)
    assert_allclose(np.asarray(theta_linear), np.asarray(expected), atol=1e-8)


def test_naturals_parallel_roundtrip(rng):
    """The O(log N) synthetic-model path recovers the same SSM as the
    sequential UDU path."""
    from markovflow_tpu.ssm_gaussian_transformations import (
        naturals_to_ssm_params_parallel,
    )

    ssm = make_ssm(rng, T=17, d=2)
    theta = ssm_to_naturals(ssm)
    assert_ssm_equal(naturals_to_ssm_params_parallel(*theta), ssm, atol=1e-7)
    # and against the sequential path on a larger/odd state dim
    ssm3 = make_ssm(rng, T=9, d=3)
    theta3 = ssm_to_naturals(ssm3)
    seq = naturals_to_ssm_params(*theta3)
    par = naturals_to_ssm_params_parallel(*theta3)
    for s, p in zip(seq, par):
        assert_allclose(np.asarray(p), np.asarray(s), atol=1e-7)


@pytest.mark.slow
def test_naturals_parallel_batched(rng):
    from markovflow_tpu.ssm_gaussian_transformations import (
        naturals_to_ssm_params_parallel,
    )

    ssms = [make_ssm(rng, T=8, d=2) for _ in range(3)]
    thetas = [ssm_to_naturals(s) for s in ssms]
    batched = tuple(jnp.stack([t[i] for t in thetas]) for i in range(3))
    par = naturals_to_ssm_params_parallel(*batched)
    for i, s in enumerate(ssms):
        assert_ssm_equal(tuple(p[i] for p in par), s, atol=1e-7)
