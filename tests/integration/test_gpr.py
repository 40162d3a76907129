"""GPR vs dense GP oracle
(pattern: reference tests/integration/test_posterior.py:33-120)."""
import jax
import jax.numpy as jnp
import numpy as np
from numpy.testing import assert_allclose

from markovflow_tpu.kernels import Matern32
from markovflow_tpu.mean_function import LinearMeanFunction
from markovflow_tpu.models import GaussianProcessRegression
from tests.tools import LOGLIK, LOSS, PREDICT_F

ELL, VAR, NOISE = 0.8, 1.4, 0.1


def matern32_gram(a, b):
    lam = np.sqrt(3.0) / ELL
    r = np.abs(a[:, None] - b[None, :])
    return VAR * (1 + lam * r) * np.exp(-lam * r)


def make_data(rng, n=9):
    x = np.sort(rng.uniform(0, 4, n))
    y = np.sin(2 * x) + 0.1 * rng.standard_normal(n)
    return x, y


def dense_gp_posterior(x, y, x_new):
    kxx = matern32_gram(x, x) + NOISE**2 * np.eye(len(x))
    kxs = matern32_gram(x, x_new)
    kss = matern32_gram(x_new, x_new)
    alpha = np.linalg.solve(kxx, y)
    mean = kxs.T @ alpha
    cov = kss - kxs.T @ np.linalg.solve(kxx, kxs)
    ll = -0.5 * (y @ alpha + np.linalg.slogdet(kxx)[1]
                 + len(x) * np.log(2 * np.pi))
    return mean, cov, ll


def make_model(x, y):
    kernel = Matern32(lengthscale=ELL, variance=VAR)
    return GaussianProcessRegression(
        input_data=(jnp.asarray(x), jnp.asarray(y[:, None])),
        kernel=kernel,
        chol_obs_covariance=jnp.asarray([[NOISE]]),
    )


def test_gpr_log_likelihood_matches_dense(rng):
    x, y = make_data(rng)
    model = make_model(x, y)
    _, _, ll = dense_gp_posterior(x, y, x)
    assert_allclose(float(LOGLIK(model)), ll, rtol=1e-10)


def test_gpr_predict_f_matches_dense(rng):
    x, y = make_data(rng)
    model = make_model(x, y)
    x_new = np.array([-0.5, 0.31, 1.77, 2.09, 4.5])
    mean_np, cov_np, _ = dense_gp_posterior(x, y, x_new)
    f_mu, f_var = PREDICT_F(model, jnp.asarray(x_new))
    assert_allclose(np.asarray(f_mu)[:, 0], mean_np, atol=1e-8)
    assert_allclose(np.asarray(f_var)[:, 0], np.diag(cov_np), atol=1e-8)


def test_gpr_predict_f_at_training_points(rng):
    x, y = make_data(rng)
    model = make_model(x, y)
    mean_np, cov_np, _ = dense_gp_posterior(x, y, x)
    f_mu, f_var = PREDICT_F(model, jnp.asarray(x))
    assert_allclose(np.asarray(f_mu)[:, 0], mean_np, atol=1e-8)
    assert_allclose(np.asarray(f_var)[:, 0], np.diag(cov_np), atol=1e-8)


def test_gpr_predict_y(rng):
    x, y = make_data(rng)
    model = make_model(x, y)
    x_new = np.array([0.5, 2.2])
    mean_np, cov_np, _ = dense_gp_posterior(x, y, x_new)
    y_mu, y_var = model.posterior.predict_y(jnp.asarray(x_new))
    assert_allclose(np.asarray(y_mu)[:, 0], mean_np, atol=1e-8)
    assert_allclose(np.asarray(y_var)[:, 0], np.diag(cov_np) + NOISE**2,
                    atol=1e-8)


def test_gpr_with_mean_function(rng):
    x, y = make_data(rng)
    kernel = Matern32(lengthscale=ELL, variance=VAR)
    model = GaussianProcessRegression(
        input_data=(jnp.asarray(x), jnp.asarray(y[:, None])),
        kernel=kernel,
        chol_obs_covariance=jnp.asarray([[NOISE]]),
        mean_function=LinearMeanFunction(1.5),
    )
    resid = y - 1.5 * x
    _, _, ll = dense_gp_posterior(x, resid, x)
    assert_allclose(float(LOGLIK(model)), ll, rtol=1e-10)
    x_new = np.array([0.5, 2.2])
    mean_np, _, _ = dense_gp_posterior(x, resid, x_new)
    f_mu, _ = PREDICT_F(model, jnp.asarray(x_new))
    assert_allclose(np.asarray(f_mu)[:, 0], mean_np + 1.5 * x_new, atol=1e-8)


def test_gpr_loss_is_jittable_and_differentiable(rng):
    x, y = make_data(rng)
    model = make_model(x, y)

    @jax.jit
    def loss_fn(m):
        return LOSS(m)

    val = loss_fn(model)
    grads = jax.grad(lambda m: LOSS(m))(model)
    g_ell = grads.kernel.lengthscale.unconstrained
    assert np.isfinite(float(val))
    assert np.isfinite(float(g_ell)) and abs(float(g_ell)) > 0

    # gradient matches finite differences through the dense oracle
    def dense_ll(ell):
        lam = jnp.sqrt(3.0) / ell
        r = jnp.abs(jnp.asarray(x)[:, None] - jnp.asarray(x)[None, :])
        k = VAR * (1 + lam * r) * jnp.exp(-lam * r) + NOISE**2 * jnp.eye(len(x))
        yj = jnp.asarray(y)
        chol = jnp.linalg.cholesky(k)
        alpha = jax.scipy.linalg.cho_solve((chol, True), yj)
        return -0.5 * (yj @ alpha + len(x) * jnp.log(2 * jnp.pi)) - jnp.sum(
            jnp.log(jnp.diag(chol)))

    def ssm_ll(ell):
        kernel = Matern32(lengthscale=ell, variance=VAR)
        m = GaussianProcessRegression(
            (jnp.asarray(x), jnp.asarray(y[:, None])), kernel,
            jnp.asarray([[NOISE]]))
        return LOGLIK(m)

    g1 = jax.grad(dense_ll)(ELL)
    g2 = jax.grad(ssm_ll)(ELL)
    assert_allclose(float(g2), float(g1), rtol=1e-8)


def test_gpr_sampling(rng):
    x, y = make_data(rng)
    model = make_model(x, y)
    x_new = np.array([0.5, 1.1, 2.2])
    samples = model.posterior.sample_f(jnp.asarray(x_new), 50_000,
                                       jax.random.PRNGKey(3))
    mean_np, cov_np, _ = dense_gp_posterior(x, y, x_new)
    emp_mean = np.asarray(samples).mean(axis=0)[:, 0]
    assert_allclose(emp_mean, mean_np, atol=0.05)
    emp = np.asarray(samples)[..., 0]
    emp_cov = np.cov(emp.T)
    assert_allclose(emp_cov, cov_np, atol=0.05)


import pytest


@pytest.mark.parametrize("engine", ["fisher", "koopman"])
def test_gpr_analytic_grad_engines_match_autodiff(rng, engine):
    """grad_engine "fisher"/"koopman" must give the same loss AND the same
    hyperparameter gradients as autodiff through the scan pipeline (the
    antisymmetric Q-cotangent ambiguity cancels through the kernels'
    symmetric Q construction).  Time points are well separated: the Fisher
    form loses (F, Q)-gradient accuracy when dt -> 0 makes Q near-singular
    (see ops.fisher docstring; the Koopman engine has no such restriction)."""
    x = np.sort(np.linspace(0.0, 4.0, 40) + rng.uniform(0.0, 0.03, 40))
    y = np.sin(2 * x) + 0.1 * rng.standard_normal(40)
    model_ad = make_model(x, y).replace(grad_engine="autodiff")
    model_fi = model_ad.replace(grad_engine=engine)

    loss_ad, g_ad = jax.value_and_grad(lambda m: LOSS(m))(model_ad)
    loss_fi, g_fi = jax.value_and_grad(lambda m: LOSS(m))(model_fi)
    assert_allclose(float(loss_fi), float(loss_ad), rtol=1e-12)
    la = jax.tree_util.tree_leaves(g_ad)
    lf = jax.tree_util.tree_leaves(g_fi)
    assert len(la) == len(lf)
    for a, f in zip(la, lf):
        assert_allclose(np.asarray(f), np.asarray(a), atol=1e-8, rtol=1e-8)


def test_gpr_posterior_finite_on_dense_random_grid(rng):
    """Regression: random dense grids reach near-coincident time points
    (min dt ~ span/n^2), where the posterior-SSM extraction's
    Q_post = P_{k+1} - A Cov(x_k, x_{k+1}) cancels below f64 roundoff and
    used to go slightly negative -> NaN through the Cholesky.  The
    pivot-clamped psd_cholesky must keep every posterior quantity finite
    and still match the dense-GP oracle away from the degenerate gaps."""
    n = 3000
    x = np.sort(rng.uniform(0, 10, n))
    assert np.diff(x).min() < 1e-5  # the regression's trigger regime
    y = np.sin(2 * x) + 0.1 * rng.standard_normal(n)
    model = make_model(x, y)
    x_new = np.linspace(-1.0, 11.0, 23)
    f_mean, f_var = PREDICT_F(model, jnp.asarray(x_new))
    assert np.isfinite(np.asarray(f_mean)).all()
    assert np.isfinite(np.asarray(f_var)).all()
    assert (np.asarray(f_var) >= -1e-9).all()
    # spot-check the interior against the dense oracle on a subsample (the
    # full 3000-point dense Gram is well-conditioned at f64)
    sub = np.arange(0, n, 30)
    mean_o, cov_o, _ = dense_gp_posterior(x[sub], y[sub], x_new)
    model_sub = make_model(x[sub], y[sub])
    f_mean_s, _ = PREDICT_F(model_sub, jnp.asarray(x_new))
    assert_allclose(np.asarray(f_mean_s)[:, 0], mean_o, atol=1e-6)
