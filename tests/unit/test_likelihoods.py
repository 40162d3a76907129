"""Per-likelihood unit tests: closed-form values, quadrature vs brute-force
numerical integration, moment identities (reference pattern:
gpflow's likelihood tests, used implicitly by markovflow's model tests)."""
import jax
import jax.numpy as jnp
import numpy as np
import scipy.integrate
import scipy.stats
from numpy.testing import assert_allclose

from markovflow_tpu.likelihoods import (
    Bernoulli,
    Gaussian,
    MultivariateGaussian,
    Poisson,
    StudentT,
    inv_probit,
)
from markovflow_tpu.likelihoods.multistage import MultiStageLikelihood
from markovflow_tpu.likelihoods.pep import PEPGaussian, PEPScalarLikelihood


def numeric_ve(lik, mu, var, y):
    """Brute-force E_{f~N(mu,var)}[log p(y|f)] by adaptive quadrature."""
    def integrand(f):
        lp = float(lik.log_probability_density(
            jnp.asarray([[f]]), jnp.asarray([[y]]))[0])
        return lp * scipy.stats.norm.pdf(f, mu, np.sqrt(var))
    lo, hi = mu - 12 * np.sqrt(var), mu + 12 * np.sqrt(var)
    return scipy.integrate.quad(integrand, lo, hi, limit=200)[0]


def numeric_pd(lik, mu, var, y):
    """log E_{f~N(mu,var)}[p(y|f)]."""
    def integrand(f):
        lp = float(lik.log_probability_density(
            jnp.asarray([[f]]), jnp.asarray([[y]]))[0])
        return np.exp(lp) * scipy.stats.norm.pdf(f, mu, np.sqrt(var))
    lo, hi = mu - 12 * np.sqrt(var), mu + 12 * np.sqrt(var)
    return np.log(scipy.integrate.quad(integrand, lo, hi, limit=200)[0])


MU, VAR = 0.4, 0.3


def test_gaussian_closed_forms():
    lik = Gaussian(variance=0.25)
    y, f = 0.7, 0.2
    lp = float(lik.log_probability_density(jnp.asarray([[f]]),
                                           jnp.asarray([[y]]))[0])
    assert_allclose(lp, scipy.stats.norm.logpdf(y, f, 0.5), rtol=1e-9)
    ve = float(lik.variational_expectations(
        jnp.asarray([[MU]]), jnp.asarray([[VAR]]), jnp.asarray([[y]]))[0])
    assert_allclose(ve, numeric_ve(lik, MU, VAR, y), rtol=1e-7)
    pd = float(lik.predict_density(
        jnp.asarray([[MU]]), jnp.asarray([[VAR]]), jnp.asarray([[y]]))[0])
    assert_allclose(pd, scipy.stats.norm.logpdf(y, MU, np.sqrt(VAR + 0.25)),
                    rtol=1e-9)
    m, v = lik.predict_mean_and_var(jnp.asarray([[MU]]), jnp.asarray([[VAR]]))
    assert_allclose(float(m[0, 0]), MU)
    assert_allclose(float(v[0, 0]), VAR + 0.25)


def test_bernoulli_quadrature_and_moments():
    lik = Bernoulli()
    for y in (0.0, 1.0):
        ve = float(lik.variational_expectations(
            jnp.asarray([[MU]]), jnp.asarray([[VAR]]), jnp.asarray([[y]]))[0])
        assert_allclose(ve, numeric_ve(lik, MU, VAR, y), rtol=1e-6)
    # probit closed-form predictive mean: Phi(mu / sqrt(1 + var)) with the
    # gpflow jitter convention baked into inv_probit
    p, v = lik.predict_mean_and_var(jnp.asarray([[MU]]), jnp.asarray([[VAR]]))
    expected_p = float(inv_probit(jnp.asarray(MU / np.sqrt(1 + VAR))))
    assert_allclose(float(p[0, 0]), expected_p, rtol=1e-9)
    assert_allclose(float(v[0, 0]), expected_p - expected_p**2, rtol=1e-9)


def test_poisson_analytic_ve_matches_quadrature():
    lik = Poisson(binsize=1.5)
    y = 3.0
    lp = float(lik.log_probability_density(jnp.asarray([[MU]]),
                                           jnp.asarray([[y]]))[0])
    assert_allclose(lp, scipy.stats.poisson.logpmf(3, np.exp(MU) * 1.5),
                    rtol=1e-9)
    ve = float(lik.variational_expectations(
        jnp.asarray([[MU]]), jnp.asarray([[VAR]]), jnp.asarray([[y]]))[0])
    assert_allclose(ve, numeric_ve(lik, MU, VAR, y), rtol=1e-7)
    m, v = lik.predict_mean_and_var(jnp.asarray([[MU]]), jnp.asarray([[VAR]]))
    mean_expected = np.exp(MU + VAR / 2) * 1.5
    assert_allclose(float(m[0, 0]), mean_expected, rtol=1e-9)
    assert_allclose(float(v[0, 0]),
                    mean_expected + (np.exp(VAR) - 1) * mean_expected**2,
                    rtol=1e-9)


def test_studentt_value_and_quadrature():
    lik = StudentT(scale=0.8, df=4.0)
    y, f = 1.1, 0.3
    lp = float(lik.log_probability_density(jnp.asarray([[f]]),
                                           jnp.asarray([[y]]))[0])
    assert_allclose(lp, scipy.stats.t.logpdf(y, 4.0, loc=f, scale=0.8),
                    rtol=1e-9)
    ve = float(lik.variational_expectations(
        jnp.asarray([[MU]]), jnp.asarray([[VAR]]), jnp.asarray([[y]]))[0])
    assert_allclose(ve, numeric_ve(lik, MU, VAR, y), rtol=1e-5)
    m, v = lik.predict_mean_and_var(jnp.asarray([[MU]]), jnp.asarray([[VAR]]))
    assert_allclose(float(v[0, 0]), VAR + 0.8**2 * 4.0 / 2.0, rtol=1e-9)


def test_multivariate_gaussian_matches_scipy(rng):
    d = 3
    a = rng.standard_normal((d, d))
    chol = np.linalg.cholesky(a @ a.T + d * np.eye(d))
    lik = MultivariateGaussian(jnp.asarray(chol))
    f = rng.standard_normal((1, d))
    y = rng.standard_normal((1, d))
    lp = float(lik.log_probability_density(jnp.asarray(f), jnp.asarray(y))[0])
    assert_allclose(
        lp, scipy.stats.multivariate_normal.logpdf(y[0], f[0], chol @ chol.T),
        rtol=1e-9)
    # analytic VE: E[log N(y; f, S)] under f ~ N(mu, C)
    #            = log N(y; mu, S) - 0.5 tr(S^{-1} C)
    mu = rng.standard_normal((1, d))
    cmat = rng.standard_normal((d, d))
    cov = cmat @ cmat.T + np.eye(d)
    ve = float(lik.variational_expectations(
        jnp.asarray(mu), jnp.asarray(cov[None]), jnp.asarray(y))[0])
    s_full = chol @ chol.T
    expected = (scipy.stats.multivariate_normal.logpdf(y[0], mu[0], s_full)
                - 0.5 * np.trace(np.linalg.solve(s_full, cov)))
    assert_allclose(ve, expected, rtol=1e-8)
    # predictive density of the analytic form
    pd = float(lik.predict_density(
        jnp.asarray(mu), jnp.asarray(cov[None]), jnp.asarray(y))[0])
    assert_allclose(
        pd, scipy.stats.multivariate_normal.logpdf(y[0], mu[0], s_full + cov),
        rtol=1e-8)


def test_multistage_log_prob_normalizes(rng):
    """Sum of p(y) over the support ~= 1 for fixed latents; sample_y moments
    match the analytic branch probabilities (Seeger et al. 2016 structure)."""
    lik = MultiStageLikelihood()
    f = jnp.asarray(rng.standard_normal((1, 3)) * 0.5)
    ys = np.arange(0, 60)
    total = sum(
        float(jnp.exp(lik.log_probability_density(f, jnp.asarray([[y]]))[0]))
        for y in ys)
    assert_allclose(total, 1.0, atol=1e-6)
    # p(y = 0) = invlink(f0)
    p0 = float(jnp.exp(lik.log_probability_density(f, jnp.asarray([[0.0]]))[0]))
    assert_allclose(p0, float(inv_probit(f[0, 0])), rtol=1e-7)
    keys = jax.random.split(jax.random.PRNGKey(0), 4000)
    samples = np.array([
        float(lik.sample_y(k, f)[0]) for k in keys[:500]])
    assert abs((samples == 0).mean() - p0) < 0.08


def test_pep_scalar_led_matches_numeric_and_gaussian_analytic():
    base = Gaussian(variance=0.09)
    pep_q = PEPScalarLikelihood(base)
    pep_a = PEPGaussian(base)
    y = 0.5
    for alpha in (1.0, 0.5):
        led_q = float(pep_q.log_expected_density(
            jnp.asarray([[MU]]), jnp.asarray([[VAR]]), jnp.asarray([[y]]),
            alpha=alpha)[0])
        led_a = float(pep_a.log_expected_density(
            jnp.asarray([[MU]]), jnp.asarray([[VAR]]), jnp.asarray([[y]]),
            alpha=alpha)[0])
        # log E[N(y; f, s2)^alpha] under f ~ N(mu, var), analytic:
        #   alpha-power of a Gaussian is an unnormalized Gaussian
        s2 = 0.09
        log_z = (0.5 * (1 - alpha) * np.log(2 * np.pi * s2)
                 - 0.5 * np.log(alpha))
        expected = (log_z - 0.5 * np.log(2 * np.pi * (s2 / alpha + VAR))
                    - 0.5 * (y - MU) ** 2 / (s2 / alpha + VAR))
        assert_allclose(led_a, expected, rtol=1e-8)
        assert_allclose(led_q, expected, rtol=1e-4)
        # gradients: quadrature vs analytic
        g_q = pep_q.grad_log_expected_density(
            jnp.asarray([[MU]]), jnp.asarray([[VAR]]), jnp.asarray([[y]]),
            alpha=alpha)
        g_a = pep_a.grad_log_expected_density(
            jnp.asarray([[MU]]), jnp.asarray([[VAR]]), jnp.asarray([[y]]),
            alpha=alpha)
        for qq, aa in zip(g_q, g_a):
            assert_allclose(np.asarray(qq), np.asarray(aa), rtol=2e-2,
                            atol=1e-3)
