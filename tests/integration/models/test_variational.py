"""VGP + natural gradients vs GPR
(pattern: reference tests/integration/test_ssm_natgrad.py:46-66)."""
import jax
import jax.numpy as jnp
import numpy as np
from numpy.testing import assert_allclose

from markovflow_tpu.kernels import Matern32
from markovflow_tpu.likelihoods import Gaussian
from markovflow_tpu.models import GaussianProcessRegression
from markovflow_tpu.models.variational import VariationalGaussianProcess
from markovflow_tpu.ssm_natgrad import SSMNaturalGradient
from tests.tools import ELBO, LOGLIK, PREDICT_F

NOISE = 0.3


def make_data(rng, n=12):
    x = np.sort(rng.uniform(0, 5, n))
    y = np.sin(2 * x) + 0.1 * rng.standard_normal(n)
    return jnp.asarray(x), jnp.asarray(y[:, None])


def test_vgp_natgrad_one_step_recovers_gpr(rng):
    """With a Gaussian likelihood, one natgrad step with gamma=1 lands q at
    the exact posterior, so ELBO == GPR log marginal likelihood."""
    x, y = make_data(rng)
    kernel = Matern32(lengthscale=0.7, variance=1.2)
    lik = Gaussian(variance=NOISE**2)
    vgp = VariationalGaussianProcess((x, y), kernel, lik)
    gpr = GaussianProcessRegression(
        (x, y), Matern32(lengthscale=0.7, variance=1.2),
        jnp.asarray([[NOISE]]))

    opt = SSMNaturalGradient(gamma=1.0, momentum=False)

    def loss_of_ssm(ssm):
        return vgp.with_dist_q(ssm).loss()

    ssm0 = vgp.dist_q.non_trainable_copy()
    ssm1, _, _ = opt.step(loss_of_ssm, ssm0)
    elbo_after = float(vgp.with_dist_q(ssm1).elbo())
    gpr_ll = float(LOGLIK(gpr))
    assert_allclose(elbo_after, gpr_ll, rtol=1e-8)

    # and it is a fixed point: another step doesn't move the ELBO
    ssm2, _, _ = opt.step(loss_of_ssm, ssm1)
    assert_allclose(float(vgp.with_dist_q(ssm2).elbo()), gpr_ll, rtol=1e-8)


def test_vgp_elbo_lower_bounds_gpr(rng):
    x, y = make_data(rng)
    kernel = Matern32(lengthscale=0.7, variance=1.2)
    vgp = VariationalGaussianProcess((x, y), kernel,
                                     Gaussian(variance=NOISE**2))
    gpr = GaussianProcessRegression((x, y),
                                    Matern32(lengthscale=0.7, variance=1.2),
                                    jnp.asarray([[NOISE]]))
    assert float(ELBO(vgp)) <= float(LOGLIK(gpr)) + 1e-8


def test_vgp_posterior_matches_gpr_after_natgrad(rng):
    x, y = make_data(rng)
    kernel = Matern32(lengthscale=0.7, variance=1.2)
    vgp = VariationalGaussianProcess((x, y), kernel,
                                     Gaussian(variance=NOISE**2))
    gpr = GaussianProcessRegression((x, y),
                                    Matern32(lengthscale=0.7, variance=1.2),
                                    jnp.asarray([[NOISE]]))
    opt = SSMNaturalGradient(gamma=1.0)
    ssm1, _, _ = opt.step(lambda s: vgp.with_dist_q(s).loss(),
                          vgp.dist_q.non_trainable_copy())
    vgp_opt = vgp.with_dist_q(ssm1)
    x_new = jnp.asarray([0.3, 1.9, 4.2])
    f_v, v_v = PREDICT_F(vgp_opt, x_new)
    f_g, v_g = PREDICT_F(gpr, x_new)
    assert_allclose(np.asarray(f_v), np.asarray(f_g), atol=1e-7)
    assert_allclose(np.asarray(v_v), np.asarray(v_g), atol=1e-7)


def test_vgp_bernoulli_classification_trains(rng):
    """VGP with Bernoulli likelihood (BASELINE config 2): ELBO improves under
    natgrad steps."""
    from markovflow_tpu.likelihoods import Bernoulli

    x = jnp.asarray(np.linspace(0, 6, 30))
    labels = (np.sin(np.asarray(x)) > 0).astype(float)[:, None]
    vgp = VariationalGaussianProcess((x, jnp.asarray(labels)),
                                     Matern32(lengthscale=1.0, variance=3.0),
                                     Bernoulli())
    opt = SSMNaturalGradient(gamma=0.5)
    ssm = vgp.dist_q.non_trainable_copy()
    loss_fn = lambda s: vgp.with_dist_q(s).loss()
    e0 = float(vgp.with_dist_q(ssm).elbo())
    state = None
    for _ in range(10):
        ssm, state, _ = opt.step(loss_fn, ssm, state)
    e1 = float(vgp.with_dist_q(ssm).elbo())
    assert e1 > e0 + 1.0
    # predictions separate the classes
    p, _ = vgp.with_dist_q(ssm).posterior.predict_y(x)
    acc = float(jnp.mean((np.asarray(p)[:, 0] > 0.5) == (labels[:, 0] > 0.5)))
    assert acc > 0.9


def test_vgp_natgrad_parallel_engine_matches_sequential(rng):
    """naturals_engine="parallel" (O(log N) synthetic-model reduction) takes
    the same natgrad step as the sequential UDU path."""
    x, y = make_data(rng, n=20)
    kernel = Matern32(lengthscale=0.7, variance=1.2)
    lik = Gaussian(variance=NOISE**2)
    vgp = VariationalGaussianProcess((x, y), kernel, lik)
    gpr = GaussianProcessRegression(
        (x, y), Matern32(lengthscale=0.7, variance=1.2),
        jnp.asarray([[NOISE]]))

    def loss_of_ssm(ssm):
        return vgp.with_dist_q(ssm).loss()

    ssm0 = vgp.dist_q.non_trainable_copy()
    seq = SSMNaturalGradient(gamma=0.6)
    par = SSMNaturalGradient(gamma=0.6, naturals_engine="parallel")
    ssm_s, _, _ = seq.step(loss_of_ssm, ssm0)
    ssm_p, _, _ = par.step(loss_of_ssm, ssm0)
    # atol tracks the conditioning of the theta -> SSM inversion, not f64
    # roundoff: theta carries Q^{-1}-scaled entries, so the two engines'
    # different reduction bracketings legitimately differ at ~1e-7.
    for a, b in zip(jax.tree_util.tree_leaves(ssm_s),
                    jax.tree_util.tree_leaves(ssm_p)):
        assert_allclose(np.asarray(b), np.asarray(a), atol=2e-6)

    # gamma=1 with the parallel engine still lands exactly on the GPR optimum
    par1 = SSMNaturalGradient(gamma=1.0, naturals_engine="parallel")
    ssm1, _, _ = par1.step(loss_of_ssm, ssm0)
    assert_allclose(float(vgp.with_dist_q(ssm1).elbo()),
                    float(LOGLIK(gpr)), rtol=1e-8)
