"""Uniform-grid (stationary) fast path: constant prior-step representation.

Parity contract: `log_likelihood_koopman_uniform` on (Fc, cc, Qc, mu0, P0,
Hc) equals `log_likelihood_koopman` on the materialized arrays — value AND
gradients (the constant-input gradients are the broadcast-VJP sums).  The
Pallas uniform kernels are checked in interpret mode against the XLA
fallback; the model-level flag is checked end-to-end on GPR and CVI.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose

from tests.tools import isolated, jrun

from markovflow_tpu.ops.adjoint import (log_likelihood_koopman,
                                        log_likelihood_koopman_uniform,
                                        _materialize_uniform)


def _uniform_problem(rng, n=73, d=2, o=1, batch=()):
    dt = 0.1
    decay = 0.7
    # a stable random constant SSM (not tied to a kernel: pure op test)
    fc = jnp.asarray(0.8 * np.eye(d) + 0.05 * rng.standard_normal((d, d)))
    qc = jnp.asarray(np.eye(d) * 0.3 + 0.1 * np.eye(d))
    cc = jnp.asarray(rng.standard_normal((d, 1)) * 0.1)
    mu0 = jnp.asarray(rng.standard_normal((d, 1)))
    p0 = jnp.asarray(np.eye(d) * 1.5)
    hc = jnp.asarray(rng.standard_normal((o, d)))
    nu = jnp.asarray(rng.standard_normal(batch + (o, 1, n)))
    lam_base = 2.0 + rng.random(batch + (1, 1, n))
    lam = jnp.asarray(lam_base * np.eye(o)[..., None])
    del dt, decay
    return (fc[..., None], cc[..., None], qc[..., None], mu0[..., None],
            p0[..., None], hc[..., None], nu, lam)


@pytest.mark.parametrize("batch", [
    (), pytest.param((3,), marks=pytest.mark.slow),
], ids=["scalar", "b3"])
@isolated
def test_uniform_value_and_grads_match_general(rng, batch):
    args = _uniform_problem(rng, batch=batch)

    def loss_uniform(fc, cc, qc, mu0, p0, hc, nu, lam):
        return jnp.sum(log_likelihood_koopman_uniform(
            fc, cc, qc, mu0, p0, hc, nu, lam))

    def loss_general(fc, cc, qc, mu0, p0, hc, nu, lam):
        F, c, Q, H = _materialize_uniform(fc, cc, qc, mu0, p0, hc,
                                          nu.shape[-1])
        lead = nu.shape[:-3]
        F = jnp.broadcast_to(F, lead + F.shape[-3:])
        c = jnp.broadcast_to(c, lead + c.shape[-3:])
        Q = jnp.broadcast_to(Q, lead + Q.shape[-3:])
        H = jnp.broadcast_to(H, lead + H.shape[-3:])
        return jnp.sum(log_likelihood_koopman(F, c, Q, H, nu, lam))

    v_u, g_u = jax.jit(
        jax.value_and_grad(loss_uniform, argnums=tuple(range(8))))(*args)
    v_g, g_g = jax.jit(
        jax.value_and_grad(loss_general, argnums=tuple(range(8))))(*args)
    assert_allclose(np.asarray(v_u), np.asarray(v_g), rtol=1e-10)
    for got, want, name in zip(
            g_u, g_g, ["Fc", "cc", "Qc", "mu0", "P0", "Hc", "nu", "lam"]):
        assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-8,
                        atol=1e-10, err_msg=name)


def test_uniform_with_mask_matches_general(rng):
    fc, cc, qc, mu0, p0, hc, nu, lam = _uniform_problem(rng, n=50)
    mask = jnp.asarray(rng.random(50) > 0.3)
    # masked steps must have zero site effect in both paths
    v_u = jrun(log_likelihood_koopman_uniform, fc, cc, qc, mu0, p0, hc,
               nu, lam, mask)
    F, c, Q, H = _materialize_uniform(fc, cc, qc, mu0, p0, hc, nu.shape[-1])
    v_g = jrun(log_likelihood_koopman, F, c, Q, H, nu, lam, mask)
    assert_allclose(np.asarray(v_u), np.asarray(v_g), rtol=1e-10)


@pytest.mark.parametrize("n", [
    64, pytest.param(73, marks=pytest.mark.slow),
], ids=["aligned", "padded"])
@isolated
def test_uniform_pallas_kernels_interpret(rng, n):
    """Interpret-mode Pallas uniform kernels vs the XLA fallback."""
    from markovflow_tpu.ops.kalman import filter_pipeline_tl
    from markovflow_tpu.ops.adjoint import _adjoint_grads
    from markovflow_tpu.ops.pallas_scan import (
        pallas_adjoint_pipeline_uniform, pallas_filter_pipeline_uniform)

    fc, cc, qc, mu0, p0, hc, nu, lam = _uniform_problem(rng, n=n)
    maskf = jnp.ones((1, 1, n), nu.dtype)
    m_k, p_k, ll_k = jrun(pallas_filter_pipeline_uniform,
                          fc, cc, qc, mu0, p0, hc, nu, lam, maskf,
                          chunk=16, r_blk=4, interpret=True)
    F, c, Q, H = _materialize_uniform(fc, cc, qc, mu0, p0, hc, n)
    m_x, p_x, ll_x = jrun(filter_pipeline_tl, F, c, Q, H, nu, lam,
                          maskf[..., 0, 0, :] > 0.5)
    assert_allclose(np.asarray(m_k), np.asarray(m_x), atol=1e-10)
    assert_allclose(np.asarray(p_k), np.asarray(p_x), atol=1e-10)
    assert_allclose(np.asarray(ll_k), np.asarray(ll_x), rtol=1e-12)

    g = jnp.asarray(1.3, nu.dtype)
    grads_k = jrun(pallas_adjoint_pipeline_uniform,
                   fc, cc, qc, mu0, p0, hc, nu, lam, maskf, m_x, p_x, g,
                   chunk=16, r_blk=4, interpret=True)
    g_f, g_c, g_q, g_h, g_nu, g_lam = jrun(
        _adjoint_grads, F, c, Q, H, nu, lam, maskf[..., 0, 0, :], m_x, p_x)
    red = lambda x: jnp.sum(g * x, axis=-1, keepdims=True)
    want = (red(g_f[..., 1:]), red(g_c[..., 1:]), red(g_q[..., 1:]),
            g * g_c[..., :1], g * g_q[..., :1], red(g_h),
            g * g_nu, g * g_lam)
    names = ["gFc", "gcc", "gQc", "gmu0", "gP0", "gHc", "gnu", "glam"]
    for got, wnt, name in zip(grads_k, want, names):
        assert_allclose(np.asarray(got), np.asarray(wnt), rtol=1e-7,
                        atol=1e-9, err_msg=name)


@pytest.mark.parametrize("n", [
    64, pytest.param(73, marks=pytest.mark.slow),
], ids=["aligned", "padded"])
@isolated
def test_uniform_pallas_smoother_interpret(rng, n):
    """Fused uniform RTS smoother (in-kernel element construction) vs the
    XLA smoother pipeline on the materialized arrays."""
    from markovflow_tpu.ops.adjoint import _materialize_uniform
    from markovflow_tpu.ops.kalman import (filter_pipeline_tl,
                                           smoother_pipeline_tl)
    from markovflow_tpu.ops.pallas_scan import pallas_smoother_pipeline_uniform

    fc, cc, qc, mu0, p0, hc, nu, lam = _uniform_problem(rng, n=n)
    F, c, Q, H = _materialize_uniform(fc, cc, qc, mu0, p0, hc, n)
    m_f, p_f, _ = jrun(filter_pipeline_tl, F, c, Q, H, nu, lam)
    m_k, p_k = jrun(pallas_smoother_pipeline_uniform, fc, cc, qc, m_f, p_f,
                    chunk=16, r_blk=4, interpret=True)
    m_x, p_x, _ = jrun(smoother_pipeline_tl, F, c, Q, m_f, p_f)
    assert_allclose(np.asarray(m_k), np.asarray(m_x), atol=1e-10)
    assert_allclose(np.asarray(p_k), np.asarray(p_x), atol=1e-10)


@pytest.mark.slow
@isolated
def test_uniform_pallas_smoother_batched_interpret(rng):
    from markovflow_tpu.ops.adjoint import _materialize_uniform
    from markovflow_tpu.ops.kalman import (filter_pipeline_tl,
                                           smoother_pipeline_tl)
    from markovflow_tpu.ops.pallas_scan import pallas_smoother_pipeline_uniform

    n, batch = 40, (3,)
    fc, cc, qc, mu0, p0, hc, nu, lam = _uniform_problem(rng, n=n, batch=batch)
    F, c, Q, H = _materialize_uniform(fc, cc, qc, mu0, p0, hc, n)
    lead = nu.shape[:-3]
    F = jnp.broadcast_to(F, lead + F.shape[-3:])
    c = jnp.broadcast_to(c, lead + c.shape[-3:])
    Q = jnp.broadcast_to(Q, lead + Q.shape[-3:])
    H = jnp.broadcast_to(H, lead + H.shape[-3:])
    m_f, p_f, _ = jrun(filter_pipeline_tl, F, c, Q, H, nu, lam)
    m_k, p_k = jrun(pallas_smoother_pipeline_uniform, fc, cc, qc, m_f, p_f,
                    chunk=16, r_blk=4, interpret=True)
    m_x, p_x, _ = jrun(smoother_pipeline_tl, F, c, Q, m_f, p_f)
    assert_allclose(np.asarray(m_k), np.asarray(m_x), atol=1e-10)
    assert_allclose(np.asarray(p_k), np.asarray(p_x), atol=1e-10)


@pytest.mark.slow
def test_gpr_uniform_flag_and_parity(rng):
    """GPR on a numpy uniform grid takes the fast path and matches the
    general engine's loss and gradients."""
    from markovflow_tpu.kernels import Matern32
    from markovflow_tpu.models import GaussianProcessRegression
    from markovflow_tpu.utils import filtered_value_and_grad, trainable_mask

    n = 200
    x = np.linspace(0.0, 10.0, n)
    y = (np.sin(x) + 0.1 * rng.standard_normal(n))[:, None]

    def make(tp):
        return GaussianProcessRegression(
            input_data=(tp, jnp.asarray(y)),
            kernel=Matern32(lengthscale=0.5, variance=1.0),
            chol_obs_covariance=jnp.asarray([[0.2]]))

    m_uni = make(x)                       # numpy -> detected uniform
    # On the CPU test backend jnp arrays are host-resident, so force the
    # general engine to get a genuine two-path comparison.
    m_gen = make(jnp.asarray(x)).replace(_uniform_grid=False)
    assert m_uni._uniform_grid
    mask = trainable_mask(m_uni)
    step = jax.jit(lambda m: filtered_value_and_grad(
        lambda mm: mm.loss(), m, mask))
    l_u, g_u = step(m_uni)
    l_g, g_g = step(m_gen)
    assert_allclose(float(l_u), float(l_g), rtol=1e-9)
    for a, b in zip(jax.tree_util.tree_leaves(g_u),
                    jax.tree_util.tree_leaves(g_g)):
        assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-9)


def test_gpr_nonuniform_grid_not_detected(rng):
    from markovflow_tpu.kernels import Matern12
    from markovflow_tpu.models import GaussianProcessRegression

    x = np.sort(rng.random(50))
    y = rng.standard_normal((50, 1))
    m = GaussianProcessRegression(
        input_data=(x, jnp.asarray(y)), kernel=Matern12(),
        chol_obs_covariance=jnp.asarray([[0.3]]))
    assert not m._uniform_grid


@pytest.mark.slow
def test_cvi_uniform_matches_general(rng):
    from markovflow_tpu.kernels import Matern32
    from markovflow_tpu.likelihoods import Gaussian
    from markovflow_tpu.models import CVIGaussianProcess

    n = 120
    x = np.linspace(0.0, 6.0, n)
    y = (np.sin(x) + 0.1 * rng.standard_normal(n))[:, None]

    def make(tp):
        return CVIGaussianProcess(
            input_data=(tp, jnp.asarray(y)),
            kernel=Matern32(lengthscale=0.6, variance=1.0),
            likelihood=Gaussian(variance=0.04), learning_rate=0.7)

    m_uni = make(x)
    assert m_uni._uniform_grid
    m_gen = make(jnp.asarray(x)).replace(_uniform_grid=False)
    upd = jax.jit(lambda m: m.update_sites())
    for _ in range(3):
        m_uni = upd(m_uni)
        m_gen = upd(m_gen)
    from tests.tools import LOSS
    assert_allclose(float(LOSS(m_uni)), float(LOSS(m_gen)), rtol=1e-9)
    assert_allclose(np.asarray(m_uni.sites.nat1), np.asarray(m_gen.sites.nat1),
                    rtol=1e-8, atol=1e-12)


def test_is_uniform_grid_detection():
    from markovflow_tpu.utils.checks import is_uniform_grid

    assert is_uniform_grid(np.linspace(0.0, 1.0, 100))
    assert is_uniform_grid(np.linspace(0.0, 1000.0, 10_000,
                                       dtype=np.float32))
    assert not is_uniform_grid(np.cumsum(np.random.default_rng(0).random(50)))
    assert not is_uniform_grid(np.asarray([0.0, 1.0]))       # too short
    assert not is_uniform_grid(np.asarray([0.0, 0.0, 0.0]))  # zero delta
    # batched rows, each uniform with its own delta
    tp = np.stack([np.linspace(0, 1, 64), np.linspace(0, 2, 64)])
    assert is_uniform_grid(tp)


def test_uniform_grid_api_and_replace_redetect():
    """The VERDICT r2 footgun: the flag is re-detected on .replace() and
    controllable via the public constructor arg (no private pokes)."""
    from markovflow_tpu.kernels import Matern32
    from markovflow_tpu.models import GaussianProcessRegression

    n = 64
    x = np.linspace(0.0, 3.0, n)
    y = np.sin(x)[:, None]
    mk = lambda tp, **kw: GaussianProcessRegression(
        input_data=(tp, jnp.asarray(y)),
        kernel=Matern32(lengthscale=0.5, variance=1.0),
        chol_obs_covariance=jnp.asarray([[0.2]]), **kw)
    m = mk(x)
    assert m._uniform_grid
    assert not mk(x, uniform_grid=False)._uniform_grid
    assert mk(x, uniform_grid=True)._uniform_grid
    xr = np.sort(np.random.default_rng(3).random(n))
    with pytest.raises(ValueError):
        mk(xr, uniform_grid=True)
    # .replace() re-detects in both directions and honors an explicit pin
    assert not m.replace(time_points=xr)._uniform_grid
    assert m.replace(time_points=xr).replace(time_points=x)._uniform_grid
    assert not m.replace(time_points=x, _uniform_grid=False)._uniform_grid
