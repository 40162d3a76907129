"""Fisher-identity VJP vs autodiff through the scan pipeline."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose

from markovflow_tpu.ops import kalman as K
from markovflow_tpu.ops.fisher import log_likelihood_fisher
from tests.tools import numpy_kalman as npk


def _tl_inputs(rng, t_len, d, o=1, batch=()):
    mu0, l0, A, b, lq = npk.random_ssm(rng, t_len, d)
    H = rng.standard_normal((o, d))
    R = np.eye(o) * 0.3 + 0.1 * np.ones((o, o))
    ys = rng.standard_normal(batch + (t_len + 1, o))
    from markovflow_tpu import StateSpaceModel
    ssm = StateSpaceModel(*[jnp.asarray(v) for v in (mu0, l0, A, b, lq)])
    F, c, Q = K.prior_step_arrays(ssm)
    r_inv = np.linalg.inv(R)
    lam = jnp.broadcast_to(jnp.asarray(r_inv), batch + (t_len + 1, o, o))
    nu = jnp.asarray(ys @ r_inv.T)
    Hs = jnp.broadcast_to(jnp.asarray(H), batch + (t_len + 1, o, d))
    to_tl = lambda x: jnp.moveaxis(x, -3, -1)
    bc = lambda x: jnp.broadcast_to(x, batch + x.shape[-3:])
    return (bc(to_tl(F)), bc(to_tl(c[..., None])), bc(to_tl(Q)),
            to_tl(Hs), to_tl(nu[..., None]), to_tl(lam))


@pytest.mark.parametrize("d,o", [
    pytest.param(1, 1, marks=pytest.mark.slow),
    (2, 1),
    pytest.param(2, 2, marks=pytest.mark.slow),
    pytest.param(3, 2, marks=pytest.mark.slow),
])
def test_fisher_grads_match_autodiff(rng, d, o):
    args = _tl_inputs(rng, 61, d, o)

    def ll_ad(*a):
        return K.filter_pipeline_tl(*a)[2]

    def ll_fi(*a):
        return log_likelihood_fisher(*a, engine="xla")

    v_ad, g_ad = jax.jit(jax.value_and_grad(ll_ad, argnums=tuple(range(6))))(*args)
    v_fi, g_fi = jax.jit(jax.value_and_grad(ll_fi, argnums=tuple(range(6))))(*args)
    assert_allclose(float(v_fi), float(v_ad), rtol=1e-12)
    # Q and lam cotangents compared through their symmetric parts: off the
    # symmetric-matrix manifold the two implementations are different
    # extensions of log p(Y) (see module docstring of ops.fisher).
    sym = lambda x: 0.5 * (np.asarray(x) + np.swapaxes(np.asarray(x), -3, -2))
    for i, (ga, gf, name) in enumerate(zip(g_ad, g_fi,
                                           ["F", "c", "Q", "H", "nu", "lam"])):
        if name in ("Q", "lam"):
            ga, gf = sym(ga), sym(gf)
        assert_allclose(np.asarray(gf), np.asarray(ga), atol=1e-7,
                        err_msg=f"grad mismatch for {name}")


@pytest.mark.slow
def test_fisher_grads_match_autodiff_masked(rng):
    args = _tl_inputs(rng, 80, 2, 1)
    n = args[0].shape[-1]
    mask_np = np.zeros(n, bool)
    mask_np[np.sort(rng.choice(n, 30, replace=False))] = True
    mask = jnp.asarray(mask_np)
    # zero the site nats at unobserved steps, as the sparse-sites model does
    keep = jnp.asarray(mask_np)[None, None, :]
    F, c, Q, H, nu, lam = args
    nu = jnp.where(keep, nu, 0.0)
    lam = jnp.where(keep, lam, 0.0)

    def ll_ad(*a):
        return K.filter_pipeline_tl(*a, mask=mask)[2]

    def ll_fi(*a):
        return log_likelihood_fisher(*a, mask=mask, engine="xla")

    args2 = (F, c, Q, H, nu, lam)
    v_ad, g_ad = jax.jit(jax.value_and_grad(ll_ad, argnums=(0, 1, 2)))(*args2)
    v_fi, g_fi = jax.jit(jax.value_and_grad(ll_fi, argnums=(0, 1, 2)))(*args2)
    assert_allclose(float(v_fi), float(v_ad), rtol=1e-12)
    # Q cotangents are compared through their symmetric part: off the
    # symmetric-matrix manifold the two implementations are different
    # extensions of log p(Y), so the antisymmetric components differ; only
    # symmetric Q-perturbations are reachable from kernel hyperparameters.
    sym = lambda x: 0.5 * (np.asarray(x) + np.swapaxes(np.asarray(x), -3, -2))
    for ga, gf, name in zip(g_ad[:2], g_fi[:2], ["F", "c"]):
        assert_allclose(np.asarray(gf), np.asarray(ga), atol=1e-7,
                        err_msg=f"grad mismatch for {name}")
    assert_allclose(sym(g_fi[2]), sym(g_ad[2]), atol=1e-7,
                    err_msg="grad mismatch for Q (symmetric part)")
    # observation grads at OBSERVED steps also match
    g_ad_obs = jax.jit(jax.grad(ll_ad, argnums=(4, 5)))(*args2)
    g_fi_obs = jax.jit(jax.grad(ll_fi, argnums=(4, 5)))(*args2)
    for ga, gf, name in zip(g_ad_obs, g_fi_obs, ["nu", "lam"]):
        assert_allclose(np.asarray(gf)[..., mask_np],
                        np.asarray(ga)[..., mask_np], atol=1e-7,
                        err_msg=f"observed-step grad mismatch for {name}")


@pytest.mark.slow
def test_fisher_grads_batched(rng):
    args = _tl_inputs(rng, 40, 2, 1, batch=(3,))

    def ll_ad(*a):
        return jnp.sum(K.filter_pipeline_tl(*a)[2])

    def ll_fi(*a):
        return jnp.sum(log_likelihood_fisher(*a, engine="xla"))

    g_ad = jax.jit(jax.grad(ll_ad, argnums=(0, 1, 2, 4)))(*args)
    g_fi = jax.jit(jax.grad(ll_fi, argnums=(0, 1, 2, 4)))(*args)
    # Q compared through its symmetric part (see the masked test above).
    sym = lambda x: 0.5 * (np.asarray(x) + np.swapaxes(np.asarray(x), -3, -2))
    for i, (ga, gf) in enumerate(zip(g_ad, g_fi)):
        if i == 2:
            ga, gf = sym(ga), sym(gf)
        assert_allclose(np.asarray(gf), np.asarray(ga), atol=1e-7)
