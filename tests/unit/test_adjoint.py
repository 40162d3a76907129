"""Koopman (gain-form) analytic score vs autodiff through the scan pipeline."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose

from markovflow_tpu.ops import kalman as K
from markovflow_tpu.ops.adjoint import log_likelihood_koopman
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


SYM = lambda x: 0.5 * (np.asarray(x) + np.swapaxes(np.asarray(x), -3, -2))


def _check(args, mask=None, argnums=tuple(range(6)), atol=1e-7):
    def ll_ad(*a):
        return jnp.sum(K.filter_pipeline_tl(*a, mask=mask)[2])

    def ll_ko(*a):
        return jnp.sum(log_likelihood_koopman(*a, mask=mask))

    # jit the whole comparison: eager op-by-op dispatch costs ~50s/test on
    # this 1-core box vs ~2s traced (the persistent cache absorbs compiles)
    v_ad, g_ad = jax.jit(jax.value_and_grad(ll_ad, argnums=argnums))(*args)
    v_ko, g_ko = jax.jit(jax.value_and_grad(ll_ko, argnums=argnums))(*args)
    assert_allclose(float(v_ko), float(v_ad), rtol=1e-12)
    names = ["F", "c", "Q", "H", "nu", "lam"]
    for i, ga, gk in zip(argnums, g_ad, g_ko):
        name = names[i]
        if name in ("Q", "lam"):
            ga, gk = SYM(ga), SYM(gk)
        assert_allclose(np.asarray(gk), np.asarray(ga), atol=atol,
                        err_msg=f"grad mismatch for {name}")


# fast tier keeps ONE oracle per engine (d=2, o=2); the sweep is the
# nightly-style full tier (compile-dominated: ~25s/config on this host)
@pytest.mark.parametrize("d,o", [
    pytest.param(1, 1, marks=pytest.mark.slow),
    pytest.param(2, 1, marks=pytest.mark.slow),
    (2, 2),
    pytest.param(3, 2, marks=pytest.mark.slow),
    pytest.param(4, 1, marks=pytest.mark.slow),
])
def test_koopman_grads_match_autodiff(rng, d, o):
    _check(_tl_inputs(rng, 61, d, o))


@pytest.mark.slow
def test_koopman_grads_batched(rng):
    _check(_tl_inputs(rng, 40, 2, 1, batch=(3,)), argnums=(0, 1, 2, 4))


@pytest.mark.slow
def test_koopman_grads_masked(rng):
    args = _tl_inputs(rng, 80, 2, 1)
    n = args[0].shape[-1]
    mask_np = np.zeros(n, bool)
    mask_np[np.sort(rng.choice(n, 30, replace=False))] = True
    mask = jnp.asarray(mask_np)
    keep = jnp.asarray(mask_np)[None, None, :]
    F, c, Q, H, nu, lam = args
    nu = jnp.where(keep, nu, 0.0)
    lam = jnp.where(keep, lam, 0.0)
    _check((F, c, Q, H, nu, lam), mask=mask, argnums=(0, 1, 2))


@pytest.mark.slow
def test_koopman_grads_near_singular_q(rng):
    """The regime where the Fisher identity breaks (Q ~ 1e-8): the gain-form
    score must still match autodiff tightly."""
    args = list(_tl_inputs(rng, 50, 2, 1))
    Q = np.array(args[2])
    Q[..., 7] = np.array([[1e-8, 0.0], [0.0, 1e-8]])  # nearly singular step
    Q[..., 23] = np.array([[2e-9, 0.0], [0.0, 5e-1]])
    args[2] = jnp.asarray(Q)
    _check(tuple(args), argnums=(0, 1, 2, 4), atol=1e-6)


@pytest.mark.slow
def test_koopman_grads_exactly_singular_q(rng):
    """Q = 0 at interior steps (Constant/Harmonic kernels): Fisher cannot run
    at all; the gain-form score must match autodiff."""
    args = list(_tl_inputs(rng, 30, 2, 1))
    Q = np.array(args[2])
    Q[..., 11] = 0.0
    Q[..., 19] = 0.0
    args[2] = jnp.asarray(Q)
    _check(tuple(args), argnums=(0, 1, 2), atol=1e-7)
