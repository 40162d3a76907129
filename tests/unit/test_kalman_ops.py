"""Parallel-scan Kalman filter/smoother vs sequential NumPy oracle
(pattern: reference tests/integration/test_kalman_filter.py:105-138)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose

from markovflow_tpu import StateSpaceModel
from markovflow_tpu.ops import kalman as K
from tests.tools import numpy_kalman as npk


def _setup(rng, T=7, d=2, o=1):
    mu0, l0, A, b, lq = npk.random_ssm(rng, T, d)
    P0 = l0 @ l0.T
    Qs = lq @ np.swapaxes(lq, -1, -2)
    H = rng.standard_normal((o, d))
    lr = np.tril(rng.standard_normal((o, o))) + np.eye(o)
    R = lr @ lr.T
    ys = rng.standard_normal((T + 1, o))
    ssm = StateSpaceModel(*[jnp.asarray(x) for x in (mu0, l0, A, b, lq)])
    return ssm, (mu0, P0, A, b, Qs), H, R, ys


def _site_elements(ssm, H, R, ys):
    N = ys.shape[0]
    o = H.shape[0]
    lam = np.broadcast_to(np.linalg.inv(R), (N, o, o))
    nu = np.einsum("op,np->no", np.linalg.inv(R), ys)
    F, c, Q = K.prior_step_arrays(ssm)
    Hs = jnp.broadcast_to(jnp.asarray(H), (N, o, H.shape[-1]))
    return K.make_filter_elements(
        F, c, Q, Hs, jnp.asarray(nu), jnp.asarray(lam)
    ), (F, c, Q)


@pytest.mark.parametrize("o", [1, 2])
def test_parallel_filter_matches_numpy(rng, o):
    ssm, (mu0, P0, A, b, Qs), H, R, ys = _setup(rng, o=o)
    elems, _ = _site_elements(ssm, H, R, ys)
    m_f, p_f = K.parallel_filter(elems)
    mf_np, pf_np, _, _, _ = npk.kalman_filter(mu0, P0, A, b, Qs, H, R, ys)
    assert_allclose(np.asarray(m_f), mf_np, atol=1e-9)
    assert_allclose(np.asarray(p_f), pf_np, atol=1e-9)


def test_sequential_filter_matches_parallel(rng):
    ssm, _, H, R, ys = _setup(rng)
    elems, _ = _site_elements(ssm, H, R, ys)
    m_p, p_p = K.parallel_filter(elems)
    m_s, p_s = K.sequential_filter(elems)
    assert_allclose(np.asarray(m_p), np.asarray(m_s), atol=1e-10)
    assert_allclose(np.asarray(p_p), np.asarray(p_s), atol=1e-10)


def test_log_likelihood_matches_numpy(rng):
    ssm, (mu0, P0, A, b, Qs), H, R, ys = _setup(rng)
    elems, (F, c, Q) = _site_elements(ssm, H, R, ys)
    m_f, p_f = K.parallel_filter(elems)
    m_pred, p_pred = K.predicted_moments(F, c, Q, m_f, p_f)
    _, _, mp_np, pp_np, ll_np = npk.kalman_filter(mu0, P0, A, b, Qs, H, R, ys)
    assert_allclose(np.asarray(m_pred), mp_np, atol=1e-9)
    assert_allclose(np.asarray(p_pred), pp_np, atol=1e-9)
    N, o = ys.shape
    lam = jnp.asarray(np.broadcast_to(np.linalg.inv(R), (N, o, o)))
    nu = jnp.asarray(np.einsum("op,np->no", np.linalg.inv(R), ys))
    Hs = jnp.broadcast_to(jnp.asarray(H), (N, o, H.shape[-1]))
    ll = K.log_likelihood_sites(Hs, nu, lam, m_pred, p_pred)
    assert_allclose(float(ll), ll_np, rtol=1e-10)


def test_parallel_smoother_matches_numpy(rng):
    ssm, (mu0, P0, A, b, Qs), H, R, ys = _setup(rng)
    elems, (F, c, Q) = _site_elements(ssm, H, R, ys)
    m_f, p_f = K.parallel_filter(elems)
    mf_np, pf_np, _, _, _ = npk.kalman_filter(mu0, P0, A, b, Qs, H, R, ys)
    ms_np, ps_np, gains_np = npk.rts_smoother(mf_np, pf_np, A, b, Qs)
    m_s, p_s, gains = K.parallel_smoother(F, c, Q, m_f, p_f)
    assert_allclose(np.asarray(m_s), ms_np, atol=1e-9)
    assert_allclose(np.asarray(p_s), ps_np, atol=1e-9)
    assert_allclose(np.asarray(gains), gains_np, atol=1e-9)
    # sequential agrees
    m_s2, p_s2, _ = K.sequential_smoother(F, c, Q, m_f, p_f)
    assert_allclose(np.asarray(m_s2), np.asarray(m_s), atol=1e-10)
    assert_allclose(np.asarray(p_s2), np.asarray(p_s), atol=1e-10)


def test_posterior_ssm_reproduces_smoothed_marginals(rng):
    """The posterior SSM's own marginals must equal the smoothed moments."""
    ssm, _, H, R, ys = _setup(rng)
    elems, (F, c, Q) = _site_elements(ssm, H, R, ys)
    m_f, p_f = K.parallel_filter(elems)
    m_s, p_s, gains = K.parallel_smoother(F, c, Q, m_f, p_f)
    mu0p, P0p, a_post, b_post, q_post, sub = K.posterior_ssm_params(
        m_s, p_s, gains
    )
    post = StateSpaceModel(
        mu0p, jnp.linalg.cholesky(P0p), a_post, b_post,
        jnp.linalg.cholesky(q_post),
    )
    means, covs = post.marginals
    assert_allclose(np.asarray(means), np.asarray(m_s), atol=1e-8)
    assert_allclose(np.asarray(covs), np.asarray(p_s), atol=1e-8)


def test_sparse_sites_mask(rng):
    """Zero-precision (masked) sites = filtering only the observed subset
    (semantics of KalmanFilterWithSparseSites, reference:
    markovflow/kalman_filter.py:501-626)."""
    T, d, o = 9, 2, 1
    mu0, l0, A, b, lq = npk.random_ssm(rng, T, d)
    P0, Qs = l0 @ l0.T, lq @ np.swapaxes(lq, -1, -2)
    H = rng.standard_normal((o, d))
    R = np.eye(o) * 0.5
    N = T + 1
    obs_idx = np.array([0, 3, 4, 8])
    ys_obs = rng.standard_normal((len(obs_idx), o))
    # Lam-form with zeros at unobserved steps
    lam = np.zeros((N, o, o))
    nu = np.zeros((N, o))
    lam[obs_idx] = np.linalg.inv(R)
    nu[obs_idx] = ys_obs @ np.linalg.inv(R).T
    mask = np.zeros(N, dtype=bool)
    mask[obs_idx] = True
    ssm = StateSpaceModel(*[jnp.asarray(x) for x in (mu0, l0, A, b, lq)])
    F, c, Q = K.prior_step_arrays(ssm)
    Hs = jnp.broadcast_to(jnp.asarray(H), (N, o, d))
    elems = K.make_filter_elements(F, c, Q, Hs, jnp.asarray(nu),
                                   jnp.asarray(lam))
    m_f, p_f = K.parallel_filter(elems)
    m_pred, p_pred = K.predicted_moments(F, c, Q, m_f, p_f)
    ll = K.log_likelihood_sites(Hs, jnp.asarray(nu), jnp.asarray(lam),
                                m_pred, p_pred, mask=jnp.asarray(mask))

    # Oracle: dense GP over observed indices only
    mean, cov = npk.joint_mean_cov(mu0, P0, A, b, Qs)
    Hbig = np.zeros((len(obs_idx) * o, N * d))
    for i, k in enumerate(obs_idx):
        Hbig[i * o:(i + 1) * o, k * d:(k + 1) * d] = H
    mu_y = Hbig @ mean
    S = Hbig @ cov @ Hbig.T + np.kron(np.eye(len(obs_idx)), R)
    resid = ys_obs.reshape(-1) - mu_y
    ll_np = -0.5 * (resid @ np.linalg.solve(S, resid)
                    + np.linalg.slogdet(S)[1]
                    + len(resid) * np.log(2 * np.pi))
    assert_allclose(float(ll), ll_np, rtol=1e-9)

    # posterior mean from dense conditioning
    post_mean = mean + cov @ Hbig.T @ np.linalg.solve(S, resid)
    F_, c_, Q_ = F, c, Q
    m_s, p_s, gains = K.parallel_smoother(F_, c_, Q_, m_f, p_f)
    assert_allclose(np.asarray(m_s).reshape(-1), post_mean, atol=1e-8)


def test_batched_filter(rng, batch_shape):
    T, d, o = 5, 2, 1
    mu0, l0, A, b, lq = npk.random_ssm(rng, T, d, batch=batch_shape)
    H = rng.standard_normal(batch_shape + (T + 1, o, d))
    lam = np.broadcast_to(np.eye(o) * 2.0, batch_shape + (T + 1, o, o))
    nu = rng.standard_normal(batch_shape + (T + 1, o))
    ssm = StateSpaceModel(*[jnp.asarray(x) for x in (mu0, l0, A, b, lq)])
    F, c, Q = K.prior_step_arrays(ssm)
    elems = K.make_filter_elements(F, c, Q, jnp.asarray(H), jnp.asarray(nu),
                                   jnp.asarray(lam))
    m_f, p_f = K.parallel_filter(elems)
    assert m_f.shape == batch_shape + (T + 1, d)
    assert p_f.shape == batch_shape + (T + 1, d, d)
    assert np.all(np.isfinite(np.asarray(m_f)))


def test_inv_det_tl_schur_blocks(rng):
    """d = 4..6 TL inverse/determinant (Schur-complement blocking) vs numpy."""
    from markovflow_tpu.ops.kalman import _det_tl, _inv_tl

    for d in [4, 5, 6]:
        m = rng.standard_normal((d, d, 7))
        m = m + np.swapaxes(m, 0, 1) + 2 * d * np.eye(d)[..., None]
        minv = _inv_tl(jnp.asarray(m))
        mdet = _det_tl(jnp.asarray(m))
        for t in range(7):
            assert_allclose(np.asarray(minv)[..., t],
                            np.linalg.inv(m[..., t]), atol=1e-9)
            assert_allclose(float(np.asarray(mdet)[t]),
                            np.linalg.det(m[..., t]), rtol=1e-9)
    # non-symmetric (the combine's I + CJ is not symmetric)
    for d in [4, 6]:
        m = rng.standard_normal((d, d, 5)) + 3 * np.eye(d)[..., None]
        minv = _inv_tl(jnp.asarray(m))
        for t in range(5):
            assert_allclose(np.asarray(minv)[..., t],
                            np.linalg.inv(m[..., t]), atol=1e-8)


def test_unrolled_tl_forms_match_einsum(rng):
    """The TPU-unrolled TL small-matrix forms == the einsum/LU forms.

    The suite runs on CPU where the einsum forms are the default; this
    pins the unrolled variants (what the TPU backend traces) to the same
    numbers so they keep coverage here.
    """
    import markovflow_tpu.ops.kalman as KK
    import markovflow_tpu.ops.scans as KS
    from tests.tools import jrun

    ssm, _, H, R, ys = _setup(rng, T=12, d=3)
    elems, (F, c, Q) = _site_elements(ssm, H, R, ys)
    to_tl = lambda x: jnp.moveaxis(x, -3, -1)
    N, o = ys.shape
    lam = to_tl(jnp.broadcast_to(jnp.asarray(np.linalg.inv(R)), (N, o, o)))
    nu = to_tl(jnp.asarray(ys @ np.linalg.inv(R).T)[..., None])
    Hs = to_tl(jnp.broadcast_to(jnp.asarray(H), (N, o, H.shape[-1])))
    args = (to_tl(F), to_tl(c[..., None]), to_tl(Q), Hs, nu, lam)
    try:
        KS.FORCE_UNROLLED = False
        m0, p0, ll0 = jrun(K.filter_pipeline_tl, *args)
        KS.FORCE_UNROLLED = True
        m1, p1, ll1 = jax.jit(K.filter_pipeline_tl)(*args)
    finally:
        KS.FORCE_UNROLLED = None
    assert_allclose(np.asarray(m1), np.asarray(m0), atol=1e-10)
    assert_allclose(np.asarray(p1), np.asarray(p0), atol=1e-10)
    assert_allclose(float(ll1), float(ll0), rtol=1e-12)
    # d = 5 inverse/determinant: Schur blocking vs LU
    m = rng.standard_normal((5, 5, 7))
    m = m + np.swapaxes(m, 0, 1) + 10 * np.eye(5)[..., None]
    try:
        KS.FORCE_UNROLLED = True
        inv_u = jax.jit(KK._inv_tl)(jnp.asarray(m))
        det_u = jax.jit(KK._det_tl)(jnp.asarray(m))
    finally:
        KS.FORCE_UNROLLED = None
    inv_l = np.stack([np.linalg.inv(m[..., k]) for k in range(7)], -1)
    det_l = np.stack([np.linalg.det(m[..., k]) for k in range(7)], -1)
    assert_allclose(np.asarray(inv_u), inv_l, atol=1e-9)
    assert_allclose(np.asarray(det_u), det_l, rtol=1e-9)
