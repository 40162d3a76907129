"""Pallas filter-scan kernel vs the XLA scan engine (interpret mode on CPU)."""
import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose

from markovflow_tpu import StateSpaceModel
from markovflow_tpu.ops import kalman as K
from markovflow_tpu.ops.pallas_scan import pallas_filter_scan
from tests.tools import isolated, jrun
from tests.tools import numpy_kalman as npk


@pytest.mark.parametrize("d", [1, 2])
@pytest.mark.parametrize("t_len", [50, 130])
def test_pallas_scan_matches_reference(rng, d, t_len):
    mu0, l0, A, b, lq = npk.random_ssm(rng, t_len, d)
    o = 1
    H = rng.standard_normal((o, d))
    R = np.eye(o) * 0.3
    ys = rng.standard_normal((t_len + 1, o))
    ssm = StateSpaceModel(*[jnp.asarray(v) for v in (mu0, l0, A, b, lq)])
    F, c, Q = K.prior_step_arrays(ssm)
    lam = jnp.broadcast_to(jnp.asarray(np.linalg.inv(R)), (t_len + 1, o, o))
    nu = jnp.asarray(ys @ np.linalg.inv(R).T)
    Hs = jnp.broadcast_to(jnp.asarray(H), (t_len + 1, o, d))
    elems = K.make_filter_elements(F, c, Q, Hs, nu, lam)
    m_ref, p_ref = jrun(K.parallel_filter, elems)

    to_tl = lambda x: jnp.moveaxis(x, -3, -1)
    elems_tl = tuple(to_tl(x) for x in elems)
    m_tl, p_tl = jrun(pallas_filter_scan, elems_tl, chunk=16, r_blk=4, interpret=True)
    m_got = jnp.moveaxis(m_tl[..., 0, :], -1, -2)
    p_got = jnp.moveaxis(p_tl, -1, -3)
    assert_allclose(np.asarray(m_got), np.asarray(m_ref), atol=1e-9)
    assert_allclose(np.asarray(p_got), np.asarray(p_ref), atol=1e-9)


@pytest.mark.parametrize("t_len", [50, 130])
def test_pallas_smoother_matches_reference(rng, t_len):
    d, o = 2, 1
    mu0, l0, A, b, lq = npk.random_ssm(rng, t_len, d)
    H = rng.standard_normal((o, d))
    R = np.eye(o) * 0.3
    ys = rng.standard_normal((t_len + 1, o))
    ssm = StateSpaceModel(*[jnp.asarray(v) for v in (mu0, l0, A, b, lq)])
    F, c, Q = K.prior_step_arrays(ssm)
    lam = jnp.broadcast_to(jnp.asarray(np.linalg.inv(R)), (t_len + 1, o, o))
    nu = jnp.asarray(ys @ np.linalg.inv(R).T)
    Hs = jnp.broadcast_to(jnp.asarray(H), (t_len + 1, o, d))
    elems = K.make_filter_elements(F, c, Q, Hs, nu, lam)
    m_f, p_f = jrun(K.parallel_filter, elems)
    m_ref, p_ref, _ = jrun(K.parallel_smoother, F, c, Q, m_f, p_f)

    # build TL smoother elements and run the pallas suffix scan
    to_tl = lambda x: jnp.moveaxis(x, -3, -1)
    f_tl, c_tl, q_tl = to_tl(F), to_tl(c[..., None]), to_tl(Q)
    m_f_tl = to_tl(m_f[..., None])
    p_f_tl = to_tl(p_f)
    from markovflow_tpu.ops.kalman import _make_smoother_elements
    (e_all, g_all, l_all), _ = _make_smoother_elements(F, c, Q, m_f, p_f)
    elems_tl = (to_tl(e_all), to_tl(g_all), to_tl(l_all))
    from markovflow_tpu.ops.pallas_scan import pallas_smoother_scan
    m_tl, p_tl = jrun(pallas_smoother_scan, elems_tl, chunk=16, r_blk=4, interpret=True)
    m_got = jnp.moveaxis(m_tl[..., 0, :], -1, -2)
    p_got = jnp.moveaxis(p_tl, -1, -3)
    assert_allclose(np.asarray(m_got), np.asarray(m_ref), atol=1e-9)
    assert_allclose(np.asarray(p_got), np.asarray(p_ref), atol=1e-9)


def test_pallas_scan_batched(rng):
    """Batched inputs run as a leading grid axis; each batch row must match
    the per-row unbatched result (carry resets per row)."""
    from markovflow_tpu.ops.pallas_scan import pallas_smoother_scan

    d, o, t_len, B = 2, 1, 70, 3
    elems_rows = []
    for _ in range(B):
        mu0, l0, A, b, lq = npk.random_ssm(rng, t_len, d)
        H = rng.standard_normal((o, d))
        R = np.eye(o) * 0.3
        ys = rng.standard_normal((t_len + 1, o))
        ssm = StateSpaceModel(*[jnp.asarray(v) for v in (mu0, l0, A, b, lq)])
        F, c, Q = K.prior_step_arrays(ssm)
        lam = jnp.broadcast_to(jnp.asarray(np.linalg.inv(R)),
                               (t_len + 1, o, o))
        nu = jnp.asarray(ys @ np.linalg.inv(R).T)
        Hs = jnp.broadcast_to(jnp.asarray(H), (t_len + 1, o, d))
        elems_rows.append(K.make_filter_elements(F, c, Q, Hs, nu, lam))
    to_tl = lambda x: jnp.moveaxis(x, -3, -1)
    batched = tuple(jnp.stack([to_tl(r[i]) for r in elems_rows])
                    for i in range(5))
    m_b, p_b = jrun(pallas_filter_scan, batched, chunk=16, r_blk=4, interpret=True)
    assert m_b.shape == (B, d, 1, t_len + 1)
    for i, row in enumerate(elems_rows):
        m_i, p_i = jrun(pallas_filter_scan, 
            tuple(to_tl(x) for x in row), chunk=16, r_blk=4, interpret=True)
        assert_allclose(np.asarray(m_b[i]), np.asarray(m_i), atol=1e-12)
        assert_allclose(np.asarray(p_b[i]), np.asarray(p_i), atol=1e-12)


def test_pallas_scan_d4(rng):
    """d = 4 path (Schur-complement in-kernel inverse) vs the XLA engine."""
    d, o, t_len = 4, 1, 90
    mu0, l0, A, b, lq = npk.random_ssm(rng, t_len, d)
    H = rng.standard_normal((o, d))
    R = np.eye(o) * 0.3
    ys = rng.standard_normal((t_len + 1, o))
    ssm = StateSpaceModel(*[jnp.asarray(v) for v in (mu0, l0, A, b, lq)])
    F, c, Q = K.prior_step_arrays(ssm)
    lam = jnp.broadcast_to(jnp.asarray(np.linalg.inv(R)), (t_len + 1, o, o))
    nu = jnp.asarray(ys @ np.linalg.inv(R).T)
    Hs = jnp.broadcast_to(jnp.asarray(H), (t_len + 1, o, d))
    elems = K.make_filter_elements(F, c, Q, Hs, nu, lam)
    m_ref, p_ref = jrun(K.parallel_filter, elems)
    to_tl = lambda x: jnp.moveaxis(x, -3, -1)
    elems_tl = tuple(to_tl(x) for x in elems)
    m_tl, p_tl = jrun(pallas_filter_scan, elems_tl, chunk=16, r_blk=4, interpret=True)
    m_got = jnp.moveaxis(m_tl[..., 0, :], -1, -2)
    p_got = jnp.moveaxis(p_tl, -1, -3)
    assert_allclose(np.asarray(m_got), np.asarray(m_ref), atol=1e-8)
    assert_allclose(np.asarray(p_got), np.asarray(p_ref), atol=1e-8)


def _pipeline_inputs(rng, t_len, d, o=1):
    mu0, l0, A, b, lq = npk.random_ssm(rng, t_len, d)
    H = rng.standard_normal((o, d))
    R = np.eye(o) * 0.3 + 0.05 * np.ones((o, o))
    ys = rng.standard_normal((t_len + 1, o))
    ssm = StateSpaceModel(*[jnp.asarray(v) for v in (mu0, l0, A, b, lq)])
    F, c, Q = K.prior_step_arrays(ssm)
    r_inv = np.linalg.inv(R)
    lam = jnp.broadcast_to(jnp.asarray(r_inv), (t_len + 1, o, o))
    nu = jnp.asarray(ys @ r_inv.T)
    Hs = jnp.broadcast_to(jnp.asarray(H), (t_len + 1, o, d))
    to_tl = lambda x: jnp.moveaxis(x, -3, -1)
    return (to_tl(F), to_tl(c[..., None]), to_tl(Q), to_tl(Hs),
            to_tl(nu[..., None]), to_tl(lam))


@pytest.mark.parametrize("d,o,t_len", [(2, 1, 70), (3, 2, 50), (1, 1, 130)])
def test_fused_pipeline_matches_xla(rng, d, o, t_len):
    from markovflow_tpu.ops.pallas_scan import pallas_filter_pipeline

    args = _pipeline_inputs(rng, t_len, d, o)
    m_ref, p_ref, ll_ref = jrun(K.filter_pipeline_tl, *args)
    m, p, ll = jrun(pallas_filter_pipeline, *args, chunk=16, r_blk=4, interpret=True)
    assert_allclose(np.asarray(m), np.asarray(m_ref), atol=1e-9)
    assert_allclose(np.asarray(p), np.asarray(p_ref), atol=1e-9)
    assert_allclose(float(ll), float(ll_ref), rtol=1e-11)


@isolated
def test_fused_pipeline_masked_and_batched(rng):
    from markovflow_tpu.ops.pallas_scan import pallas_filter_pipeline

    rows = [_pipeline_inputs(rng, 80, 2, 1) for _ in range(2)]
    args = tuple(jnp.stack([r[i] for r in rows]) for i in range(6))
    n = args[0].shape[-1]
    mask_np = np.zeros(n, bool)
    mask_np[np.sort(rng.choice(n, 30, replace=False))] = True
    keep = jnp.asarray(mask_np)[None, None, None, :]
    F, c, Q, H, nu, lam = args
    nu = jnp.where(keep, nu, 0.0)
    lam = jnp.where(keep, lam, 0.0)
    mask = jnp.asarray(mask_np)
    m_ref, p_ref, ll_ref = jrun(K.filter_pipeline_tl, F, c, Q, H,
                                nu, lam, mask)
    maskf = jnp.broadcast_to(mask, (2, n)).astype(F.dtype)[:, None, None, :]
    m, p, ll = jrun(pallas_filter_pipeline, F, c, Q, H, nu, lam, maskf,
                                      chunk=16, r_blk=4, interpret=True)
    assert_allclose(np.asarray(m), np.asarray(m_ref), atol=1e-9)
    assert_allclose(np.asarray(p), np.asarray(p_ref), atol=1e-9)
    assert_allclose(np.asarray(ll), np.asarray(ll_ref), rtol=1e-11)


@isolated
def test_fused_adjoint_matches_xla(rng):
    """Fused backward kernel vs the XLA adjoint stages (interpret mode)."""
    from markovflow_tpu.ops.adjoint import _adjoint_grads
    from markovflow_tpu.ops.pallas_scan import pallas_adjoint_pipeline

    for d, o, t_len, batch in [(2, 1, 70, ()), (3, 2, 50, ()),
                               (2, 1, 40, (2,))]:
        rows = [_pipeline_inputs(rng, t_len, d, o)
                for _ in range(max(1, int(np.prod(batch, dtype=int))))]
        if batch:
            args = tuple(jnp.stack([r[i] for r in rows]).reshape(
                batch + rows[0][i].shape) for i in range(6))
        else:
            args = rows[0]
        F = args[0]
        n = F.shape[-1]
        maskf = jnp.ones(F.shape[:-3] + (n,), F.dtype)
        m_f, p_f, _ = jrun(K.filter_pipeline_tl, *args)
        ref = jrun(_adjoint_grads, *args, maskf, m_f, p_f, engine="xla")
        g = jnp.full(F.shape[:-3], 1.7, F.dtype)
        got = jrun(pallas_adjoint_pipeline, 
            *args, maskf[..., None, None, :], m_f, p_f, g,
            chunk=16, r_blk=4, interpret=True)
        for a, b, nm in zip(ref, got, ["F", "c", "Q", "H", "nu", "lam"]):
            assert_allclose(np.asarray(b), 1.7 * np.asarray(a), atol=1e-8,
                            err_msg=f"fused adjoint mismatch {nm} "
                                    f"(d={d}, o={o}, batch={batch})")


@pytest.mark.parametrize("d", [9, 12])
def test_inv_det_schur_recursion_large_d(rng, d):
    """_inv/_det recursive Schur blocking above d = 6 vs dense NumPy."""
    from markovflow_tpu.ops.pallas_scan import _det, _inv

    m = rng.standard_normal((d, d, 7))
    m = np.einsum("ikn,jkn->ijn", m, m) + 0.5 * np.eye(d)[..., None]
    got = np.asarray(_inv(jnp.asarray(m)))
    want = np.moveaxis(np.linalg.inv(np.moveaxis(m, -1, 0)), 0, -1)
    assert_allclose(got, want, rtol=1e-8, atol=1e-9)
    got_det = np.asarray(_det(jnp.asarray(m)))
    want_det = np.linalg.det(np.moveaxis(m, -1, 0))
    assert_allclose(got_det, want_det, rtol=1e-8)


def test_fused_pipeline_matches_xla_d9(rng):
    """d = 9 (e.g. a Sum of three Matern52 components) through the recursive
    Schur inverses and the auto-halved chunk."""
    from markovflow_tpu.ops.pallas_scan import pallas_filter_pipeline

    args = _pipeline_inputs(rng, 40, 9, o=2)
    m_ref, p_ref, ll_ref = jrun(K.filter_pipeline_tl, *args)
    m, p, ll = jrun(pallas_filter_pipeline, *args, chunk=16, r_blk=4,
                    interpret=True)
    assert_allclose(np.asarray(m), np.asarray(m_ref), atol=1e-8)
    assert_allclose(np.asarray(p), np.asarray(p_ref), atol=1e-8)
    assert_allclose(float(ll), float(ll_ref), rtol=1e-10)


def test_force_xla_scans_env_knob(monkeypatch):
    """MFTPU_FORCE_XLA_SCANS=1 must route every eligible request to the
    XLA scans (escape hatch for Mosaic compile pathologies, e.g. the d=9
    recursive-Schur kernel's remote backend compile)."""
    import jax.numpy as jnp

    from markovflow_tpu.ops.pallas_scan import pick_scan_engine

    f = jnp.zeros((2, 2, 8), jnp.float32)
    monkeypatch.setenv("MFTPU_FORCE_XLA_SCANS", "1")
    assert pick_scan_engine(f, "pallas") == "xla"
    monkeypatch.delenv("MFTPU_FORCE_XLA_SCANS")
    # without the knob the decision reverts to backend eligibility
    assert pick_scan_engine(f, "xla") == "xla"
