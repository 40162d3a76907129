"""Explicit-collective sequence-parallel scans vs the unsharded pipelines."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from numpy.testing import assert_allclose

from markovflow_tpu import StateSpaceModel
from markovflow_tpu.ops import kalman as K
from markovflow_tpu.parallel import make_mesh
from markovflow_tpu.parallel.collective_scan import (
    sharded_filter_pipeline_tl,
    sharded_smoother_pipeline_tl,
)
from tests.tools import numpy_kalman as npk


def _tl_inputs(rng, t_len, d, o=1):
    mu0, l0, A, b, lq = npk.random_ssm(rng, t_len, d)
    H = rng.standard_normal((o, d))
    R = np.eye(o) * 0.3
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


def _shard_time(mesh, args, axis="sp"):
    out = []
    for x in args:
        spec = P(*([None] * (x.ndim - 1) + [axis]))
        out.append(jax.device_put(x, NamedSharding(mesh, spec)))
    return tuple(out)


def test_sharded_filter_matches_unsharded(rng):
    args = _tl_inputs(rng, 63, 2)  # 64 states over 8 devices
    m_ref, p_ref, ll_ref = K.filter_pipeline_tl(*args)

    mesh = make_mesh(dp=1, sp=8)
    sharded = _shard_time(mesh, args)
    with mesh:
        m, p, ll = jax.jit(
            lambda *a: sharded_filter_pipeline_tl(*a, mesh=mesh))(*sharded)
    assert_allclose(np.asarray(m), np.asarray(m_ref), atol=1e-10)
    assert_allclose(np.asarray(p), np.asarray(p_ref), atol=1e-10)
    assert_allclose(float(ll), float(ll_ref), rtol=1e-12)


def test_sharded_filter_masked(rng):
    args = _tl_inputs(rng, 79, 2)
    n = args[0].shape[-1]
    mask_np = np.zeros(n, bool)
    mask_np[np.sort(rng.choice(n, 25, replace=False))] = True
    keep = jnp.asarray(mask_np)[None, None, :]
    F, c, Q, H, nu, lam = args
    nu = jnp.where(keep, nu, 0.0)
    lam = jnp.where(keep, lam, 0.0)
    args = (F, c, Q, H, nu, lam)
    mask = jnp.asarray(mask_np)

    m_ref, p_ref, ll_ref = K.filter_pipeline_tl(*args, mask=mask)
    mesh = make_mesh(dp=1, sp=8)
    sharded = _shard_time(mesh, args)
    mask_s = jax.device_put(mask, NamedSharding(mesh, P("sp")))
    with mesh:
        m, p, ll = jax.jit(lambda *a: sharded_filter_pipeline_tl(
            *a[:-1], mask=a[-1], mesh=mesh))(*sharded, mask_s)
    assert_allclose(np.asarray(m), np.asarray(m_ref), atol=1e-10)
    assert_allclose(float(ll), float(ll_ref), rtol=1e-12)


def test_sharded_smoother_matches_unsharded(rng):
    args = _tl_inputs(rng, 63, 2)
    F, c, Q = args[:3]
    m_f, p_f, _ = K.filter_pipeline_tl(*args)
    m_ref, p_ref, gains_ref = K.smoother_pipeline_tl(F, c, Q, m_f, p_f)

    mesh = make_mesh(dp=1, sp=8)
    Fs, cs, Qs = _shard_time(mesh, (F, c, Q))
    mfs, pfs = _shard_time(mesh, (m_f, p_f))
    with mesh:
        m, p, gains = jax.jit(lambda *a: sharded_smoother_pipeline_tl(
            *a, mesh=mesh))(Fs, cs, Qs, mfs, pfs)
    assert_allclose(np.asarray(m), np.asarray(m_ref), atol=1e-10)
    assert_allclose(np.asarray(p), np.asarray(p_ref), atol=1e-10)
    # gains: sharded version is length N with a zeroed last element
    assert_allclose(np.asarray(gains)[..., :-1], np.asarray(gains_ref),
                    atol=1e-10)
    assert_allclose(np.asarray(gains)[..., -1], 0.0, atol=0)


def test_sharded_koopman_grads_match_unsharded(rng):
    from markovflow_tpu.ops.adjoint import log_likelihood_koopman
    from markovflow_tpu.parallel.collective_scan import (
        sharded_log_likelihood_koopman,
    )

    args = _tl_inputs(rng, 63, 2)
    v_ref, g_ref = jax.jit(jax.value_and_grad(
        lambda *a: log_likelihood_koopman(*a, engine="xla"),
        argnums=(0, 1, 2, 4, 5)))(*args)

    mesh = make_mesh(dp=1, sp=8)
    sharded = _shard_time(mesh, args)
    with mesh:
        v, g = jax.jit(jax.value_and_grad(
            lambda *a: sharded_log_likelihood_koopman(*a, mesh=mesh),
            argnums=(0, 1, 2, 4, 5)))(*sharded)
    assert_allclose(float(v), float(v_ref), rtol=1e-12)
    for a, b in zip(g_ref, g):
        assert_allclose(np.asarray(b), np.asarray(a), atol=1e-9)


def test_sharded_koopman_chunked_local_scan(rng, monkeypatch):
    """Local shards longer than CHUNK_THRESHOLD take the chunked lax.scan
    inside shard_map — its identity init carry must carry the mapped axes'
    varying type (regression: vma mismatch at shard length > threshold)."""
    from markovflow_tpu.ops import scans
    from markovflow_tpu.ops.adjoint import log_likelihood_koopman
    from markovflow_tpu.parallel.collective_scan import (
        sharded_log_likelihood_koopman,
    )

    monkeypatch.setattr(scans, "CHUNK_THRESHOLD", 8)
    monkeypatch.setattr(scans, "CHUNK", 8)
    args = _tl_inputs(rng, 127, 2)  # 64 per shard >> threshold
    v_ref, g_ref = jax.jit(jax.value_and_grad(
        lambda *a: log_likelihood_koopman(*a, engine="xla"),
        argnums=(0, 1, 2, 4, 5)))(*args)

    mesh = make_mesh(dp=1, sp=2)
    sharded = _shard_time(mesh, args)
    with mesh:
        v, g = jax.jit(jax.value_and_grad(
            lambda *a: sharded_log_likelihood_koopman(*a, mesh=mesh),
            argnums=(0, 1, 2, 4, 5)))(*sharded)
    assert_allclose(float(v), float(v_ref), rtol=1e-12)
    for a, b in zip(g_ref, g):
        assert_allclose(np.asarray(b), np.asarray(a), atol=1e-9)
