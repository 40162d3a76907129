"""Model-level explicit-collective sequence parallelism
(grad_engine="collective") on the virtual 8-device mesh."""
import jax
import jax.numpy as jnp
import numpy as np
from numpy.testing import assert_allclose

from markovflow_tpu.kernels import Matern32
from markovflow_tpu.models import GaussianProcessRegression
from markovflow_tpu.parallel import make_mesh
from markovflow_tpu.utils import filtered_value_and_grad, trainable_mask


def _model(rng, n, **kw):
    # key the data generator on n alone so repeated calls build models
    # over IDENTICAL observations (rng is stateful across calls)
    del rng
    data_rng = np.random.default_rng(n)
    x = np.linspace(0.0, 10.0, n)
    y = np.sin(2 * x)[:, None] + 0.1 * data_rng.standard_normal((n, 1))
    return GaussianProcessRegression(
        input_data=(jnp.asarray(x), jnp.asarray(y)),
        kernel=Matern32(lengthscale=0.8, variance=1.1),
        chol_obs_covariance=jnp.asarray([[0.3]]), **kw)


def test_collective_engine_matches_koopman(rng):
    n = 64
    mesh = make_mesh(dp=1, sp=8)
    ref = _model(rng, n)  # koopman default
    col = _model(rng, n, grad_engine="collective", mesh=mesh,
                 shard_axis="sp")
    ll_ref = float(jax.jit(lambda m: m.log_likelihood())(ref))
    ll_col = float(jax.jit(lambda m: m.log_likelihood())(col))
    assert_allclose(ll_col, ll_ref, rtol=1e-10)

    mask = trainable_mask(ref)
    _, g_ref = jax.jit(lambda m: filtered_value_and_grad(
        lambda mm: mm.loss(), m, mask))(ref)
    _, g_col = jax.jit(lambda m: filtered_value_and_grad(
        lambda mm: mm.loss(), m, mask))(col)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_col)):
        assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-8, atol=1e-10)


def test_collective_engine_requires_mesh(rng):
    model = _model(rng, 16, grad_engine="collective")
    try:
        model.log_likelihood()
        raise AssertionError("expected ValueError without a mesh")
    except ValueError:
        pass


def _cvi_model(n, **kw):
    from markovflow_tpu.likelihoods import Poisson
    from markovflow_tpu.models import CVIGaussianProcess

    data_rng = np.random.default_rng(n + 1)
    x = np.linspace(0.0, 10.0, n)
    y = data_rng.poisson(np.exp(0.5 * np.sin(2 * x)))[:, None].astype(
        np.float64)
    return CVIGaussianProcess(
        input_data=(jnp.asarray(x), jnp.asarray(y)),
        kernel=Matern32(lengthscale=0.8, variance=1.1),
        likelihood=Poisson(), learning_rate=0.7, uniform_grid=False, **kw)


def test_collective_cvi_iteration_matches_single_device(rng):
    """One full CVI iteration — update_sites (sharded smoothed marginals)
    then ELBO value + hyperparameter grads (sharded Koopman VJP) — matches
    the single-device koopman engine on an sp=8 mesh."""
    n = 64
    mesh = make_mesh(dp=1, sp=8)
    ref = _cvi_model(n)
    col = _cvi_model(n, grad_engine="collective", mesh=mesh, shard_axis="sp")

    ref2 = jax.jit(lambda m: m.update_sites())(ref)
    col2 = jax.jit(lambda m: m.update_sites())(col)
    assert_allclose(np.asarray(col2.sites.nat1), np.asarray(ref2.sites.nat1),
                    rtol=1e-9, atol=1e-12)
    assert_allclose(np.asarray(col2.sites.nat2), np.asarray(ref2.sites.nat2),
                    rtol=1e-9, atol=1e-12)

    ll_ref = float(jax.jit(lambda m: m.elbo())(ref2))
    ll_col = float(jax.jit(lambda m: m.elbo())(col2))
    assert_allclose(ll_col, ll_ref, rtol=1e-10)

    mask = trainable_mask(ref2)
    _, g_ref = jax.jit(lambda m: filtered_value_and_grad(
        lambda mm: mm.loss(), m, mask))(ref2)
    _, g_col = jax.jit(lambda m: filtered_value_and_grad(
        lambda mm: mm.loss(), m, mask))(col2)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_col)):
        assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-7, atol=1e-10)


def test_natgrad_step_under_mesh_matches_single_device(rng):
    """The SSMNaturalGradient step jitted with its SSM leaves sharded over
    the (dp=1, sp=8) mesh time axis (XLA-SPMD partitioning of the chunked
    scans) reproduces the single-device step."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from markovflow_tpu.likelihoods import Gaussian
    from markovflow_tpu.models.variational import VariationalGaussianProcess
    from markovflow_tpu.ssm_natgrad import SSMNaturalGradient

    n = 65  # 64 transitions: the transition-indexed leaves shard 8-ways
    data_rng = np.random.default_rng(7)
    x = np.linspace(0.0, 10.0, n)
    y = np.sin(2 * x)[:, None] + 0.1 * data_rng.standard_normal((n, 1))
    vgp = VariationalGaussianProcess(
        (jnp.asarray(x), jnp.asarray(y)),
        Matern32(lengthscale=0.8, variance=1.1), Gaussian(variance=0.1))
    opt = SSMNaturalGradient(gamma=0.5, naturals_engine="parallel")
    ssm0 = vgp.dist_q.non_trainable_copy()

    step = jax.jit(lambda s: opt.step(lambda q: vgp.with_dist_q(q).loss(), s))
    new_ref, _, loss_ref = step(ssm0)

    mesh = make_mesh(dp=1, sp=8)
    time_sharded = NamedSharding(mesh, P("sp"))

    def shard_leaf(x):
        if x.ndim >= 1 and x.shape[0] == n - 1:  # transition-indexed leaves
            return jax.device_put(x, NamedSharding(
                mesh, P(*(["sp"] + [None] * (x.ndim - 1)))))
        return x

    del time_sharded
    ssm_sharded = jax.tree_util.tree_map(shard_leaf, ssm0)
    new_col, _, loss_col = step(ssm_sharded)
    assert_allclose(float(loss_col), float(loss_ref), rtol=1e-10)
    for a, b in zip(jax.tree_util.tree_leaves(new_ref),
                    jax.tree_util.tree_leaves(new_col)):
        assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-8, atol=1e-10)


def test_collective_scvi_sites_match_single_device(rng):
    """Data-parallel SCVI (collective_sites.py): one site update + ELBO on
    the 8-device mesh must match the single-device model bit-for-bit-ish
    (psum of shard-local segment sums vs one global segment sum)."""
    from markovflow_tpu.likelihoods import Poisson
    from markovflow_tpu.models import SparseCVIGaussianProcess

    n, m = 64, 7
    data_rng = np.random.default_rng(5)
    x = np.linspace(0.0, 10.0, n)
    y = data_rng.poisson(np.exp(0.5 * np.sin(2 * x)))[:, None].astype(
        np.float64)
    z = jnp.asarray(np.linspace(-0.1, 10.1, m))
    mesh = make_mesh(dp=1, sp=8)

    def build(**kw):
        return SparseCVIGaussianProcess(
            kernel=Matern32(lengthscale=0.8, variance=1.1),
            inducing_points=z, likelihood=Poisson(), learning_rate=0.7,
            **kw)

    ref = build()
    col = build(mesh=mesh, shard_axis="sp")
    data = (jnp.asarray(x), jnp.asarray(y))

    e_ref = float(jax.jit(lambda mm: mm.classic_elbo(data))(ref))
    e_col = float(jax.jit(lambda mm: mm.classic_elbo(data))(col))
    assert_allclose(e_col, e_ref, rtol=1e-10)

    up_ref = jax.jit(lambda mm: mm.update_sites(data))(ref)
    up_col = jax.jit(lambda mm: mm.update_sites(data))(col)
    assert_allclose(np.asarray(up_col.nat1), np.asarray(up_ref.nat1),
                    rtol=1e-9, atol=1e-12)
    assert_allclose(np.asarray(up_col.nat2), np.asarray(up_ref.nat2),
                    rtol=1e-9, atol=1e-12)

    # a second update + elbo improves the bound the same way on both paths
    e2_ref = float(jax.jit(lambda mm: mm.classic_elbo(data))(
        jax.jit(lambda mm: mm.update_sites(data))(up_ref)))
    e2_col = float(jax.jit(lambda mm: mm.classic_elbo(data))(
        jax.jit(lambda mm: mm.update_sites(data))(up_col)))
    assert_allclose(e2_col, e2_ref, rtol=1e-10)
    assert e2_col > e_col
