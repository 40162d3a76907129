# # Multi-chip Markovian GPs: data- and sequence-parallel inference
#
# The reference library is single-process/single-device; here scaling is
# TPU-native SPMD.  Two ways to run the same model over a
# ``jax.sharding.Mesh``:
#
# 1. **Automatic**: place the data with a (dp, sp) sharding and jit — every
#    hot op is pointwise over time or a parallel prefix, so XLA SPMD
#    partitions it (collectives inserted by the compiler).
# 2. **Explicit**: the collective-scan pipelines
#    (``markovflow_tpu.parallel.collective_scan``) communicate exactly one
#    all_gather of per-device carry totals per scan + two boundary
#    ppermutes — O(P d^2) communication, independent of T.
#
# Runs on any device count (the test suite uses 8 virtual CPU devices).
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from markovflow_tpu.kernels import Matern32
from markovflow_tpu.models import GaussianProcessRegression
from markovflow_tpu.parallel import make_mesh, shard_batched_series
from markovflow_tpu.parallel.collective_scan import (
    sharded_log_likelihood_koopman,
)

n_dev = len(jax.devices())
dp = 2 if n_dev % 2 == 0 else 1
sp = n_dev // dp
mesh = make_mesh(dp=dp, sp=sp)

# a batch of independent series: batch axis -> dp, time axis -> sp
batch, n = 4, 64 * sp
rng = np.random.default_rng(0)
x = np.broadcast_to(np.linspace(0.0, 20.0, n), (batch, n)).copy()
y = np.sin(x)[..., None] + 0.1 * rng.standard_normal((batch, n, 1))
tp, obs = shard_batched_series(mesh, jnp.asarray(x), jnp.asarray(y))

model = GaussianProcessRegression(
    input_data=(tp, obs),
    kernel=Matern32(lengthscale=1.0, variance=1.0),
    chol_obs_covariance=jnp.asarray([[0.3]]),
)

# 1. automatic SPMD: jit partitions the whole training objective
with mesh:
    loss, grads = jax.jit(
        jax.value_and_grad(lambda m: m.loss().sum()))(model)
print("sharded loss per series:", np.asarray(jax.jit(
    lambda m: m.loss())(model)))
assert np.isfinite(float(loss))

# 2. explicit collectives: one series, time axis sharded over ALL devices,
# analytic-adjoint gradients through the explicit-collective scans
mesh1 = make_mesh(dp=1, sp=n_dev)
kal = GaussianProcessRegression(
    input_data=(jnp.asarray(x[0]), jnp.asarray(y[0])),
    kernel=Matern32(lengthscale=1.0, variance=1.0),
    chol_obs_covariance=jnp.asarray([[0.3]]),
).kalman
F, c, Q, h, nu, lam, _ = kal._tl_inputs()
shard = lambda a: jax.device_put(
    a, NamedSharding(mesh1, P(*([None] * (a.ndim - 1) + ["sp"]))))
args = tuple(shard(a) for a in (F, c, Q, h, nu, lam))
with mesh1:
    ll, g = jax.jit(jax.value_and_grad(
        lambda *a: sharded_log_likelihood_koopman(*a, mesh=mesh1),
        argnums=(0, 1, 2)))(*args)

# the explicit-collective result equals the single-device pipeline
ll_ref = kal.log_likelihood()
np.testing.assert_allclose(float(ll), float(ll_ref), rtol=1e-6)
print(f"explicit-collective loglik {float(ll):.4f} == local {float(ll_ref):.4f}")
