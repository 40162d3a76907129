# %% [markdown]
# # Stacked kernels: batched independent outputs
# Mirrors the reference's `stacked_kernels.py` notebook: `StackKernel` /
# `IndependentMultiOutputStack` run several univariate GPs as one batched
# SSM — the children are padded to a common state dimension and stacked
# along a `num_kernels` batch axis, which on TPU is just another vmap/SPMD
# axis (reference: sde_kernel.py:945-1276).
# %%
import jax.numpy as jnp
import numpy as np

from markovflow_tpu.kernels import (
    IndependentMultiOutputStack,
    Matern12,
    Matern32,
)
from markovflow_tpu.likelihoods import Gaussian
from markovflow_tpu.models import GaussianProcessRegression

rng = np.random.default_rng(5)
N = 70
x = np.sort(rng.uniform(0, 6, N))
y1 = np.sin(2 * x) + 0.2 * rng.standard_normal(N)
y2 = np.cos(3 * x) + 0.1 * rng.standard_normal(N)

stack = IndependentMultiOutputStack([
    Matern32(lengthscale=1.0, variance=1.0),   # state_dim 2
    Matern12(lengthscale=0.5, variance=0.5),   # state_dim 1 (padded)
])

# the stacked kernel expects the trailing batch dim == num_kernels
x_stack = jnp.broadcast_to(jnp.asarray(x), (2, N))
ssm = stack.state_space_model(x_stack)
print("stacked SSM batch:", ssm.batch_shape, "state_dim:", ssm.state_dim)
assert ssm.batch_shape == (2,)

# %% prior marginals: each output keeps its own variance
em = stack.generate_emission_model(x_stack)
f_var = em.project_state_covariance_to_f(ssm.marginal_covariances)
np.testing.assert_allclose(np.asarray(f_var)[:, 0], 1.0, atol=1e-6)
np.testing.assert_allclose(np.asarray(f_var)[:, 1], 0.5, atol=1e-6)

# %% [markdown]
# Stacks compose elementwise: `stack + stack` / `stack * stack` combine the
# children pairwise (reference: sde_kernel.py:1256-1276).
# %%
summed = stack + stack
f_var2 = summed.generate_emission_model(x_stack).project_state_covariance_to_f(
    summed.state_space_model(x_stack).marginal_covariances)
np.testing.assert_allclose(np.asarray(f_var2)[:, 0], 2.0, atol=1e-6)

# %% [markdown]
# For regression on each output, the equivalent per-output models give the
# same answers — the stack is a batching device, not a new model family.
# %%
gpr1 = GaussianProcessRegression(
    (jnp.asarray(x), jnp.asarray(y1[:, None])),
    Matern32(lengthscale=1.0, variance=1.0), jnp.asarray([[0.2]]))
print("output-1 log-lik:", float(gpr1.log_likelihood()))
assert np.isfinite(float(gpr1.log_likelihood()))
