# %% [markdown]
# # Importance-weighted variational inference
# Mirrors the reference's `importance_weighted_vi.py` notebook: a sparse
# variational posterior over inducing states tightened by an IW-ELBO with
# K importance samples, trained with the variance-controlled DREGS gradient.
# %%
import jax
import jax.numpy as jnp
import numpy as np
import optax

from markovflow_tpu.kernels import Matern32
from markovflow_tpu.likelihoods import StudentT
from markovflow_tpu.models import ImportanceWeightedVI
from markovflow_tpu.utils import trainable_mask, zero_untrainable

rng = np.random.default_rng(2)
N, M = 120, 15
x = np.sort(rng.uniform(0, 8, N))
y = np.sin(2 * x) + 0.4 * rng.standard_normal(N) * (
    1 + (rng.uniform(size=N) < 0.05) * 8)  # heavy-tailed outliers
data = (jnp.asarray(x), jnp.asarray(y[:, None]))

model = ImportanceWeightedVI(
    kernel=Matern32(lengthscale=1.0, variance=1.0),
    inducing_points=jnp.asarray(np.linspace(-0.1, 8.1, M)),
    likelihood=StudentT(scale=0.4, df=4.0),
    num_importance_samples=10,
)

# %% [markdown]
# The IW-ELBO is a tighter bound than the standard ELBO and is monotone in K.
# %%
key = jax.random.PRNGKey(0)
elbo_k1 = float(model.replace(num_importance_samples=1).elbo(data, key))
elbo_k10 = float(model.elbo(data, key))
print(f"IW-ELBO K=1: {elbo_k1:.2f}   K=10: {elbo_k10:.2f}")

# %% Train with the DREGS objective (gradients only; its value is not the bound)
mask = trainable_mask(model)
opt = optax.adam(1e-2)
state = opt.init(model)


@jax.jit
def step(m, s, k):
    def loss_fn(mm):
        return -mm.dregs_objective(data, k)

    grads = jax.grad(loss_fn)(m)
    grads = zero_untrainable(grads, mask)
    updates, s = opt.update(grads, s)
    return jax.tree_util.tree_map(lambda a, b: a + b, m, updates), s


for i in range(60):
    key, sub = jax.random.split(key)
    model, state = step(model, state, sub)

key, sub = jax.random.split(key)
elbo_final = float(jax.jit(lambda m, k: m.elbo(data, k))(model, sub))
print(f"final IW-ELBO: {elbo_final:.2f}")
assert elbo_final > elbo_k10

# %% Posterior expectations through importance weights
f_mean = jax.jit(lambda m, t, k: m.posterior.expected_value(t, data, k))(
    model, jnp.asarray(x), key)
assert np.all(np.isfinite(np.asarray(f_mean)))
