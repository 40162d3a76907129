# %% [markdown]
# # GP factor analysis
# Mirrors the reference's `factor_analysis.py` notebook: high-dimensional
# outputs f(t) = A(t) B g(t) driven by a few latent Markovian GPs g through
# a (trainable) loading matrix B and a known weight function A(t)
# (reference: sde_kernel.py:881-941).
# %%
import jax
import jax.numpy as jnp
import numpy as np
import optax

from markovflow_tpu.kernels import FactorAnalysisKernel, Matern32
from markovflow_tpu.models import GaussianProcessRegression
from markovflow_tpu.utils import trainable_mask, zero_untrainable

rng = np.random.default_rng(6)
N, OUT, LATENT = 80, 4, 2

# ground-truth loading and latent functions
B_true = rng.standard_normal((OUT, LATENT))
x = np.sort(rng.uniform(0, 6, N))
g = np.stack([np.sin(2 * x), np.cos(0.7 * x)], axis=-1)   # [N, 2]
y = g @ B_true.T + 0.1 * rng.standard_normal((N, OUT))

# %% identity weight function; loading initialised randomly and trained
weight_fn = lambda t: jnp.broadcast_to(
    jnp.eye(OUT), t.shape[:-1] + (t.shape[-1], OUT, OUT))
kernel = FactorAnalysisKernel(
    weight_fn,
    [Matern32(lengthscale=1.0, variance=1.0) for _ in range(LATENT)],
    output_dim=OUT,
    loading=jnp.asarray(0.5 * rng.standard_normal((OUT, LATENT))),
    trainable_loading=True)

model = GaussianProcessRegression(
    input_data=(jnp.asarray(x), jnp.asarray(y)),
    kernel=kernel,
    chol_obs_covariance=jnp.asarray(0.1 * np.eye(OUT)))

mask = trainable_mask(model)
opt = optax.adam(5e-2)
state = opt.init(model)


@jax.jit
def step(m, s):
    loss, grads = jax.value_and_grad(lambda mm: mm.loss())(m)
    grads = zero_untrainable(grads, mask)
    updates, s = opt.update(grads, s)
    return jax.tree_util.tree_map(lambda a, b: a + b, m, updates), s, loss


l0 = None
for i in range(120):
    model, state, loss = step(model, state)
    if l0 is None:
        l0 = float(loss)
print(f"loss {l0:.1f} -> {float(loss):.1f}")
assert float(loss) < l0

# %% reconstruction: posterior mean explains the data
f_mu, _ = model.predict_f(jnp.asarray(x))
rmse = float(np.sqrt(np.mean((np.asarray(f_mu) - y) ** 2)))
print("train RMSE:", rmse)
assert rmse < 0.2
