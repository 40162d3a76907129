# %% [markdown]
# # Spatio-temporal GPs
# Mirrors the reference's spatio-temporal notebook: separable space x time
# kernel with sparse inducing points in both dimensions.
# %%
import jax
import jax.numpy as jnp
import numpy as np

from markovflow_tpu.kernels import Matern32
from markovflow_tpu.kernels.spatial import SquaredExponential
from markovflow_tpu.likelihoods import Gaussian
from markovflow_tpu.models.spatio_temporal_variational import (
    SpatioTemporalSparseCVI,
)

rng = np.random.default_rng(4)
N = 120
s = rng.uniform(0, 1, (N, 1))
t = np.sort(rng.uniform(0, 3, N))
x = jnp.asarray(np.concatenate([s, t[:, None]], axis=-1))
f = np.sin(3 * t) * np.cos(2 * s[:, 0])
y = jnp.asarray((f + 0.1 * rng.standard_normal(N))[:, None])

model = SpatioTemporalSparseCVI(
    inducing_space=jnp.asarray(np.linspace(0.05, 0.95, 5)[:, None]),
    inducing_time=jnp.asarray(np.linspace(0.0, 3.0, 8)),
    kernel_space=SquaredExponential(lengthscale=0.5),
    kernel_time=Matern32(lengthscale=1.0),
    likelihood=Gaussian(variance=0.01),
    learning_rate=0.8,
)
e0 = float(model.elbo((x, y)))
update = jax.jit(lambda m: m.update_sites((x, y)))
elbo = jax.jit(lambda m: m.elbo((x, y)))
for _ in range(12):
    model = update(model)
e1 = float(elbo(model))
print(f"ELBO {e0:.1f} -> {e1:.1f}")
assert e1 > e0
f_mu, f_var = jax.jit(lambda m, t: m.space_time_predict_f(t))(model, x)
rmse = float(jnp.sqrt(jnp.mean((f_mu[:, 0] - jnp.asarray(f)) ** 2)))
print("rmse:", rmse)
assert rmse < 0.3
