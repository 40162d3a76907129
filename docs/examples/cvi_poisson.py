# %% [markdown]
# # Log-Gaussian Cox process with CVI
# Mirrors the reference's CVI notebook: Poisson counts, conjugate site
# updates alternated with hyperparameter steps.
# %%
import jax.numpy as jnp
import numpy as np

from markovflow_tpu.kernels import Matern32
from markovflow_tpu.likelihoods import Poisson
from markovflow_tpu.models.variational_cvi import CVIGaussianProcess

rng = np.random.default_rng(2)
x = jnp.asarray(np.linspace(0, 6, 100))
rate = np.exp(1.2 * np.sin(2 * np.asarray(x)))
y = jnp.asarray(rng.poisson(rate)[:, None].astype(float))

model = CVIGaussianProcess((x, y), Matern32(lengthscale=1.0, variance=1.0),
                           Poisson(), learning_rate=0.7)
import jax
elbo = jax.jit(lambda m: m.classic_elbo())
update = jax.jit(lambda m: m.update_sites())
e0 = float(elbo(model))
for _ in range(20):
    model = update(model)
e1 = float(elbo(model))
print(f"ELBO {e0:.1f} -> {e1:.1f}")
assert e1 > e0

lam_mean, lam_var = jax.jit(lambda m, t: m.posterior.predict_y(t))(model, x)
corr = np.corrcoef(np.asarray(lam_mean)[:, 0], rate)[0, 1]
print("rate correlation:", corr)
assert corr > 0.8
