# %% [markdown]
# # Exact GP regression with a Markovian kernel
# Mirrors the reference's `markovflow_gpr` notebook: fit hyperparameters by
# maximum likelihood and predict off-grid.
# %%
import jax
import jax.numpy as jnp
import numpy as np

from markovflow_tpu.kernels import Matern32
from markovflow_tpu.models import GaussianProcessRegression
from markovflow_tpu.training import fit

rng = np.random.default_rng(0)
N = 300
x = np.sort(rng.uniform(0, 6, N))
y = (np.sin(3 * x) + 0.3 * rng.standard_normal(N))[:, None]

model = GaussianProcessRegression(
    input_data=(jnp.asarray(x), jnp.asarray(y)),
    kernel=Matern32(lengthscale=2.0, variance=0.5),
    chol_obs_covariance=jnp.asarray([[0.4]]),
)
model, losses = fit(model, num_steps=60)
assert float(losses[-1]) < float(losses[0])

# %% predictions and posterior samples
x_new = jnp.linspace(-0.5, 6.5, 200)
f_mean, f_var = model.predict_f(x_new)
y_mean, y_var = jax.jit(lambda m, t: m.posterior.predict_y(t))(model, x_new)
samples = model.posterior.sample_f(x_new, 5, jax.random.PRNGKey(0))
assert samples.shape == (5, 200, 1)
print("learned lengthscale:", float(model.kernel.lengthscale.value))
