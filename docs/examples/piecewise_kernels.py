# %% [markdown]
# # Piecewise-stationary kernels
# Mirrors the reference's `piecewise_kernels.py` notebook: a GP whose
# kernel switches at known change points — a different stationary child
# kernel (and state mean) on each segment, exact inference throughout.
# %%
import jax.numpy as jnp
import numpy as np

from markovflow_tpu.kernels import Matern32, PiecewiseKernel
from markovflow_tpu.likelihoods import Gaussian
from markovflow_tpu.models import CVIGaussianProcess

rng = np.random.default_rng(4)

# three regimes: slow/large, fast/small, medium — switching at t = 3 and 6
change_points = jnp.asarray([3.0, 6.0])
children = [
    Matern32(lengthscale=2.0, variance=1.5),
    Matern32(lengthscale=0.3, variance=0.3),
    Matern32(lengthscale=1.0, variance=0.8),
]
kernel = PiecewiseKernel(children, change_points)

# synthetic data with matching regime structure
N = 90
x = np.sort(rng.uniform(0, 9, N))
f = np.where(x < 3, np.sin(0.8 * x),
             np.where(x < 6, 0.5 * np.sin(6 * x), np.sin(2 * x)))
y = f + 0.2 * rng.standard_normal(N)
data = (jnp.asarray(x), jnp.asarray(y[:, None]))

# %% site-based inference (any likelihood works; Gaussian here)
model = CVIGaussianProcess(data, kernel, Gaussian(variance=0.04),
                           learning_rate=1.0)
model = model.update_sites()
print("ELBO:", float(model.elbo()))
assert np.isfinite(float(model.elbo()))

# %% predictions across segment boundaries are exact and continuous
x_grid = jnp.asarray(np.linspace(0, 9, 181))
f_mu, f_var = model.predict_f(x_grid)
assert np.all(np.isfinite(np.asarray(f_mu)))
assert np.all(np.asarray(f_var) > 0)
rmse = float(np.sqrt(np.mean(
    (np.asarray(f_mu)[:, 0] - np.interp(np.asarray(x_grid), x, f)) ** 2)))
print("grid RMSE vs truth:", rmse)
assert rmse < 0.35

# %% [markdown]
# Children may also carry nonzero state means: the prior then reverts to a
# different level per segment (reference: piecewise_stationary.py:248-288).
# %%
children_m = [k.set_state_mean(jnp.asarray([m, 0.0]))
              for k, m in zip(children, (1.0, -1.0, 0.5))]
kernel_m = PiecewiseKernel(children_m, change_points)
prior = kernel_m.state_space_model(jnp.asarray(np.linspace(0, 9, 19)))
levels = np.asarray(prior.marginal_means)[:, 0]
print("prior mean levels:", levels[:3], levels[8:11], levels[-3:])
assert abs(levels[0] - 1.0) < 1e-6
