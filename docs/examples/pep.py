# %% [markdown]
# # Power expectation propagation (PEP and sparse PEP)
# Mirrors the reference's `markovflow_pep.py` / `markovflow_sparse_pep.py`
# notebooks: site-based inference with alpha-divergence moment matching.
# alpha -> 0 recovers variational inference, alpha = 1 is classic EP.
# %%
import jax.numpy as jnp
import numpy as np

from markovflow_tpu.kernels import Matern32
from markovflow_tpu.likelihoods import Gaussian, PEPGaussian
from markovflow_tpu.models import (
    GaussianProcessRegression,
    PowerExpectationPropagation,
    SparsePowerExpectationPropagation,
)

rng = np.random.default_rng(3)
N = 60
NOISE = 0.3
x = np.sort(rng.uniform(0, 6, N))
y = np.sin(2 * x) + NOISE * rng.standard_normal(N)
data = (jnp.asarray(x), jnp.asarray(y[:, None]))

# %% [markdown]
# ## Dense PEP: with a Gaussian likelihood and alpha = 1 the EP fixed point
# is the exact posterior, so the PEP evidence equals the GPR evidence.
# %%
pep = PowerExpectationPropagation(
    Matern32(lengthscale=1.0, variance=1.0), data,
    PEPGaussian(Gaussian(variance=NOISE**2)), learning_rate=1.0, alpha=1.0)
import jax
update = jax.jit(lambda m: m.update_sites())
for _ in range(4):
    pep = update(pep)

gpr = GaussianProcessRegression(
    data, Matern32(lengthscale=1.0, variance=1.0), jnp.asarray([[NOISE]]))
print("PEP evidence:", float(pep.elbo()))
print("GPR evidence:", float(gpr.log_likelihood()))
assert abs(float(pep.elbo()) - float(gpr.log_likelihood())) < 1e-4

# %% [markdown]
# The PEP energy is the alpha-divergence objective for hyperparameter
# learning (reference: pep.py:223-230).
# %%
print("PEP energy:", float(pep.energy()))
assert np.isfinite(float(pep.energy()))

# %% [markdown]
# ## Fractional alpha: same machinery, alpha = 0.5 interpolates EP <-> VI.
# %%
pep_half = PowerExpectationPropagation(
    Matern32(lengthscale=1.0, variance=1.0), data,
    PEPGaussian(Gaussian(variance=NOISE**2)), learning_rate=0.8, alpha=0.5)
for _ in range(8):
    pep_half = update(pep_half)
f_h, v_h = pep_half.predict_f(jnp.asarray([1.0, 3.0]))
f_g, v_g = gpr.predict_f(jnp.asarray([1.0, 3.0]))
print("alpha=0.5 posterior mean:", np.asarray(f_h)[:, 0])
np.testing.assert_allclose(np.asarray(f_h), np.asarray(f_g), atol=5e-3)

# %% [markdown]
# ## Sparse PEP: sites on pairs of consecutive inducing states.
# %%
M = 12
spep = SparsePowerExpectationPropagation(
    kernel=Matern32(lengthscale=1.0, variance=1.0),
    inducing_points=jnp.asarray(np.linspace(-0.1, 6.1, M)),
    likelihood=PEPGaussian(Gaussian(variance=NOISE**2)),
    learning_rate=0.8, alpha=1.0)
supdate = jax.jit(lambda m, d: m.update_sites(d))
for _ in range(10):
    spep = supdate(spep, data)
energy = float(spep.energy(data))
print("sparse PEP energy:", energy)
assert np.isfinite(energy)
f_s, v_s = spep.predict_f(jnp.asarray([1.0, 3.0]))
np.testing.assert_allclose(np.asarray(f_s), np.asarray(f_g), atol=0.15)
