# %% [markdown]
# # Sparse inference: SVGP, sparse CVI, sparse PEP, IWVI
# Mirrors the reference's sparse notebooks: inducing states on a coarse time
# grid carry all the state; data only enters through conditionals.
# %%
import jax
import jax.numpy as jnp
import numpy as np

from markovflow_tpu.kernels import Matern32
from markovflow_tpu.likelihoods import Gaussian, PEPGaussian
from markovflow_tpu.models.iwvi import ImportanceWeightedVI
from markovflow_tpu.models.sparse_pep import SparsePowerExpectationPropagation
from markovflow_tpu.models.sparse_variational import (
    SparseVariationalGaussianProcess,
)
from markovflow_tpu.models.sparse_variational_cvi import (
    SparseCVIGaussianProcess,
)
from markovflow_tpu.ssm_natgrad import SSMNaturalGradient

rng = np.random.default_rng(3)
N, M = 200, 15
x = jnp.asarray(np.sort(rng.uniform(0, 6, N)))
y = jnp.asarray((np.sin(2 * np.asarray(x))
                 + 0.2 * rng.standard_normal(N))[:, None])
z = jnp.asarray(np.linspace(-0.1, 6.1, M))
lik = Gaussian(variance=0.04)

# %% SVGP with natural gradients
svgp = SparseVariationalGaussianProcess(
    Matern32(lengthscale=1.0), lik, inducing_points=z, num_data=N)
opt = SSMNaturalGradient(gamma=0.8)
ssm = svgp.dist_q.non_trainable_copy()
state = None
step = opt.make_step(lambda s: svgp.with_dist_q(s).loss((x, y)))  # jitted
for _ in range(10):
    ssm, state, _ = step(ssm, state)
svgp = svgp.with_dist_q(ssm)
print("SVGP elbo:", float(svgp.elbo((x, y))))

# %% sparse CVI
scvi = SparseCVIGaussianProcess(Matern32(lengthscale=1.0), z, lik,
                                learning_rate=0.8)
scvi_update = jax.jit(lambda m: m.update_sites((x, y)))
for _ in range(10):
    scvi = scvi_update(scvi)
print("SCVI elbo:", float(scvi.classic_elbo((x, y))))

# %% sparse PEP
spep = SparsePowerExpectationPropagation(
    Matern32(lengthscale=1.0), z, PEPGaussian(Gaussian(variance=0.04)),
    learning_rate=0.5, alpha=0.8)
for _ in range(8):
    spep = spep.update_sites((x, y))
print("SPEP elbo:", float(spep.classic_elbo((x, y))))

# %% importance-weighted VI
iwvi = ImportanceWeightedVI(Matern32(lengthscale=1.0), z, lik,
                            num_importance_samples=8)
print("IW-ELBO:", float(iwvi.elbo((x, y), jax.random.PRNGKey(0))))

f_s, _ = svgp.predict_f(x)
f_c, _ = scvi.predict_f(x)
assert float(jnp.max(jnp.abs(f_s - f_c))) < 0.3
