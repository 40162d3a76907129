# %% [markdown]
# # Intermittent demand with the multistage likelihood
# Mirrors the reference's multistage-likelihood notebook (Seeger et al. 2016):
# three latent GPs drive a zero/one/Poisson decision tree.
# %%
import jax
import jax.numpy as jnp
import numpy as np

from markovflow_tpu.kernels import IndependentMultiOutput, Matern32
from markovflow_tpu.likelihoods import MultiStageLikelihood
from markovflow_tpu.models.variational import VariationalGaussianProcess
from markovflow_tpu.ssm_natgrad import SSMNaturalGradient

rng = np.random.default_rng(5)
N = 60
x = jnp.asarray(np.linspace(0, 6, N))
lik = MultiStageLikelihood()
# synthetic intermittent counts
f_true = np.stack([np.sin(np.asarray(x)),
                   np.cos(np.asarray(x)),
                   0.3 * np.sin(2 * np.asarray(x))], axis=-1)
y = lik.sample_y(jax.random.PRNGKey(0), jnp.asarray(f_true))[:, None]

kernel = IndependentMultiOutput([Matern32(lengthscale=2.0, variance=1.0)
                                 for _ in range(3)])
model = VariationalGaussianProcess((x, y), kernel, lik)

opt = SSMNaturalGradient(gamma=0.3)
ssm = model.dist_q.non_trainable_copy()
state = None
elbo = jax.jit(lambda m: m.elbo())
step = opt.make_step(lambda s: model.with_dist_q(s).loss())  # jitted
e0 = float(elbo(model))
for _ in range(12):
    ssm, state, _ = step(ssm, state)
model = model.with_dist_q(ssm)
e1 = float(elbo(model))
print(f"ELBO {e0:.1f} -> {e1:.1f}")
assert e1 > e0
mean, var = model.posterior.predict_y(x)
print("mean demand range:", float(mean.min()), float(mean.max()))
