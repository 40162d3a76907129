# %% [markdown]
# # GP classification with VGP + natural gradients
# Mirrors the reference's variational notebook: Bernoulli likelihood,
# full-rank SSM posterior, natural-gradient updates.
# %%
import jax
import jax.numpy as jnp
import numpy as np

from markovflow_tpu.kernels import Matern52
from markovflow_tpu.likelihoods import Bernoulli
from markovflow_tpu.models.variational import VariationalGaussianProcess
from markovflow_tpu.ssm_natgrad import SSMNaturalGradient

rng = np.random.default_rng(1)
N = 80
x = jnp.asarray(np.linspace(0, 8, N))
labels = jnp.asarray((np.sin(np.asarray(x)) > 0).astype(float)[:, None])

model = VariationalGaussianProcess(
    (x, labels), Matern52(lengthscale=1.0, variance=4.0), Bernoulli())

opt = SSMNaturalGradient(gamma=0.5)
ssm = model.dist_q.non_trainable_copy()
state = None
step = opt.make_step(lambda s: model.with_dist_q(s).loss())  # jitted
for _ in range(15):
    ssm, state, loss = step(ssm, state)
model = model.with_dist_q(ssm)
p, _ = jax.jit(lambda m, t: m.posterior.predict_y(t))(model, x)
acc = float(jnp.mean((p[:, 0] > 0.5) == (labels[:, 0] > 0.5)))
print("train accuracy:", acc)
assert acc > 0.9
