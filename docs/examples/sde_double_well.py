# %% [markdown]
# # Variational inference for a double-well SDE
# Mirrors the reference's SDE workflow (BASELINE config 5): simulate a
# nonlinear SDE, then infer the latent path by iterating statistical
# linearization and Kalman smoothing.
# %%
import jax
import jax.numpy as jnp
import numpy as np

from markovflow_tpu.emission_model import EmissionModel
from markovflow_tpu.kalman_filter import KalmanFilter
from markovflow_tpu.sde import (
    DoubleWellSDE,
    Gaussian,
    LinearDrift,
    euler_maruyama,
    linearize_sde,
    squared_drift_difference_along_Gaussian_path,
)

sde = DoubleWellSDE(q=0.5)
n = 80
ts = jnp.asarray(np.linspace(0, 4, n + 1))
key = jax.random.PRNGKey(7)
truth = euler_maruyama(sde, jnp.asarray([[1.0]]), ts, key)[0]
obs = truth + 0.2 * jax.random.normal(jax.random.fold_in(key, 1), truth.shape)

q_path = Gaussian(jnp.zeros((1, n, 1)), jnp.ones((1, n, 1, 1)))
init = Gaussian(jnp.asarray([[1.0]]), jnp.eye(1)[None] * 0.25)


@jax.jit
def vi_iteration(q_path):
    prior_ssm = linearize_sde(sde, ts, q_path, init)
    kf = KalmanFilter(prior_ssm, EmissionModel(jnp.ones((1, n + 1, 1, 1))),
                      obs[None], jnp.asarray([[0.2]]))
    post = kf.posterior_state_space_model()
    means, covs = post.marginals
    return Gaussian(means[..., 1:, :], covs[..., 1:, :, :]), post


for it in range(5):
    q_path, post = vi_iteration(q_path)

rmse = float(jnp.sqrt(jnp.mean((q_path.mu[0] - truth[1:]) ** 2)))
dt = float(ts[1] - ts[0])
drift = LinearDrift.from_ssm(post, dt)
kl = float(squared_drift_difference_along_Gaussian_path(
    sde, LinearDrift(A=drift.A[0, :, :, 0], b=drift.b[0]),
    Gaussian(q_path.mu[0], q_path.cov[0]), dt))
print(f"rmse={rmse:.3f}, KL surrogate={kl:.2f}")
assert rmse < 0.4
