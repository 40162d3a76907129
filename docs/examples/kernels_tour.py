# %% [markdown]
# # Choosing and combining kernels
# Mirrors the reference's choosing/combining/piecewise/stacked/factor
# analysis notebooks.
# %%
import jax.numpy as jnp
import numpy as np

from markovflow_tpu.kernels import (
    Constant,
    FactorAnalysisKernel,
    HarmonicOscillator,
    IndependentMultiOutput,
    LatentExponentiallyGenerated,
    Matern12,
    Matern32,
    Matern52,
    PiecewiseKernel,
    StackKernel,
    Sum,
)

ts = jnp.asarray(np.linspace(0, 4, 50))

# %% sums and products compose via operators
k = Matern32(lengthscale=1.0) * HarmonicOscillator(variance=1.0, period=2.0,
                                                   jitter=1e-10) \
    + Constant(variance=0.3, jitter=1e-10)
ssm = k.state_space_model(ts)
print("composite state dim:", k.state_dim)

# %% independent multi-output
imo = IndependentMultiOutput([Matern12(lengthscale=0.5),
                              Matern52(lengthscale=2.0)])
em = imo.generate_emission_model(ts)
f_var = em.project_state_covariance_to_f(
    imo.state_space_model(ts).marginal_covariances)
print("multi-output variances:", np.asarray(f_var)[0])

# %% piecewise-stationary: different lengthscale per regime
pw = PiecewiseKernel(
    [Matern32(lengthscale=0.3), Matern32(lengthscale=3.0)],
    change_points=jnp.asarray([2.0]))
ssm_pw = pw.state_space_model(jnp.asarray([0.0, 1.0, 2.0, 3.0, 4.0]))

# %% stacked independent outputs (shared time grid per output)
stack = StackKernel([Matern12(lengthscale=0.5), Matern32(lengthscale=2.0)])
ts_stack = jnp.broadcast_to(ts, (2, ts.shape[0]))
ssm_stack = stack.state_space_model(ts_stack)
print("stack batch shape:", ssm_stack.batch_shape)

# %% factor analysis: latent GPs mixed by a loading matrix
fak = FactorAnalysisKernel(
    weight_fn=lambda t: jnp.broadcast_to(jnp.eye(3),
                                         t.shape[:-1] + (t.shape[-1], 3, 3)),
    kernels=[Matern32(lengthscale=1.0), Matern12(lengthscale=0.4)],
    output_dim=3,
    loading=jnp.asarray(np.random.default_rng(0).standard_normal((3, 2))),
)
em_fa = fak.generate_emission_model(ts)
print("factor analysis output dim:", em_fa.output_dim)

# %% LEG kernel (learned stable linear SDE)
rng = np.random.default_rng(1)
leg = LatentExponentiallyGenerated(N=rng.standard_normal((2, 2)) * 0.5,
                                   R=rng.standard_normal((2, 2)),
                                   B=rng.standard_normal((1, 2)))
print("LEG marginal var:", float(
    leg.generate_emission_model(ts).project_state_covariance_to_f(
        leg.state_space_model(ts).marginal_covariances)[0, 0]))
