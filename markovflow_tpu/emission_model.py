"""Emission models: f = H x projections from state space to observation space.

Rebuild of the reference's ``markovflow/emission_model.py`` (378 LoC): the
emission matrix is stored time-batched ``[..., N, output_dim, state_dim]`` and
all projections are einsums (no loops), so they fuse into the surrounding
scan/filter computations under XLA.
"""
from __future__ import annotations

import jax.numpy as jnp

from .utils.module import Module

__all__ = ["EmissionModel", "ComposedPairEmissionModel", "StackEmissionModel"]


class EmissionModel(Module):
    """Linear emission f = H x (reference: emission_model.py:25-153)."""

    def __init__(self, emission_matrix: jnp.ndarray):
        self.emission_matrix = emission_matrix  # [..., N, out, d]

    @property
    def output_dim(self) -> int:
        return self.emission_matrix.shape[-2]

    @property
    def state_dim(self) -> int:
        return self.emission_matrix.shape[-1]

    @property
    def batch_shape(self):
        return self.emission_matrix.shape[:-3]

    @property
    def num_data_points(self) -> int:
        return self.emission_matrix.shape[-3]

    def project_state_to_f(self, state: jnp.ndarray) -> jnp.ndarray:
        """[..., N, d] -> [..., N, out] (reference: :115-128)."""
        return jnp.einsum("...nij,...nj->...ni", self.emission_matrix, state)

    def project_state_covariance_to_f(
        self, covariance: jnp.ndarray, full_output_cov: bool = False
    ) -> jnp.ndarray:
        """[..., N, d, d] -> [..., N, out, out] or diag [..., N, out]
        (reference: :130-153)."""
        if full_output_cov:
            return jnp.einsum(
                "...nij,...njk,...nlk->...nil",
                self.emission_matrix, covariance, self.emission_matrix,
            )
        return jnp.einsum(
            "...nij,...njk,...nik->...ni",
            self.emission_matrix, covariance, self.emission_matrix,
        )

    def project_state_marginals_to_f(self, means, covariances,
                                     full_output_cov: bool = False):
        return (
            self.project_state_to_f(means),
            self.project_state_covariance_to_f(covariances, full_output_cov),
        )


class ComposedPairEmissionModel(EmissionModel):
    """H = H_outer @ H_inner, with projections to the intermediate space g
    (reference: emission_model.py:157-266).  Used by FactorAnalysisKernel."""

    def __init__(self, outer_emission: EmissionModel, inner_emission: EmissionModel):
        self.outer = outer_emission
        self.inner = inner_emission
        self.emission_matrix = (
            outer_emission.emission_matrix @ inner_emission.emission_matrix
        )

    def project_state_to_g(self, state):
        return self.inner.project_state_to_f(state)

    def project_state_covariance_to_g(self, covariance, full_output_cov=False):
        return self.inner.project_state_covariance_to_f(covariance, full_output_cov)


class StackEmissionModel(EmissionModel):
    """Per-kernel emission for StackKernel: the trailing batch dim indexes the
    stacked kernels; projections move it to the output dim
    (reference: emission_model.py:270-378).

    emission_matrix: [..., num_kernels, N, 1, d].
    """

    @property
    def output_dim(self) -> int:
        return self.emission_matrix.shape[-4]  # num_kernels

    def project_state_to_f(self, state):
        """state [..., K, N, d] -> f [..., N, K]."""
        f = jnp.einsum("...snij,...snj->...sni", self.emission_matrix, state)
        return jnp.moveaxis(f[..., 0], -2, -1)

    def project_state_covariance_to_f(self, covariance, full_output_cov=False):
        """covariance [..., K, N, d, d] -> [..., N, K] (diagonal only: the
        stacked kernels are independent, so full output cov is diagonal)."""
        var = jnp.einsum(
            "...snij,...snjk,...snik->...sni",
            self.emission_matrix, covariance, self.emission_matrix,
        )
        var = jnp.moveaxis(var[..., 0], -2, -1)  # [..., N, K]
        if full_output_cov:
            k = var.shape[-1]
            return var[..., None] * jnp.eye(k, dtype=var.dtype)
        return var
