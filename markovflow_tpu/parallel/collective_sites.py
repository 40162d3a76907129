"""Data-sharded explicit-collective site updates for the sparse CVI family.

The sparse pair-site models (:class:`~markovflow_tpu.models.
sparse_variational_cvi.SparseCVIGaussianProcess`; same structure in the
spatio-temporal CVI) scale in the DATA axis: N observations project onto
M + 1 pair sites over a small inducing grid.  The multi-device story is
therefore data-parallel, not sequence-parallel:

  * the N data points shard over the mesh's ``sp`` axis;
  * the inducing grid, the sites, and the O(M) posterior inversion are
    replicated (M is small by design — that is the point of sparsity);
  * each shard projects its local points through the conditional
    p(f_k | v_m) onto their bracketing inducing pairs and segment-sums
    locally; ONE ``psum`` of the [M+1, 2d] / [M+1, 2d, 2d] site-statistic
    arrays merges the shards.

Communication per update: O(M d^2), independent of N — the same contract
as the sequence-parallel collective scans (collective_scan.py), reached
with a single collective because the site axis is already the reduction
axis.  (Reference counterpart: the sequential ``tf.dynamic_partition``
segment sums in sparse_variational_cvi.py:176-221 — single-process only.)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["sharded_pair_site_update", "sharded_pair_site_elbo"]


def _shard_over_data(body, model, x, y, *, mesh, axis, out_specs):
    """Run ``body(model, x_local, y_local)`` under shard_map with the data
    sharded over ``axis`` and the model replicated.

    The model travels as its FLAT leaves and is rebuilt inside the body:
    Module.tree_flatten classifies attributes dynamically (arrays are
    children, the rest static), so a specs tree built by mapping leaves to
    ``P()`` — an empty tuple — would re-classify and change structure.
    """
    leaves, treedef = jax.tree_util.tree_flatten(model)

    def wrapped(leaves_, xl, yl):
        return body(jax.tree_util.tree_unflatten(treedef, leaves_), xl, yl)

    fn = jax.shard_map(
        wrapped, mesh=mesh,
        in_specs=([P()] * len(leaves), P(axis), P(axis, None)),
        out_specs=out_specs)
    return fn(leaves, x, y)


def sharded_pair_site_update(model, input_data, *, mesh: Mesh,
                             axis: str = "sp"):
    """One CVI site update with the data axis sharded over ``axis``.

    ``model`` must expose the pair-site protocol (``posterior``,
    ``local_objective_and_gradients``, ``inducing_inputs``, ``kernel``,
    ``nat1``/``nat2``, ``learning_rate``); N must divide the axis size.
    Returns the updated model (sites replicated on every device).
    """
    from ..conditionals import conditional_statistics

    x, y = input_data
    m_seg = model.inducing_inputs.shape[-1] + 1

    def body(m, xl, yl):
        f_mu, f_var = m.posterior.predict_f(xl)
        _, (g1, g2) = m.local_objective_and_gradients(f_mu, f_var, yl)
        h = m.kernel.generate_emission_model(xl).emission_matrix
        p_proj, _, _, indices = conditional_statistics(
            xl, m.inducing_inputs, m.kernel)
        hp_row = (h @ p_proj)[..., 0, :]  # [N_local, 2d]
        s1 = jax.ops.segment_sum(hp_row * g1, indices, num_segments=m_seg)
        s2 = jax.ops.segment_sum(
            g2[..., None] * hp_row[..., :, None] * hp_row[..., None, :],
            indices, num_segments=m_seg)
        # the ONE collective: merge per-shard site statistics
        s1 = jax.lax.psum(s1, axis)
        s2 = jax.lax.psum(s2, axis)
        lr = m.learning_rate
        return (1 - lr) * m.nat1 + lr * s1, (1 - lr) * m.nat2 + lr * s2

    nat1, nat2 = _shard_over_data(body, model, x, y, mesh=mesh, axis=axis,
                                  out_specs=(P(), P()))
    return model.replace(nat1=nat1, nat2=nat2)


def sharded_pair_site_elbo(model, input_data, *, mesh: Mesh,
                           axis: str = "sp"):
    """`classic_elbo` with the variational-expectation sum sharded over the
    data axis (one scalar ``psum``); the O(M) KL is replicated."""
    x, y = input_data

    def body(m, xl, yl):
        f_mu, f_var = m.posterior.predict_f(xl)
        ve = jnp.sum(m.likelihood.variational_expectations(f_mu, f_var, yl))
        ve = jax.lax.psum(ve, axis)
        kl = jnp.sum(m.dist_q.kl_divergence(m.dist_p))
        return ve - kl

    return _shard_over_data(body, model, x, y, mesh=mesh, axis=axis,
                            out_specs=P())
