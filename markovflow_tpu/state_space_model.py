"""Discrete linear-Gaussian state-space model (the central distribution).

TPU-native rebuild of the reference's ``StateSpaceModel``
(reference: markovflow/state_space_model.py:35-664).  Differences by design:

* It is a pytree Module of ``(mu0, chol_P0, A_s, b_s, chol_Q_s)`` — leaves may
  be raw arrays or constrained :class:`Parameter` s (replacing
  ``create_trainable_copy``, reference: state_space_model.py:375-429).
* Marginal means/covariances and sampling run as O(log T)-depth
  ``associative_scan`` affine recursions (:mod:`markovflow_tpu.ops.scans`)
  instead of sequential banded solves / sparse-inverse C++ ops
  (reference: state_space_model.py:232-324).
* The joint precision is still available in closed form as a
  SymmetricBlockTriDiagonal (SpInGP, reference: state_space_model.py:431-483)
  for the precision-space code paths (natural-parameter transforms).

The model is, for states x_0 .. x_T (T = num_transitions):

    x_0 ~ N(mu0, P0),   x_{k+1} = A_k x_k + b_k + q_k,  q_k ~ N(0, Q_k)
"""
from __future__ import annotations

from typing import Union

import jax
import jax.numpy as jnp

from .block_tri_diag import SymmetricBlockTriDiagonal
from .gauss_markov import GaussMarkovDistribution, check_compatible
from .ops.scans import affine_cov_scan, affine_scan
from .utils.bijectors import triangular
from .utils.linalg import cholesky_or_zero, mvn_logpdf, symmetrize, tlt
from .utils.module import Parameter

__all__ = ["StateSpaceModel", "state_space_model_from_covariances"]

ArrayOrParam = Union[jnp.ndarray, Parameter]


def _v(x):
    return x.value if isinstance(x, Parameter) else x


class StateSpaceModel(GaussMarkovDistribution):
    def __init__(self, initial_mean, chol_initial_covariance, state_transitions,
                 state_offsets, chol_process_covariances):
        """Shapes: mu0 [..., d]; chol_P0 [..., d, d]; A_s [..., T, d, d];
        b_s [..., T, d]; chol_Q_s [..., T, d, d]."""
        self._mu0 = initial_mean
        self._chol_P0 = chol_initial_covariance
        self._A_s = state_transitions
        self._b_s = state_offsets
        self._chol_Q_s = chol_process_covariances

    # --- raw accessors -------------------------------------------------
    @property
    def initial_mean(self):
        return _v(self._mu0)

    @property
    def cholesky_initial_covariance(self):
        return _v(self._chol_P0)

    @property
    def state_transitions(self):
        return _v(self._A_s)

    @property
    def state_offsets(self):
        return _v(self._b_s)

    @property
    def cholesky_process_covariances(self):
        return _v(self._chol_Q_s)

    @property
    def initial_covariance(self):
        l0 = self.cholesky_initial_covariance
        return l0 @ tlt(l0)

    @property
    def process_covariances(self):
        lq = self.cholesky_process_covariances
        return lq @ tlt(lq)

    # --- shapes ---------------------------------------------------------
    @property
    def state_dim(self) -> int:
        return self.state_transitions.shape[-1]

    @property
    def num_transitions(self) -> int:
        return self.state_transitions.shape[-3]

    @property
    def batch_shape(self):
        return self.initial_mean.shape[:-1]

    @property
    def event_shape(self):
        return (self.num_transitions + 1, self.state_dim)

    @property
    def dtype(self):
        return self.initial_mean.dtype

    # --- affine-scan elements -------------------------------------------
    def _prefix_elements(self):
        """(F, c, Q) with element 0 encoding the initial distribution."""
        mu0, l0 = self.initial_mean, self.cholesky_initial_covariance
        A, b, lq = self.state_transitions, self.state_offsets, \
            self.cholesky_process_covariances
        d = self.state_dim
        zero_A = jnp.zeros(A.shape[:-3] + (1, d, d), A.dtype)
        F = jnp.concatenate([zero_A, A], axis=-3)
        c = jnp.concatenate([mu0[..., None, :], b], axis=-2)
        Q = jnp.concatenate(
            [(l0 @ tlt(l0))[..., None, :, :], lq @ tlt(lq)], axis=-3
        )
        return F, c, Q

    @property
    def marginal_means(self) -> jnp.ndarray:
        """[..., T+1, d] via parallel affine scan (reference: :232-251)."""
        F, c, _ = self._prefix_elements()
        return affine_scan(F, c)

    @property
    def marginal_covariances(self) -> jnp.ndarray:
        """[..., T+1, d, d] via parallel affine scan (reference: :254-262)."""
        F, c, Q = self._prefix_elements()
        _, covs = affine_cov_scan(F, c, Q)
        return covs

    @property
    def marginals(self):
        F, c, Q = self._prefix_elements()
        return affine_cov_scan(F, c, Q)

    def marginals_tl(self):
        """(means [..., d, 1, N+1], covs [..., d, d, N+1]) in time-last
        layout — the layout every training-graph consumer (KL,
        expectations, VGP ELBO) actually works in.  Exposed so those
        consumers can share ONE scan per step: each distinct scan instance
        costs XLA a separate while-loop body to compile, and the f64
        VGP/natgrad graphs were paying for the same q-marginals three
        times (ELBO projection, KL, ssm_to_expectations)."""
        from .ops.kalman import _mm_tl, _t_tl, _to_tl
        from .ops.scans import affine_cov_scan_tl

        a_tl = _to_tl(self.state_transitions)
        zero_a = jnp.zeros_like(a_tl[..., :1])
        f_tl = jnp.concatenate([zero_a, a_tl], axis=-1)
        c_tl = jnp.concatenate(
            [self.initial_mean[..., None, None],
             _to_tl(self.state_offsets[..., None])], axis=-1)
        chols = jnp.concatenate(
            [self.cholesky_initial_covariance[..., None],
             _to_tl(self.cholesky_process_covariances)], axis=-1)
        q_tl = _mm_tl(chols, _t_tl(chols))
        return affine_cov_scan_tl(f_tl, c_tl, q_tl)

    def subsequent_covariances(self, marginal_covariances=None) -> jnp.ndarray:
        """Cov(x_{k+1}, x_k) = A_k P_k, [..., T, d, d] (reference: :326-341)."""
        if marginal_covariances is None:
            marginal_covariances = self.marginal_covariances
        return self.state_transitions @ marginal_covariances[..., :-1, :, :]

    def covariance_blocks(self):
        covs = self.marginal_covariances
        return covs, self.subsequent_covariances(covs)

    # --- sampling ---------------------------------------------------------
    def sample(self, key, sample_shape=()) -> jnp.ndarray:
        """Draw [sample_shape..., batch..., T+1, d] via parallel affine scan.

        Replaces the sequential bidiagonal solve (reference: :298-324).
        """
        if isinstance(sample_shape, int):
            sample_shape = (sample_shape,)
        n_states = self.num_transitions + 1
        d = self.state_dim
        shape = tuple(sample_shape) + self.batch_shape + (n_states, d)
        eps = jax.random.normal(key, shape, dtype=self.dtype)
        l0 = self.cholesky_initial_covariance
        lq = self.cholesky_process_covariances
        chols = jnp.concatenate(
            [jnp.broadcast_to(l0[..., None, :, :],
                              self.batch_shape + (1, d, d)), lq], axis=-3
        )
        noise = jnp.einsum("...nij,...nj->...ni", chols, eps)
        mu0, b = self.initial_mean, self.state_offsets
        c = jnp.concatenate(
            [jnp.broadcast_to(mu0[..., None, :], self.batch_shape + (1, d)), b],
            axis=-2,
        )
        c_full = c + noise  # broadcasts over sample dims
        A = self.state_transitions
        zero_A = jnp.zeros(self.batch_shape + (1, d, d), self.dtype)
        F = jnp.concatenate([zero_A, jnp.broadcast_to(
            A, self.batch_shape + (self.num_transitions, d, d))], axis=-3)
        F_full = jnp.broadcast_to(F, tuple(sample_shape) + F.shape)
        return affine_scan(F_full, c_full)

    # --- densities ----------------------------------------------------------
    @property
    def log_det_precision(self) -> jnp.ndarray:
        """log |K^{-1}| = -log|P0| - sum_k log|Q_k| (reference: :343-373)."""
        l0 = self.cholesky_initial_covariance
        lq = self.cholesky_process_covariances
        ld0 = 2.0 * jnp.sum(jnp.log(jnp.abs(
            jnp.diagonal(l0, axis1=-2, axis2=-1))), axis=-1)
        ldq = 2.0 * jnp.sum(jnp.log(jnp.abs(
            jnp.diagonal(lq, axis1=-2, axis2=-1))), axis=(-1, -2))
        return -(ld0 + ldq)

    def log_pdf(self, states: jnp.ndarray) -> jnp.ndarray:
        """log p(x_0..x_T) for states [sample..., batch..., T+1, d]
        (reference: :485-526)."""
        x0 = states[..., 0, :]
        lp0 = mvn_logpdf(x0, self.initial_mean, self.cholesky_initial_covariance)
        pred = jnp.einsum(
            "...nij,...nj->...ni", self.state_transitions, states[..., :-1, :]
        ) + self.state_offsets
        lpt = mvn_logpdf(states[..., 1:, :], pred,
                         self.cholesky_process_covariances)
        return lp0 + jnp.sum(lpt, axis=-1)

    def kl_divergence(self, other: "StateSpaceModel",
                      marginals_tl=None) -> jnp.ndarray:
        """KL[self || other], closed form from marginal/pairwise statistics
        (reference: :528-593).

        Runs in time-last layout: the per-transition terms are elementwise
        d x d algebra over N, and the standard [N, d, d] layout tile-pads
        every block to an (8, 128) TPU tile with time-middle dot_generals
        (measured 223x slower; see ops/kalman.py).  This sits inside every
        VGP/natgrad training graph, so its layout decides that family's
        compile and step time.

        ``marginals_tl``: optional precomputed ``self.marginals_tl()`` —
        pass it when the caller already has the marginals (VGP ELBO does)
        so the graph carries one scan instead of two.
        """
        from .ops.kalman import _inv_tl, _mm_tl, _sym_tl, _t_tl, _to_tl

        check_compatible(self, other)
        q, p = self, other
        n_states = q.num_transitions + 1
        d = q.state_dim
        dtype = q.dtype

        # TL marginals of q
        aq_tl = _to_tl(q.state_transitions)
        mq, pq = (marginals_tl if marginals_tl is not None
                  else q.marginals_tl())  # [d,1,N+1], [d,d,N+1]
        cq = _mm_tl(aq_tl, pq[..., :-1])  # Cov(x_{k+1}, x_k) [d,d,N]

        # E_q[log q] = 0.5 log|Kq^{-1}| - 0.5 (T+1) d log(2 pi e)
        e_log_q = 0.5 * q.log_det_precision - 0.5 * n_states * d * (
            jnp.log(jnp.asarray(2.0 * jnp.pi, dtype)) + 1.0)

        # E_q[log p]: initial term (one block — standard layout is fine)
        l0p = p.cholesky_initial_covariance
        term0 = mvn_logpdf(mq[..., 0, 0], p.initial_mean, l0p)
        x = jax.scipy.linalg.solve_triangular(
            l0p, pq[..., 0], lower=True)
        x = jax.scipy.linalg.solve_triangular(tlt(l0p), x, lower=False)
        term0 -= 0.5 * jnp.trace(x, axis1=-2, axis2=-1)  # tr(P0p^{-1} Pq0)

        # transition terms, all TL
        ap_tl = _to_tl(p.state_transitions)
        bp_tl = _to_tl(p.state_offsets[..., None])
        lqp_tl = _to_tl(p.cholesky_process_covariances)
        r_mean = mq[..., 1:] - _mm_tl(ap_tl, mq[..., :-1]) - bp_tl
        ap_cq_t = _mm_tl(ap_tl, _t_tl(cq))  # Ap Cq^T
        r_cov = (pq[..., 1:] - ap_cq_t - _t_tl(ap_cq_t)
                 + _mm_tl(ap_tl, _mm_tl(pq[..., :-1], _t_tl(ap_tl))))
        qp_inv = _inv_tl(_sym_tl(_mm_tl(lqp_tl, _t_tl(lqp_tl))))
        maha = jnp.sum(r_mean * _mm_tl(qp_inv, r_mean), axis=(-3, -2))
        diag_lqp = jnp.stack(
            [lqp_tl[..., i, i, :] for i in range(d)], axis=-2)
        log_det_qp = 2.0 * jnp.sum(jnp.log(jnp.abs(diag_lqp)), axis=-2)
        log2pi = jnp.log(jnp.asarray(2.0 * jnp.pi, dtype))
        term_t = -0.5 * (maha + log_det_qp + d * log2pi)
        # tr(Qp^{-1} r_cov): elementwise contraction of two symmetric blocks
        term_t -= 0.5 * jnp.sum(qp_inv * _sym_tl(r_cov), axis=(-3, -2))
        e_log_p = term0 + jnp.sum(term_t, axis=-1)
        return e_log_q - e_log_p

    # --- precision space --------------------------------------------------
    def precision(self) -> SymmetricBlockTriDiagonal:
        """Joint precision K^{-1} = A^{-T} Q^{-1} A^{-1}, block-tridiagonal
        (SpInGP closed form, reference: :431-483)."""
        d = self.state_dim
        eye = jnp.eye(d, dtype=self.dtype)
        l0 = self.cholesky_initial_covariance
        lq = self.cholesky_process_covariances
        A = self.state_transitions

        from .utils.linalg import small_inv

        def inv_from_chol(l):
            return small_inv(symmetrize(l @ tlt(l)))

        p0_inv = inv_from_chol(l0)
        q_inv = inv_from_chol(lq)
        at_qinv = jnp.einsum("...nji,...njk->...nik", A, q_inv)  # A^T Q^{-1}
        at_qinv_a = at_qinv @ A
        diag_first = (p0_inv + at_qinv_a[..., 0, :, :])[..., None, :, :]
        if self.num_transitions > 1:
            diag_mid = q_inv[..., :-1, :, :] + at_qinv_a[..., 1:, :, :]
            diag = jnp.concatenate(
                [diag_first, diag_mid, q_inv[..., -1:, :, :]], axis=-3)
        else:
            diag = jnp.concatenate([diag_first, q_inv], axis=-3)
        sub = -q_inv @ A  # block (k+1, k)
        return SymmetricBlockTriDiagonal(symmetrize(diag), sub)

    @property
    def normalizer(self) -> jnp.ndarray:
        """Log-partition of the Gaussian in natural form (reference: :595-609):
        0.5 (mu^T K^{-1} mu + (T+1) d log 2pi - log|K^{-1}|)."""
        means = self.marginal_means
        prec = self.precision()
        kinv_mu = prec.block_mult_vector(means)
        quad = jnp.sum(means * kinv_mu, axis=(-1, -2))
        n_states = self.num_transitions + 1
        return 0.5 * (
            quad
            + n_states * self.state_dim * jnp.log(
                jnp.asarray(2.0 * jnp.pi, self.dtype))
            - self.log_det_precision
        )

    # --- trainability -------------------------------------------------------
    def trainable_copy(self) -> "StateSpaceModel":
        """Copy with all five fields wrapped as trainable Parameters
        (Cholesky factors via FillTriangular; reference: :375-429)."""
        tri = triangular()
        return StateSpaceModel(
            Parameter(self.initial_mean),
            Parameter(self.cholesky_initial_covariance, transform=tri),
            Parameter(self.state_transitions),
            Parameter(self.state_offsets),
            Parameter(self.cholesky_process_covariances, transform=tri),
        )

    def non_trainable_copy(self) -> "StateSpaceModel":
        return StateSpaceModel(
            self.initial_mean,
            self.cholesky_initial_covariance,
            self.state_transitions,
            self.state_offsets,
            self.cholesky_process_covariances,
        )


def state_space_model_from_covariances(
    initial_mean, initial_covariance, state_transitions, state_offsets,
    process_covariances,
) -> StateSpaceModel:
    """Build an SSM from (non-Cholesky) covariances, mapping exactly-zero
    covariance blocks to zero Cholesky factors
    (reference: state_space_model.py:612-664)."""
    return StateSpaceModel(
        initial_mean,
        cholesky_or_zero(initial_covariance),
        state_transitions,
        state_offsets,
        cholesky_or_zero(process_covariances),
    )
