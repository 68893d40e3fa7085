"""Input projections: PCA and truncation.

TPU-native equivalent of the reference's projection stack
(scann/projection/pca_projection.cc, truncate_projection.cc,
utils/pca_utils.{h,cc}) as configured by ScannBuilder.pca/truncate
(scann_builder.py:90-131).  The projection applies to partitioning and AH
scoring; exact reordering still runs against the original vectors, matching
the reference factory layout.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from scann_tpu import config as cfg


class Projector(NamedTuple):
    # (d, m) projection matrix for PCA, or None for pure truncation.
    matrix: Optional[jax.Array]
    out_dims: int

    def project(self, x):
        if self.matrix is None:
            return x[..., :self.out_dims]
        return jnp.dot(x, self.matrix,
                       preferred_element_type=jnp.float32)


def train_projection(database: np.ndarray, proj: cfg.ProjectionConfig,
                     sample_size: int = 100_000, seed: int = 42) -> Projector:
    d = database.shape[1]
    if proj.projection_type == "truncate":
        if proj.reduction_dim is None or proj.reduction_dim >= d:
            raise ValueError("truncate requires reduction_dim < dims")
        return Projector(matrix=None, out_dims=int(proj.reduction_dim))
    if proj.projection_type == "random_orthogonal":
        # Random rotation (reference: random_orthogonal_projection.cc):
        # QR of a Gaussian matrix; optionally truncated to reduction_dim
        # columns (a random orthonormal projection).
        rng = np.random.default_rng(seed)
        g = rng.standard_normal((d, d)).astype(np.float32)
        q_mat, _ = np.linalg.qr(g)
        m = int(proj.reduction_dim) if proj.reduction_dim else d
        import jax.numpy as _jnp
        return Projector(matrix=_jnp.asarray(q_mat[:, :m]), out_dims=m)
    if proj.projection_type not in ("pca", "eigenvalue_opq"):
        raise ValueError(f"unknown projection type {proj.projection_type}")

    rng = np.random.default_rng(seed)
    n = database.shape[0]
    idx = (rng.permutation(n)[:sample_size] if n > sample_size
           else np.arange(n))
    sample = jnp.asarray(database[idx], jnp.float32)

    @jax.jit
    def pca(x):
        mean = jnp.mean(x, axis=0)
        xc = x - mean
        cov = (xc.T @ xc) / x.shape[0]
        evals, evecs = jnp.linalg.eigh(cov)  # ascending
        return evals[::-1], evecs[:, ::-1]

    evals, evecs = pca(sample)
    evals = np.maximum(np.asarray(evals), 0.0)
    evecs = np.asarray(evecs)
    if proj.projection_type == "eigenvalue_opq":
        # Eigenvalue-OPQ (reference: eigenvalue_opq_projection.cc
        # GroupEigenvalues): distribute eigen-directions across the AH
        # blocks so each block carries a comparable share of variance —
        # greedy assignment of each eigenvalue (descending) to the
        # currently-lightest block.  Deviation: blocks are equal-sized
        # (our chunking is fixed dims_per_block; the reference emits
        # variable chunk sizes), so the greedy runs with per-block
        # capacity d/num_blocks.
        num_blocks = proj.opq_num_blocks or max(1, d // 2)
        cap = -(-d // num_blocks)
        totals = np.zeros(num_blocks)
        fill = [[] for _ in range(num_blocks)]
        for i in np.argsort(-evals):
            open_blocks = [b for b in range(num_blocks)
                           if len(fill[b]) < cap]
            b = min(open_blocks, key=lambda bb: totals[bb])
            fill[b].append(i)
            totals[b] += evals[i]
        order = np.concatenate([np.asarray(f, np.int64) for f in fill])
        return Projector(matrix=jnp.asarray(evecs[:, order]), out_dims=d)
    if proj.reduction_dim is not None:
        m = int(proj.reduction_dim)
    else:
        # Keep the smallest prefix explaining `pca_significance_threshold`
        # of the variance, then drop trailing dims whose eigenvalue falls
        # below `pca_truncation_threshold` x the mean kept eigenvalue
        # (reference: PcaUtils::ComputePca significance/truncation handling).
        total = evals.sum()
        cum = np.cumsum(evals) / max(total, 1e-30)
        m = int(np.searchsorted(
            cum, proj.pca_significance_threshold or 0.8) + 1)
        m = min(m, d)
        kept = evals[:m]
        thresh = (proj.pca_truncation_threshold or 0.0) * kept.mean()
        while m > 1 and evals[m - 1] < thresh:
            m -= 1
    return Projector(matrix=jnp.asarray(evecs[:, :m]), out_dims=m)
