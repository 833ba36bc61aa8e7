"""Block-sparse arrowhead (Schur-complement) Cholesky solver.

Capability parity with the reference's headline solver
(``cpp/core/linalg/BlockSparseArrowheadMatrix.h:22-109``,
``SolveBlockSparseArrowheadCholesky.cpp:31-93``, ``SchurComplement.h:26``):
solves H dx = b where, after the hierarchical warp field's fine-to-coarse
"virtual ordering", the ARAP + data Hessian H has arrowhead structure

    H = [ D   B  ]     D: block-diagonal (6x6) over the `arrow_base` finest-
        [ B^T C  ]        layer nodes ("stem"),
                       B: sparse stem->corner wing (fine->coarse ARAP edges),
                       C: dense corner over the coarser-layer nodes.

Algorithm (same math as the reference, re-laid-out for TPU):
  1. invert D blockwise (batched 6x6 Cholesky),
  2. W = D^-1 B,
  3. Schur complement S = C - B^T W  (dense, small),
  4. dense Cholesky solve S x_c = b_c - B^T D^-1 b_s,
  5. back-substitute x_s = D^-1 b_s - W x_c.

TPU-native layout: instead of the reference's COO-of-blocks + "breadboard"
presence matrix with atomic scatter, the wing is stored **padded row-wise**:
every stem block row carries exactly `max_wing_degree` wing slots
(`wing_blocks` [N0, K, 6, 6], `wing_cols` [N0, K], -1 = empty). This is the
natural output of fixed-degree KNN regularization edges (reference
max_vertex_degree=4, ``HierarchicalGraphWarpField.cpp:144-167``), gives static
shapes for jit, and turns every step into batched einsums + one scatter-add
into the small dense corner.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dynamicfuion_python_tpu.ops.linalg.block_ops import (
    cholesky_solve,
    invert_spd_blocks,
)


class BlockSparseArrowheadMatrix(NamedTuple):
    """Arrowhead system in padded block-row layout.

    Attributes:
      diag_blocks:  f32[N0, B, B]  stem diagonal blocks (SPD).
      wing_blocks:  f32[N0, K, B, B]  wing blocks; slot k of row i is the block
        coupling stem node i with corner node ``wing_cols[i, k]``.
      wing_cols:    int32[N0, K]  corner-block column per wing slot; -1 = empty
        (the block content must be zero there as well for safety).
      corner:       f32[Nc*B, Nc*B]  dense corner (SPD on its own diagonal).
    """

    diag_blocks: jnp.ndarray
    wing_blocks: jnp.ndarray
    wing_cols: jnp.ndarray
    corner: jnp.ndarray

    @property
    def block_size(self) -> int:
        return self.diag_blocks.shape[-1]

    @property
    def num_stem_blocks(self) -> int:
        return self.diag_blocks.shape[0]

    @property
    def num_corner_blocks(self) -> int:
        return self.corner.shape[0] // self.block_size


def _mask_wing(matrix: BlockSparseArrowheadMatrix) -> jnp.ndarray:
    """Zero out padded wing slots; returns masked wing blocks."""
    valid = (matrix.wing_cols >= 0).astype(matrix.wing_blocks.dtype)
    return matrix.wing_blocks * valid[..., None, None]


def arrowhead_to_dense(matrix: BlockSparseArrowheadMatrix) -> jnp.ndarray:
    """Materialize the full dense [ (N0+Nc)*B ]^2 matrix (tests / small systems)."""
    b = matrix.block_size
    n0 = matrix.num_stem_blocks
    nc = matrix.num_corner_blocks
    n = (n0 + nc) * b
    dense = jnp.zeros((n, n), dtype=matrix.diag_blocks.dtype)
    # stem diagonal
    stem_idx = jnp.arange(n0)
    dense = dense.at[
        stem_idx[:, None, None] * b + jnp.arange(b)[None, :, None],
        stem_idx[:, None, None] * b + jnp.arange(b)[None, None, :],
    ].set(matrix.diag_blocks)
    # wing: rows stem, cols corner (+ symmetric transpose)
    wing = _mask_wing(matrix)
    k = wing.shape[1]
    rows = (
        jnp.repeat(stem_idx[:, None], k, axis=1)[:, :, None, None] * b
        + jnp.arange(b)[None, None, :, None]
    )
    safe_cols = jnp.maximum(matrix.wing_cols, 0)
    cols = (n0 + safe_cols)[:, :, None, None] * b + jnp.arange(b)[None, None, None, :]
    dense = dense.at[rows, cols].add(wing)
    dense = dense.at[cols.swapaxes(-1, -2), rows.swapaxes(-1, -2)].add(
        wing.swapaxes(-1, -2)
    )
    # corner
    dense = dense.at[n0 * b :, n0 * b :].add(matrix.corner)
    return dense


def _wing_t_times(
    wing: jnp.ndarray, wing_cols: jnp.ndarray, stem_vectors: jnp.ndarray, nc: int
) -> jnp.ndarray:
    """B^T v for stem block-vectors v: accumulate wing[i,k]^T @ v[i] into
    corner rows via a one-hot contraction (TPU scatter-add costs ~ms even
    at this size; the [Nc, N0*K] one-hot matmul is a single fused kernel).

    wing: [N0, K, B, B]; stem_vectors: [N0, B]; returns [Nc, B].
    """
    contrib = jnp.einsum("nkba,nb->nka", wing, stem_vectors, precision=jax.lax.Precision.HIGHEST)  # transpose via index swap
    flat = contrib.reshape(-1, contrib.shape[-1])
    cols = wing_cols.reshape(-1)
    onehot = (cols[None, :] == jnp.arange(nc)[:, None]).astype(flat.dtype)
    return jnp.einsum(
        "ce,eb->cb", onehot, flat, precision=jax.lax.Precision.HIGHEST
    )


def _cholesky_with_escalating_damping(matrix: jnp.ndarray) -> jnp.ndarray:
    """Cholesky factor of ``matrix``, escalating Levenberg-style diagonal
    damping when float32 roundoff makes it indefinite.

    The Schur complement ``C - W^T D^-1 W`` of a well-posed GN system is SPD
    in exact arithmetic, but its smallest eigenvalue can sit ~1e-7 below the
    matrix scale — under float32 cancellation it then comes out slightly
    NEGATIVE and Cholesky emits NaN (observed on 480x640 fits: true min-eig
    +1e-3, float32 min-eig -497 at scale 8.9e3). Escalate mu through
    {1e-4, 1e-2, 1} x mean|diag| until the factorization is finite: extra
    damping on the corner nodes only, and only on degenerate systems — a
    ``lax.while_loop`` whose healthy-path cost is one isfinite reduction."""
    eye = jnp.eye(matrix.shape[0], dtype=matrix.dtype)
    scale = jnp.mean(jnp.abs(jnp.diagonal(matrix))) + 1e-30

    def cond(state):
        _, factor, tries = state
        return ~jnp.all(jnp.isfinite(factor)) & (tries < 4)

    def body(state):
        mu, _, tries = state
        mu = jnp.where(tries == 0, 1e-4 * scale, mu * 100.0)
        return mu, jnp.linalg.cholesky(matrix + mu * eye), tries + 1

    first = jnp.linalg.cholesky(matrix)
    mu, factor, tries = jax.lax.while_loop(
        cond, body, (jnp.zeros((), matrix.dtype), first, jnp.int32(0))
    )
    # tries > 0 <=> the undamped factorization was indefinite — the caller's
    # conditioning signal (fitter valid-solve guard); mu is the damping the
    # factorized system actually carries (0 when tries == 0), which the
    # caller needs to verify the solve against the system that was SOLVED
    return factor, tries, mu


def arrowhead_matvec(
    matrix: BlockSparseArrowheadMatrix, x: jnp.ndarray
) -> jnp.ndarray:
    """H @ x for the arrowhead system (validity/conditioning checks: the
    fitter verifies ``||H dx - g|| <= tol ||g||`` so a solve that only
    succeeded through escalated internal damping is flagged instead of
    silently fused — reference ``valid_solve`` semantics,
    ``point_cloud_alignment_optimizer.py:219-267``)."""
    b = matrix.block_size
    n0 = matrix.num_stem_blocks
    nc = matrix.num_corner_blocks
    wing = _mask_wing(matrix)
    xs = x[: n0 * b].reshape(n0, b)
    xc = x[n0 * b :]
    ys = jnp.einsum(
        "nab,nb->na", matrix.diag_blocks, xs,
        precision=jax.lax.Precision.HIGHEST,
    )
    xc_blocks = xc.reshape(nc, b)
    gathered = xc_blocks[jnp.maximum(matrix.wing_cols, 0)]
    gathered = jnp.where((matrix.wing_cols >= 0)[..., None], gathered, 0.0)
    ys = ys + jnp.einsum(
        "nkab,nkb->na", wing, gathered, precision=jax.lax.Precision.HIGHEST
    )
    yc = matrix.corner @ xc + _wing_t_times(
        wing, matrix.wing_cols, xs, nc
    ).reshape(-1)
    return jnp.concatenate([ys.reshape(-1), yc])


def solve_block_sparse_arrowhead(
    matrix: BlockSparseArrowheadMatrix,
    rhs: jnp.ndarray,
    return_diagnostics: bool = False,
) -> jnp.ndarray:
    """Solve H x = rhs for the arrowhead system.

    ``rhs``: f32[(N0+Nc)*B]. Returns x of the same shape (with
    ``return_diagnostics``: ``(x, damping_escalations, corner_damping)``
    where a non-zero escalation count means the Schur complement only
    factorized through extra internal damping — the fitter's conditioning
    signal — and ``corner_damping`` is the mu actually added to the corner
    diagonal, so callers can verify the solve against the damped system
    ``H + mu * I_corner`` that was factorized). Fully jit-safe (static
    shapes; padded wing slots contribute zeros).
    """
    b = matrix.block_size
    n0 = matrix.num_stem_blocks
    nc = matrix.num_corner_blocks
    wing = _mask_wing(matrix)

    rhs_stem = rhs[: n0 * b].reshape(n0, b)
    rhs_corner = rhs[n0 * b :]

    # 1. D^-1 blockwise.
    diag_inv = invert_spd_blocks(matrix.diag_blocks)  # [N0, B, B]
    dinv_rhs = jnp.einsum("nab,nb->na", diag_inv, rhs_stem, precision=jax.lax.Precision.HIGHEST)  # [N0, B]

    # 2. W = D^-1 B  (per wing slot).
    w = jnp.einsum("nab,nkbc->nkac", diag_inv, wing, precision=jax.lax.Precision.HIGHEST)  # [N0, K, B, B]

    # 3. Schur complement S = C - B^T W. Pairwise products within each stem row:
    #    S[j1, j2] -= sum_i B[i,j1]^T W[i,j2] over wing-slot pairs (k1, k2).
    pair = jnp.einsum("nkab,nlac->nklbc", wing, w, precision=jax.lax.Precision.HIGHEST)  # [N0, K, K, B, B]
    kk = wing.shape[1]
    j1 = jnp.broadcast_to(matrix.wing_cols[:, :, None], (n0, kk, kk))
    j2 = jnp.broadcast_to(matrix.wing_cols[:, None, :], (n0, kk, kk))
    pair_valid = (j1 >= 0) & (j2 >= 0)
    flat_pair = jnp.where(
        pair_valid[..., None, None], pair, 0.0
    ).reshape(-1, b * b)
    flat_idx = jnp.where(
        pair_valid, jnp.maximum(j1, 0) * nc + jnp.maximum(j2, 0), nc * nc
    ).reshape(-1)
    onehot = (
        flat_idx[None, :] == jnp.arange(nc * nc)[:, None]
    ).astype(flat_pair.dtype)
    schur_blocks = jnp.einsum(
        "ce,ef->cf", onehot, flat_pair,
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(nc, nc, b, b)
    schur = matrix.corner - schur_blocks.transpose(0, 2, 1, 3).reshape(nc * b, nc * b)

    # 4. Corner solve: S x_c = b_c - B^T D^-1 b_s.
    corner_rhs = rhs_corner - _wing_t_times(wing, matrix.wing_cols, dinv_rhs, nc).reshape(
        -1
    )
    schur_factor, damping_tries, damping_mu = _cholesky_with_escalating_damping(
        schur
    )
    x_corner = cholesky_solve(schur_factor, corner_rhs[:, None])[:, 0]

    # 5. Back-substitute: x_s = D^-1 b_s - W x_c.
    x_c_blocks = x_corner.reshape(nc, b)
    gathered = x_c_blocks[jnp.maximum(matrix.wing_cols, 0)]  # [N0, K, B]
    gathered = jnp.where((matrix.wing_cols >= 0)[..., None], gathered, 0.0)
    x_stem = dinv_rhs - jnp.einsum("nkab,nkb->na", w, gathered, precision=jax.lax.Precision.HIGHEST)

    x = jnp.concatenate([x_stem.reshape(-1), x_corner])
    if return_diagnostics:
        return x, damping_tries, damping_mu
    return x
