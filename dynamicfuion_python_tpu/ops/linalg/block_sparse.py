"""General block-COO sparse linear algebra.

Capability parity with the reference's block-sparse matmul suite
(``cpp/core/linalg/MatmulBlockSparse.h:34-133``, ``MatmulBlockSparseImpl.h``,
``BlockSums.*``, ``DiagonalBlocks.*``, ``TransposeBlocks.*``,
``ZeroOutTriangularBlocks.*``, ``KroneckerTensorProduct.h``,
``PreconditionDiagonalBlocks.*``): operations on matrices stored as a COO
list of dense ``b x b`` blocks + integer block coordinates.

TPU-native design: everything is ``segment_sum`` / batched-``einsum`` over
static-capacity block lists — no atomics, no dynamic allocation. Products
whose output sparsity is data-dependent (block-sparse x block-sparse) take
the output coordinate list explicitly (the reference's "breadboard" matrix
plays the same role: it is the precomputed output/participant structure,
``MatmulBlockSparse.h:62-83``).

The fused arrowhead solver (``ops/linalg/arrowhead.py``) remains the
production path for the fitter; these generic ops cover the rest of the
reference suite's surface (and are the building blocks for sharded variants).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_P = jax.lax.Precision.HIGHEST


def block_sparse_to_dense(
    blocks: jnp.ndarray,  # f32[Nb, b, b]
    coords: jnp.ndarray,  # int32[Nb, 2] (block-row, block-col); -1 = inactive
    shape_blocks: tuple[int, int],
) -> jnp.ndarray:
    """COO-of-blocks -> dense (test/debug utility)."""
    rows, cols = shape_blocks
    b = blocks.shape[1]
    out = jnp.zeros((rows, b, cols, b), blocks.dtype)
    ok = (coords[:, 0] >= 0) & (coords[:, 1] >= 0)
    safe = jnp.where(ok[:, None], coords, 0)
    out = out.at[safe[:, 0], :, safe[:, 1], :].add(
        jnp.where(ok[:, None, None], blocks, 0.0)
    )
    return out.reshape(rows * b, cols * b)


def block_sums(
    blocks: jnp.ndarray,  # f32[Nb, b, b]
    segment_ids: jnp.ndarray,  # int32[Nb] (-1 = drop)
    num_segments: int,
) -> jnp.ndarray:
    """Sum blocks by id (``BlockSums.h`` / ``ComputeBlockSums``)."""
    ok = segment_ids >= 0
    seg = jnp.where(ok, segment_ids, num_segments)
    return jax.ops.segment_sum(
        jnp.where(ok[:, None, None], blocks, 0.0),
        seg,
        num_segments=num_segments + 1,
    )[:num_segments]


def get_diagonal_blocks(
    blocks: jnp.ndarray, coords: jnp.ndarray, num_diag: int
) -> jnp.ndarray:
    """Extract diagonal blocks into dense [num_diag, b, b]
    (``DiagonalBlocks.h`` GetDiagonalBlocks)."""
    on_diag = (coords[:, 0] == coords[:, 1]) & (coords[:, 0] >= 0)
    seg = jnp.where(on_diag, coords[:, 0], num_diag)
    return jax.ops.segment_sum(
        jnp.where(on_diag[:, None, None], blocks, 0.0),
        seg,
        num_segments=num_diag + 1,
    )[:num_diag]


def transpose_blocks(
    blocks: jnp.ndarray, coords: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """A^T in block-COO: transpose each block and swap coordinates
    (``TransposeBlocks.h``)."""
    return blocks.swapaxes(-1, -2), coords[:, ::-1]


def zero_out_triangular_blocks(
    blocks: jnp.ndarray, coords: jnp.ndarray, upper: bool
) -> jnp.ndarray:
    """Zero blocks strictly above (upper=True) or below the block diagonal
    (``ZeroOutTriangularBlocks.h``)."""
    if upper:
        keep = coords[:, 1] <= coords[:, 0]
    else:
        keep = coords[:, 1] >= coords[:, 0]
    return jnp.where(keep[:, None, None], blocks, 0.0)


def precondition_diagonal_blocks(
    diag_blocks: jnp.ndarray, dampening_factor: float
) -> jnp.ndarray:
    """Add the LM dampening factor to every block's diagonal entries
    (``PreconditionDiagonalBlocksImpl.h:49``)."""
    b = diag_blocks.shape[-1]
    return diag_blocks + dampening_factor * jnp.eye(b, dtype=diag_blocks.dtype)


def kronecker_product(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Dense Kronecker product (``KroneckerTensorProduct.h``)."""
    m, n = a.shape
    p, q = b.shape
    return (a[:, None, :, None] * b[None, :, None, :]).reshape(m * p, n * q)


def matmul_block_sparse_dense(
    blocks: jnp.ndarray,  # f32[Nb, b, b]
    coords: jnp.ndarray,  # int32[Nb, 2]
    dense: jnp.ndarray,  # f32[Ncols * b, m] (or [Ncols * b] vector)
    num_block_rows: int,
) -> jnp.ndarray:
    """A @ X for block-COO A and dense X (``MatmulBlockSparse.h`` sparse x
    dense products; also covers block-sparse x vector)."""
    vector = dense.ndim == 1
    b = blocks.shape[1]
    x = dense.reshape(-1, b, dense.shape[-1] if not vector else 1)
    ok = (coords[:, 0] >= 0) & (coords[:, 1] >= 0)
    safe = jnp.where(ok[:, None], coords, 0)
    gathered = x[safe[:, 1]]  # [Nb, b, m]
    products = jnp.einsum("nab,nbm->nam", blocks, gathered, precision=_P)
    products = jnp.where(ok[:, None, None], products, 0.0)
    seg = jnp.where(ok, safe[:, 0], num_block_rows)
    out = jax.ops.segment_sum(
        products, seg, num_segments=num_block_rows + 1
    )[:num_block_rows]
    out = out.reshape(num_block_rows * b, -1)
    return out[:, 0] if vector else out


def matmul_block_sparse(
    a_blocks: jnp.ndarray,  # f32[Na, b, b]
    a_coords: jnp.ndarray,  # int32[Na, 2]
    b_blocks: jnp.ndarray,  # f32[Nb, b, b]
    b_coords: jnp.ndarray,  # int32[Nb, 2]
    out_coords: jnp.ndarray,  # int32[No, 2] requested output structure
    max_pair_count: int | None = None,
) -> jnp.ndarray:
    """(A @ B) restricted to ``out_coords``, all operands block-COO.

    The reference's block-sparse x block-sparse products take a "breadboard"
    presence matrix describing the (precomputed) output structure
    (``MatmulBlockSparse.h:62-83``); ``out_coords`` is its COO form. The
    contraction enumerates all (i, k) x (k, j) block pairs with matching
    inner index by a static cross join over the two lists, masks
    non-matching pairs, and segment-sums into the requested outputs —
    O(Na * Nb) pair tests, appropriate for the suite's graph-scale inputs
    (hundreds of blocks). Returns f32[No, b, b].
    """
    na = a_blocks.shape[0]
    nb = b_blocks.shape[0]
    no = out_coords.shape[0]
    # pair (p, q) participates iff a_coords[p, 1] == b_coords[q, 0]
    inner_match = a_coords[:, 1:2] == b_coords[None, :, 0]  # [Na, Nb]
    a_ok = (a_coords[:, 0] >= 0) & (a_coords[:, 1] >= 0)
    b_ok = (b_coords[:, 0] >= 0) & (b_coords[:, 1] >= 0)
    pair_ok = inner_match & a_ok[:, None] & b_ok[None, :]
    # output slot per pair: match (row_a, col_b) against out_coords by a
    # packed int32 key (block grids here are graph-scale: < 2^15 block rows
    # and columns, so row * 2^16 + col is collision-free)
    key_pair = (
        a_coords[:, 0:1].astype(jnp.int32) * 65536
        + b_coords[None, :, 1].astype(jnp.int32)
    )  # [Na, Nb]
    key_out = (
        out_coords[:, 0].astype(jnp.int32) * 65536
        + out_coords[:, 1].astype(jnp.int32)
    )  # [No]
    order = jnp.argsort(key_out)
    sorted_keys = key_out[order]
    pos = jnp.searchsorted(sorted_keys, key_pair.reshape(-1))
    pos = jnp.clip(pos, 0, no - 1)
    slot = order[pos]
    found = sorted_keys[jnp.clip(pos, 0, no - 1)] == key_pair.reshape(-1)
    ok = pair_ok.reshape(-1) & found
    products = jnp.einsum(
        "pab,qbc->pqac", a_blocks, b_blocks, precision=_P
    ).reshape(na * nb, a_blocks.shape[1], b_blocks.shape[2])
    seg = jnp.where(ok, slot, no)
    return jax.ops.segment_sum(
        jnp.where(ok[:, None, None], products, 0.0),
        seg,
        num_segments=no + 1,
    )[:no]
