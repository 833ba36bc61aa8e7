"""Batched small-block linear algebra.

Capability parity with the reference's batched MAGMA/LAPACK/cuBLAS wrappers:
``cpp/core/linalg/Matmul3D.h:22`` (batched gemm), ``FactorizeBlocksCholesky``,
``InvertBlocks.h:27`` (``InvertPositiveSemidefiniteBlocks``) and
``SolveBlockDiagonalCholesky`` — the 6x6-per-node building blocks of the
Gauss-Newton normal equations.

On TPU these are expressed as batched XLA ops (`jnp.linalg.cholesky`,
triangular solves) which XLA maps onto the VPU; block sizes here are tiny
(6x6), so the win is batching across thousands of nodes, not MXU tiling.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def matmul3d(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched matmul [B,m,k] x [B,k,n] -> [B,m,n] (reference ``Matmul3D``)."""
    return jnp.einsum("bik,bkj->bij", a, b, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST).astype(
        a.dtype
    )


def factorize_blocks_cholesky(blocks: jnp.ndarray) -> jnp.ndarray:
    """Batched lower-Cholesky factors of SPD blocks [..., B, B]."""
    return jnp.linalg.cholesky(blocks)


def _solve_tri(l: jnp.ndarray, b: jnp.ndarray, lower: bool, trans: bool) -> jnp.ndarray:
    return jax.lax.linalg.triangular_solve(
        l, b, left_side=True, lower=lower, transpose_a=trans
    )


def cholesky_solve(factors: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    """Solve A x = rhs given batched lower-Cholesky ``factors`` of A.

    ``factors``: [..., B, B] lower-triangular; ``rhs``: [..., B, K].
    """
    y = _solve_tri(factors, rhs, lower=True, trans=False)
    return _solve_tri(factors, y, lower=True, trans=True)


def invert_spd_blocks(blocks: jnp.ndarray) -> jnp.ndarray:
    """Batched inverse of SPD blocks [..., B, B] via Cholesky."""
    n = blocks.shape[-1]
    factors = jnp.linalg.cholesky(blocks)
    eye = jnp.broadcast_to(jnp.eye(n, dtype=blocks.dtype), blocks.shape)
    return cholesky_solve(factors, eye)


def solve_block_diagonal_cholesky(
    diag_blocks: jnp.ndarray, rhs: jnp.ndarray
) -> jnp.ndarray:
    """Solve a block-diagonal SPD system (reference ``SolveBlockDiagonalCholesky``).

    ``diag_blocks``: [N, B, B]; ``rhs``: [N, B] (one block-row of the stacked
    right-hand side per diagonal block). Returns [N, B].
    """
    factors = jnp.linalg.cholesky(diag_blocks)
    return cholesky_solve(factors, rhs[..., None])[..., 0]


def solve_block_diagonal_qr(
    diag_blocks: jnp.ndarray, rhs: jnp.ndarray
) -> jnp.ndarray:
    """Solve a block-diagonal system by batched QR (reference
    ``SolveBlockDiagonalQR`` — the robust fallback for blocks that are not
    SPD, e.g. damped GN systems with indefinite perturbations).

    ``diag_blocks``: [N, B, B]; ``rhs``: [N, B]. Returns [N, B].
    """
    q, r = jnp.linalg.qr(diag_blocks)
    qtb = jnp.einsum(
        "nba,nb->na", q, rhs, precision=jax.lax.Precision.HIGHEST
    )
    return jax.scipy.linalg.solve_triangular(r, qtb[..., None], lower=False)[
        ..., 0
    ]
