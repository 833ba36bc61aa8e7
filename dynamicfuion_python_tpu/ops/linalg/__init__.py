"""Linear-algebra ops: Rodrigues, batched block Cholesky, block-sparse products,
and the block-sparse arrowhead (Schur-complement) solver.

TPU-native counterpart of the reference's ``cpp/core/linalg`` suite
(Matmul3D, FactorizeBlocksCholesky, InvertBlocks, MatmulBlockSparse,
SolveBlockSparseArrowheadCholesky, Rodrigues): instead of MAGMA/cuBLAS batched
routines and COO block scatter kernels, everything is expressed as batched XLA
ops over fixed-degree padded block layouts so it vectorizes onto the VPU/MXU
and shards with `jax.sharding`.
"""

from dynamicfuion_python_tpu.ops.linalg.rodrigues import (
    axis_angle_to_matrix,
    matrix_to_axis_angle,
    skew,
)
from dynamicfuion_python_tpu.ops.linalg.block_ops import (
    factorize_blocks_cholesky,
    invert_spd_blocks,
    solve_block_diagonal_cholesky,
    solve_block_diagonal_qr,
    matmul3d,
)
from dynamicfuion_python_tpu.ops.linalg.arrowhead import (
    BlockSparseArrowheadMatrix,
    solve_block_sparse_arrowhead,
    arrowhead_matvec,
    arrowhead_to_dense,
)

__all__ = [
    "axis_angle_to_matrix",
    "matrix_to_axis_angle",
    "skew",
    "factorize_blocks_cholesky",
    "invert_spd_blocks",
    "solve_block_diagonal_cholesky",
    "solve_block_diagonal_qr",
    "matmul3d",
    "BlockSparseArrowheadMatrix",
    "solve_block_sparse_arrowhead",
    "arrowhead_matvec",
    "arrowhead_to_dense",
]
