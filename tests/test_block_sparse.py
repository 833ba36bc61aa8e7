"""Tests for the general block-COO sparse suite (ops/linalg/block_sparse.py).

Mirrors the reference's MatmulBlockSparse / BlockSums / DiagonalBlocks /
TransposeBlocks / ZeroOutTriangularBlocks / KroneckerTensorProduct /
PreconditionDiagonalBlocks test intent (``cpp/tests/test_matmul_block_sparse.cpp``)
with dense-oracle comparisons.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import pytest

from dynamicfuion_python_tpu.ops.linalg.block_sparse import (
    block_sparse_to_dense,
    block_sums,
    get_diagonal_blocks,
    kronecker_product,
    matmul_block_sparse,
    matmul_block_sparse_dense,
    precondition_diagonal_blocks,
    transpose_blocks,
    zero_out_triangular_blocks,
)


@pytest.fixture
def rng():
    return np.random.default_rng(3)


def _random_block_coo(rng, rows, cols, nb, b, inactive=0):
    """Random block-COO with unique coordinates; ``inactive`` trailing
    entries carry coords (-1, -1) and must be ignored by every op."""
    all_rc = [(i, j) for i in range(rows) for j in range(cols)]
    sel = rng.choice(len(all_rc), size=nb, replace=False)
    coords = np.asarray([all_rc[s] for s in sel], np.int32)
    blocks = rng.normal(size=(nb, b, b)).astype(np.float32)
    if inactive:
        coords = np.concatenate(
            [coords, np.full((inactive, 2), -1, np.int32)]
        )
        blocks = np.concatenate(
            [blocks, rng.normal(size=(inactive, b, b)).astype(np.float32)]
        )
    return jnp.asarray(blocks), jnp.asarray(coords)


class TestDenseRoundtrip:
    def test_to_dense_ignores_inactive(self, rng):
        blocks, coords = _random_block_coo(rng, 4, 5, 9, 3, inactive=2)
        dense = np.asarray(block_sparse_to_dense(blocks, coords, (4, 5)))
        assert dense.shape == (12, 15)
        # rebuild by hand
        expect = np.zeros((12, 15), np.float32)
        for blk, (i, j) in zip(np.asarray(blocks), np.asarray(coords)):
            if i >= 0:
                expect[3 * i : 3 * i + 3, 3 * j : 3 * j + 3] += blk
        np.testing.assert_allclose(dense, expect, atol=1e-6)


class TestBlockSums:
    def test_matches_loop(self, rng):
        blocks = jnp.asarray(rng.normal(size=(12, 3, 3)).astype(np.float32))
        ids = np.asarray([0, 1, 2, 0, 1, 3, -1, 2, 0, -1, 3, 1], np.int32)
        out = np.asarray(block_sums(blocks, jnp.asarray(ids), 4))
        expect = np.zeros((4, 3, 3), np.float32)
        for blk, s in zip(np.asarray(blocks), ids):
            if s >= 0:
                expect[s] += blk
        np.testing.assert_allclose(out, expect, atol=1e-6)


class TestDiagonalBlocks:
    def test_extract(self, rng):
        blocks, coords = _random_block_coo(rng, 5, 5, 12, 2, inactive=3)
        diag = np.asarray(get_diagonal_blocks(blocks, coords, 5))
        dense = np.asarray(block_sparse_to_dense(blocks, coords, (5, 5)))
        for i in range(5):
            np.testing.assert_allclose(
                diag[i], dense[2 * i : 2 * i + 2, 2 * i : 2 * i + 2], atol=1e-6
            )

    def test_precondition_adds_lambda(self, rng):
        diag = jnp.asarray(rng.normal(size=(6, 4, 4)).astype(np.float32))
        out = np.asarray(precondition_diagonal_blocks(diag, 0.75))
        np.testing.assert_allclose(
            out, np.asarray(diag) + 0.75 * np.eye(4, dtype=np.float32),
            atol=1e-6,
        )


class TestTransposeAndTriangular:
    def test_transpose_roundtrip(self, rng):
        blocks, coords = _random_block_coo(rng, 4, 6, 10, 3)
        tb, tc = transpose_blocks(blocks, coords)
        dense = np.asarray(block_sparse_to_dense(blocks, coords, (4, 6)))
        dense_t = np.asarray(block_sparse_to_dense(tb, tc, (6, 4)))
        np.testing.assert_allclose(dense_t, dense.T, atol=1e-6)

    @pytest.mark.parametrize("upper", [True, False])
    def test_zero_triangular(self, rng, upper):
        blocks, coords = _random_block_coo(rng, 5, 5, 15, 2)
        za = zero_out_triangular_blocks(blocks, coords, upper=upper)
        dense = np.asarray(block_sparse_to_dense(za, coords, (5, 5)))
        cn = np.asarray(coords)
        for blk, (i, j) in zip(np.asarray(blocks), cn):
            zeroed = (j > i) if upper else (j < i)
            sub = dense[2 * i : 2 * i + 2, 2 * j : 2 * j + 2]
            if zeroed:
                np.testing.assert_allclose(sub, 0.0, atol=1e-7)


class TestKronecker:
    def test_matches_numpy(self, rng):
        a = rng.normal(size=(3, 4)).astype(np.float32)
        b = rng.normal(size=(2, 5)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(kronecker_product(jnp.asarray(a), jnp.asarray(b))),
            np.kron(a, b),
            atol=1e-6,
        )


class TestMatmulBlockSparseDense:
    def test_matrix_and_vector(self, rng):
        blocks, coords = _random_block_coo(rng, 6, 4, 11, 3, inactive=2)
        dense_a = np.asarray(block_sparse_to_dense(blocks, coords, (6, 4)))
        x = rng.normal(size=(12, 7)).astype(np.float32)
        out = np.asarray(
            matmul_block_sparse_dense(blocks, coords, jnp.asarray(x), 6)
        )
        np.testing.assert_allclose(out, dense_a @ x, atol=1e-4)
        v = rng.normal(size=(12,)).astype(np.float32)
        outv = np.asarray(
            matmul_block_sparse_dense(blocks, coords, jnp.asarray(v), 6)
        )
        assert outv.shape == (18,)
        np.testing.assert_allclose(outv, dense_a @ v, atol=1e-4)


class TestMatmulBlockSparse:
    def test_restricted_product_matches_dense(self, rng):
        b = 3
        a_blocks, a_coords = _random_block_coo(rng, 5, 6, 14, b, inactive=2)
        b_blocks, b_coords = _random_block_coo(rng, 6, 4, 12, b, inactive=1)
        dense_a = np.asarray(block_sparse_to_dense(a_blocks, a_coords, (5, 6)))
        dense_b = np.asarray(block_sparse_to_dense(b_blocks, b_coords, (6, 4)))
        full = dense_a @ dense_b
        # request every output block (the "breadboard" covers the full grid)
        out_coords = np.asarray(
            [(i, j) for i in range(5) for j in range(4)], np.int32
        )
        out = np.asarray(
            matmul_block_sparse(
                a_blocks, a_coords, b_blocks, b_coords, jnp.asarray(out_coords)
            )
        )
        for n, (i, j) in enumerate(out_coords):
            np.testing.assert_allclose(
                out[n],
                full[b * i : b * i + b, b * j : b * j + b],
                atol=1e-4,
            )

    def test_restricted_structure_masks_outputs(self, rng):
        # only the requested coordinates are produced — others never appear
        b = 2
        a_blocks, a_coords = _random_block_coo(rng, 4, 4, 8, b)
        b_blocks, b_coords = _random_block_coo(rng, 4, 4, 8, b)
        dense_a = np.asarray(block_sparse_to_dense(a_blocks, a_coords, (4, 4)))
        dense_b = np.asarray(block_sparse_to_dense(b_blocks, b_coords, (4, 4)))
        full = dense_a @ dense_b
        out_coords = np.asarray([(0, 0), (1, 2), (3, 3)], np.int32)
        out = np.asarray(
            matmul_block_sparse(
                a_blocks, a_coords, b_blocks, b_coords, jnp.asarray(out_coords)
            )
        )
        assert out.shape == (3, b, b)
        for n, (i, j) in enumerate(out_coords):
            np.testing.assert_allclose(
                out[n],
                full[b * i : b * i + b, b * j : b * j + b],
                atol=1e-4,
            )
