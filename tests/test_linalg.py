"""Core linalg tests: Rodrigues, batched block Cholesky, arrowhead solver.

Oracle pattern follows the reference test strategy (SURVEY.md §4): numpy/scipy
prototypes generate ground truth (the reference's
``apps/math_experimental_scripts/sparse_block_cholesky_scripts.py`` role);
kernels must match to fp32 tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamicfuion_python_tpu.ops.linalg import (
    BlockSparseArrowheadMatrix,
    arrowhead_to_dense,
    axis_angle_to_matrix,
    invert_spd_blocks,
    matrix_to_axis_angle,
    matmul3d,
    skew,
    solve_block_diagonal_cholesky,
    solve_block_sparse_arrowhead,
)


class TestRodrigues:
    def test_matches_scipy(self, rng):
        from scipy.spatial.transform import Rotation

        v = rng.normal(size=(64, 3)).astype(np.float32)
        ours = np.asarray(axis_angle_to_matrix(jnp.asarray(v)))
        expected = Rotation.from_rotvec(v).as_matrix().astype(np.float32)
        np.testing.assert_allclose(ours, expected, atol=2e-6)

    def test_zero_angle_identity_and_grad(self):
        v = jnp.zeros((3,))
        np.testing.assert_allclose(axis_angle_to_matrix(v), np.eye(3), atol=1e-7)
        grad = jax.jacobian(axis_angle_to_matrix)(v)
        assert np.all(np.isfinite(np.asarray(grad)))
        # d R / d v at 0 is the skew generator basis
        expected = np.asarray(jax.jacobian(lambda u: skew(u))(v))
        np.testing.assert_allclose(np.asarray(grad), expected, atol=1e-5)

    def test_round_trip(self, rng):
        v = rng.normal(size=(32, 3)).astype(np.float32) * 0.8
        back = matrix_to_axis_angle(axis_angle_to_matrix(jnp.asarray(v)))
        np.testing.assert_allclose(np.asarray(back), v, atol=1e-4)


class TestBlockOps:
    def test_matmul3d(self, rng):
        a = rng.normal(size=(7, 4, 5)).astype(np.float32)
        b = rng.normal(size=(7, 5, 3)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(matmul3d(jnp.asarray(a), jnp.asarray(b))),
            a @ b,
            rtol=1e-5,
            atol=1e-5,
        )

    @staticmethod
    def _random_spd(rng, n, b):
        m = rng.normal(size=(n, b, b)).astype(np.float32)
        return m @ m.transpose(0, 2, 1) + 0.5 * np.eye(b, dtype=np.float32)

    def test_invert_spd_blocks(self, rng):
        blocks = self._random_spd(rng, 20, 6)
        inv = np.asarray(invert_spd_blocks(jnp.asarray(blocks)))
        np.testing.assert_allclose(
            inv @ blocks, np.broadcast_to(np.eye(6), (20, 6, 6)), atol=2e-4
        )

    def test_solve_block_diagonal(self, rng):
        blocks = self._random_spd(rng, 16, 6)
        rhs = rng.normal(size=(16, 6)).astype(np.float32)
        x = np.asarray(
            solve_block_diagonal_cholesky(jnp.asarray(blocks), jnp.asarray(rhs))
        )
        np.testing.assert_allclose(
            np.einsum("nab,nb->na", blocks, x), rhs, atol=2e-4
        )


def _random_arrowhead(rng, n0=40, nc=8, b=6, k=4):
    """Random SPD arrowhead system in padded block-row layout."""
    diag = rng.normal(size=(n0, b, b)).astype(np.float32)
    diag = diag @ diag.transpose(0, 2, 1) + (4.0 + k) * np.eye(b, dtype=np.float32)
    wing = 0.3 * rng.normal(size=(n0, k, b, b)).astype(np.float32)
    cols = np.full((n0, k), -1, dtype=np.int32)
    for i in range(n0):
        deg = rng.integers(1, min(k, nc) + 1)
        cols[i, :deg] = rng.choice(nc, size=deg, replace=False)
    wing[cols < 0] = 0.0
    corner = rng.normal(size=(nc * b, nc * b)).astype(np.float32)
    corner = corner @ corner.T + (4.0 + k) * n0 / nc * np.eye(nc * b, dtype=np.float32)
    return BlockSparseArrowheadMatrix(
        diag_blocks=jnp.asarray(diag),
        wing_blocks=jnp.asarray(wing),
        wing_cols=jnp.asarray(cols),
        corner=jnp.asarray(corner),
    )


class TestArrowheadSolver:
    def test_to_dense_symmetric(self, rng):
        mat = _random_arrowhead(rng)
        dense = np.asarray(arrowhead_to_dense(mat))
        np.testing.assert_allclose(dense, dense.T, atol=1e-6)

    def test_matches_numpy_dense_solve(self, rng):
        mat = _random_arrowhead(rng)
        n = (mat.num_stem_blocks + mat.num_corner_blocks) * mat.block_size
        rhs = rng.normal(size=(n,)).astype(np.float32)
        dense = np.asarray(arrowhead_to_dense(mat)).astype(np.float64)
        expected = np.linalg.solve(dense, rhs.astype(np.float64))
        ours = np.asarray(solve_block_sparse_arrowhead(mat, jnp.asarray(rhs)))
        np.testing.assert_allclose(ours, expected, rtol=2e-3, atol=2e-3)

    def test_jit_and_duplicate_cols(self, rng):
        mat = _random_arrowhead(rng, n0=12, nc=3, k=4)
        n = (mat.num_stem_blocks + mat.num_corner_blocks) * mat.block_size
        rhs = jnp.asarray(rng.normal(size=(n,)).astype(np.float32))
        solver = jax.jit(solve_block_sparse_arrowhead)
        np.testing.assert_allclose(
            np.asarray(solver(mat, rhs)),
            np.asarray(solve_block_sparse_arrowhead(mat, rhs)),
            atol=1e-5,
        )

    def test_large_1500(self, rng):
        # Scale check mirroring the reference's 1500x1500 headline system
        # (README.md:31): 1500/6 = 250 blocks, arrow base 208 like the C++ test
        # fixture (cpp/tests/test_block_sparse_arrowhead_solver.cpp:34).
        mat = _random_arrowhead(rng, n0=208, nc=42, b=6, k=4)
        n = (208 + 42) * 6
        rhs = rng.normal(size=(n,)).astype(np.float32)
        dense = np.asarray(arrowhead_to_dense(mat)).astype(np.float64)
        expected = np.linalg.solve(dense, rhs.astype(np.float64))
        ours = np.asarray(solve_block_sparse_arrowhead(mat, jnp.asarray(rhs)))
        np.testing.assert_allclose(ours, expected, rtol=5e-3, atol=5e-3)


class TestConfig:
    def test_yaml_round_trip_and_overrides(self, tmp_path):
        from dynamicfuion_python_tpu.utils.config import (
            config_node,
            dumps_yaml,
            load_config,
            loads_yaml,
            save_config,
        )

        @config_node
        class Inner:
            voxel_size: float = 0.004
            resolution: int = 16

        @config_node
        class Root:
            name: str = "fusion"
            inner: Inner = None  # type: ignore

            def __post_init__(self):
                if self.inner is None:
                    self.inner = Inner()

        cfg = Root()
        path = tmp_path / "cfg.yaml"
        save_config(cfg, path)
        loaded = load_config(Root, path, cli_overrides=["inner.voxel_size=0.01"])
        assert loaded.inner.voxel_size == 0.01
        assert loaded.inner.resolution == 16
        assert loads_yaml(dumps_yaml(cfg))["inner"]["resolution"] == 16


class TestSolveBlockDiagonalQR:
    def test_matches_dense_solve_on_nonsymmetric_blocks(self, rng):
        from dynamicfuion_python_tpu.ops.linalg import solve_block_diagonal_qr

        blocks = rng.normal(size=(5, 6, 6)).astype(np.float32)
        blocks += 6 * np.eye(6, dtype=np.float32)  # well-conditioned, NOT SPD
        rhs = rng.normal(size=(5, 6)).astype(np.float32)
        got = np.asarray(solve_block_diagonal_qr(jnp.asarray(blocks), jnp.asarray(rhs)))
        want = np.stack([np.linalg.solve(b, r) for b, r in zip(blocks, rhs)])
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
