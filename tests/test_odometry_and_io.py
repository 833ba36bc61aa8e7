"""Rigid odometry + tensor IO / checkpoint-resume tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from dynamicfuion_python_tpu.ops.rigid_odometry import rigid_odometry_multi_scale

INTR = jnp.asarray(
    [[160.0, 0.0, 80.0], [0.0, 160.0, 60.0], [0.0, 0.0, 1.0]], jnp.float32
)
H, W = 120, 160


def _wavy_depth(shift_z=0.0):
    v, u = np.mgrid[0:H, 0:W].astype(np.float32)
    z = 1.2 + 0.08 * np.sin(u / 12) * np.cos(v / 12) + shift_z
    return (z * 1000).astype(np.uint16)


class TestRigidOdometry:
    def test_identity_for_same_frame(self):
        d = jnp.asarray(_wavy_depth())
        t, rmse = rigid_odometry_multi_scale(d, d, INTR)
        np.testing.assert_allclose(np.asarray(t), np.eye(4), atol=1e-4)
        assert float(rmse) < 1e-4

    def test_recovers_z_translation(self):
        # target surface 1 cm farther -> camera moved 1 cm toward -z, i.e.
        # T maps source points to target points: T = translate(+1cm z)
        src = jnp.asarray(_wavy_depth(0.0))
        tgt = jnp.asarray(_wavy_depth(0.01))
        t, rmse = rigid_odometry_multi_scale(src, tgt, INTR)
        np.testing.assert_allclose(np.asarray(t)[:3, 3], [0, 0, 0.01], atol=2e-3)
        assert float(rmse) < 2e-3

    def test_recovers_small_rotation(self):
        from dynamicfuion_python_tpu.ops.camera import (
            project_points,
            unproject_depth_image,
        )
        from dynamicfuion_python_tpu.ops.linalg import axis_angle_to_matrix

        src_depth = jnp.asarray(_wavy_depth())
        pts, mask = unproject_depth_image(src_depth, INTR, 1000.0, 5.0)
        rot = axis_angle_to_matrix(jnp.asarray([0.0, 0.01, 0.0]))
        moved = pts.reshape(-1, 3) @ rot.T
        uv, _ = project_points(moved, INTR)
        # rasterize target depth by scattering (nearest pixel)
        u = np.round(np.asarray(uv)[:, 0]).astype(int)
        v = np.round(np.asarray(uv)[:, 1]).astype(int)
        z = np.asarray(moved)[:, 2]
        ok = (
            np.asarray(mask).reshape(-1)
            & (u >= 0) & (u < W) & (v >= 0) & (v < H)
        )
        tgt = np.zeros((H, W), np.float32)
        tgt[v[ok], u[ok]] = z[ok] * 1000
        t, rmse = rigid_odometry_multi_scale(
            src_depth, jnp.asarray(tgt.astype(np.uint16)), INTR
        )
        got_rot = np.asarray(t)[:3, :3]
        np.testing.assert_allclose(got_rot, np.asarray(rot), atol=3e-3)


class TestTensorIO:
    def test_tensor_round_trip(self, tmp_path, rng):
        from dynamicfuion_python_tpu.utils.tensor_io import (
            read_tensor,
            read_tensors,
            write_tensor,
            write_tensors,
        )

        arrays = {
            "a": rng.normal(size=(17, 5)).astype(np.float32),
            "b": rng.integers(0, 100, size=(3, 4, 2)).astype(np.int32),
            "scalar": np.asarray(4.5, np.float64),
        }
        write_tensors(tmp_path / "t.ntio", arrays)
        back = read_tensors(tmp_path / "t.ntio")
        for k, v in arrays.items():
            np.testing.assert_array_equal(back[k], v)
        write_tensor(tmp_path / "one.ntio", arrays["a"], compress=False)
        np.testing.assert_array_equal(read_tensor(tmp_path / "one.ntio"), arrays["a"])

    def test_fusion_checkpoint_round_trip(self, tmp_path):
        from dynamicfuion_python_tpu.models.voxel_block_grid import VoxelBlockGrid
        from dynamicfuion_python_tpu.models.warp_field import (
            HierarchicalGraphWarpField,
        )
        from dynamicfuion_python_tpu.ops import voxel_block_hash as vbh
        from dynamicfuion_python_tpu.utils.tensor_io import (
            load_fusion_checkpoint,
            save_fusion_checkpoint,
        )

        grid = VoxelBlockGrid.create(capacity=64, block_resolution=4)
        keys = vbh.pack_block_keys(
            jnp.asarray([[0, 0, 10], [1, 2, 10]], jnp.int32)
        )
        grid = grid.activate(
            jnp.full((8,), vbh.EMPTY_KEY, jnp.int32).at[:2].set(keys)
        )
        grid = grid.replace(tsdf=grid.tsdf.at[0, 0, 0, 0].set(0.5))

        xs, ys = np.meshgrid(np.linspace(0, 1, 8), np.linspace(0, 1, 8))
        nodes = np.stack([xs.ravel(), ys.ravel(), np.ones(64)], -1).astype(
            np.float32
        )
        field = HierarchicalGraphWarpField.build(
            nodes, node_coverage=0.15, layer_count=2
        )
        field = field.translate_nodes(
            jnp.full((field.num_nodes, 3), 0.01, jnp.float32)
        )

        save_fusion_checkpoint(tmp_path / "ckpt", grid, field, frame_index=7)
        g2, f2, frame, _ = load_fusion_checkpoint(tmp_path / "ckpt")
        assert frame == 7
        assert int(g2.occupied_count()) == 2
        np.testing.assert_array_equal(
            np.asarray(g2.tsdf), np.asarray(grid.tsdf)
        )
        _, found = g2.find_block_slots(keys)
        assert np.asarray(found).all()
        np.testing.assert_allclose(
            np.asarray(f2.node_translations), 0.01, atol=1e-7
        )
        assert f2.layer_node_counts == field.layer_node_counts
        np.testing.assert_array_equal(
            np.asarray(f2.edges), np.asarray(field.edges)
        )


class TestNativeCodec:
    def test_parallel_codec_round_trip(self, rng):
        from dynamicfuion_python_tpu import native

        if not native.build_library():
            pytest.skip("no C++ toolchain")
        data = rng.integers(0, 50, size=3_000_000, dtype=np.uint8).tobytes()
        packed = native.compress(data)
        assert packed is not None and len(packed) < len(data)
        assert native.decompress(packed) == data

    def test_ntio_uses_native_mode_for_large_blobs(self, tmp_path, rng):
        from dynamicfuion_python_tpu import native
        from dynamicfuion_python_tpu.utils.tensor_io import (
            read_tensors,
            write_tensors,
        )

        if not native.build_library():
            pytest.skip("no C++ toolchain")
        big = rng.integers(0, 10, size=(2_000_000,)).astype(np.int16)
        small = rng.normal(size=(8,)).astype(np.float32)
        write_tensors(tmp_path / "mixed.ntio", {"big": big, "small": small})
        back = read_tensors(tmp_path / "mixed.ntio")
        np.testing.assert_array_equal(back["big"], big)
        np.testing.assert_array_equal(back["small"], small)
