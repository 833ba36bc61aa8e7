"""TSDF voxel-block grid tests: hashing, activation, rigid + non-rigid
integration, truncation-region search, marching-tetrahedra extraction.

Mirrors the reference's synthetic-plane oracle strategy
(``tests/shared/tsdf.py:8-45``, ``cpp/tests/test_non_rigid_surface_voxel_block_grid.cpp``
probing via ``ExtractVoxelValuesAt``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamicfuion_python_tpu.models.voxel_block_grid import VoxelBlockGrid
from dynamicfuion_python_tpu.models.warp_field import WarpField
from dynamicfuion_python_tpu.ops import voxel_block_hash as vbh

INTRINSICS = jnp.asarray(
    [[500.0, 0.0, 32.0], [0.0, 500.0, 24.0], [0.0, 0.0, 1.0]], jnp.float32
)
H, W = 48, 64


def _plane_depth(z_m=1.0):
    """Constant-depth plane filling the frame (depth in mm)."""
    return jnp.full((H, W), int(z_m * 1000), jnp.uint16)


def _fresh_grid(**kw):
    defaults = dict(
        capacity=512,
        voxel_size=0.01,
        block_resolution=8,
        sdf_truncation_distance=0.04,
    )
    defaults.update(kw)
    return VoxelBlockGrid.create(**defaults)


class TestBlockHash:
    def test_pack_unpack_round_trip(self, rng):
        coords = rng.integers(-500, 500, size=(1000, 3)).astype(np.int32)
        keys = vbh.pack_block_keys(jnp.asarray(coords))
        back = np.asarray(vbh.unpack_block_keys(keys))
        np.testing.assert_array_equal(back, coords)

    def test_unique_keys_padded(self, rng):
        keys = jnp.asarray([5, 3, 5, vbh.EMPTY_KEY, 3, 9], jnp.int32)
        unique, count = vbh.unique_keys_padded(keys)
        assert int(count) == 3
        assert np.asarray(unique)[:3].tolist() == [3, 5, 9]
        assert (np.asarray(unique)[3:] == int(vbh.EMPTY_KEY)).all()

    def test_lookup(self, rng):
        coords = np.unique(
            rng.integers(-10, 10, size=(50, 3)).astype(np.int32), axis=0
        )
        n = len(coords)
        cap = 64
        slot_keys = np.full(cap, int(vbh.EMPTY_KEY), np.int32)
        slot_keys[:n] = np.asarray(
            vbh.pack_block_keys(jnp.asarray(coords))
        )
        sk, ss = vbh.build_sorted_index(jnp.asarray(slot_keys))
        slots, found = vbh.lookup(sk, ss, jnp.asarray(slot_keys[:n]))
        assert np.asarray(found).all()
        np.testing.assert_array_equal(np.asarray(slots), np.arange(n))
        _, missing = vbh.lookup(
            sk, ss, vbh.pack_block_keys(jnp.asarray([[400, 400, 400]]))
        )
        assert not np.asarray(missing).any()


class TestActivation:
    def test_activate_and_grow(self):
        grid = _fresh_grid()
        keys = vbh.pack_block_keys(
            jnp.asarray([[0, 0, 12], [1, 0, 12], [0, 0, 12]], jnp.int32)
        )
        padded = jnp.full((16,), vbh.EMPTY_KEY, jnp.int32).at[:3].set(keys)
        grid = grid.activate(padded)
        assert int(grid.occupied_count()) == 2
        # re-activating the same keys is a no-op
        grid2 = grid.activate(padded)
        assert int(grid2.occupied_count()) == 2
        # lookups find them
        _, found = grid.find_block_slots(keys)
        assert np.asarray(found).all()

    def test_discovery_covers_plane(self):
        grid = _fresh_grid()
        keys = grid.compute_unique_block_coordinates(
            _plane_depth(1.0), INTRINSICS, stride=2
        )
        grid = grid.activate(keys)
        count = int(grid.occupied_count())
        assert count > 0
        # the block layer containing z=1.0 must be present
        coords = np.asarray(grid.block_coordinates())[
            np.asarray(grid.occupied_mask())
        ]
        z_blocks = set(coords[:, 2].tolist())
        assert int(np.floor(1.0 / grid.block_side())) in z_blocks


class TestRigidIntegration:
    def test_plane_tsdf_profile(self):
        grid = _fresh_grid()
        depth = _plane_depth(1.0)
        grid = grid.activate(
            grid.compute_unique_block_coordinates(depth, INTRINSICS, stride=2)
        )
        grid = grid.integrate(depth, INTRINSICS)
        # probe voxels along the central ray (u=32, v=24 -> x=y=0)
        zs = np.arange(int(0.9 / 0.01), int(1.1 / 0.01))
        probes = np.stack([np.zeros_like(zs), np.zeros_like(zs), zs], -1)
        t, w, found = map(
            np.asarray, grid.extract_voxel_values_at(jnp.asarray(probes, jnp.int32))
        )
        trunc = grid.sdf_truncation_distance
        for z, ti, wi, fi in zip(zs, t, w, found):
            psdf = 1.0 - z * 0.01
            if not fi or psdf <= -trunc:
                continue
            if wi > 0:
                expected = min(psdf, trunc) / trunc
                assert abs(ti - expected) < 1e-3, (z, ti, expected)
        # weight accumulates on the second integration
        grid2 = grid.integrate(depth, INTRINSICS)
        _, w2, _ = map(
            np.asarray, grid2.extract_voxel_values_at(jnp.asarray(probes, jnp.int32))
        )
        assert (w2[w > 0] == w[w > 0] + 1).all()


class TestNonRigidIntegration:
    def _graph_over_plane(self):
        xs, ys = np.meshgrid(np.linspace(-0.1, 0.1, 4), np.linspace(-0.08, 0.08, 4))
        nodes = np.stack([xs.ravel(), ys.ravel(), np.ones(16)], -1).astype(
            np.float32
        )
        return WarpField.create(
            nodes,
            node_coverage=0.1,
            anchor_count=4,
            minimum_valid_anchor_count=3,
            threshold_nodes_by_distance=True,
        )

    def test_identity_warp_matches_rigid(self):
        depth = _plane_depth(1.0)
        field = self._graph_over_plane()

        rigid = _fresh_grid()
        keys = rigid.compute_unique_block_coordinates(depth, INTRINSICS, stride=2)
        rigid = rigid.activate(keys)
        nonrigid = _fresh_grid().activate(keys)

        rigid = rigid.integrate(depth, INTRINSICS)

        mask = nonrigid.find_blocks_intersecting_truncation_region(
            depth, field, INTRINSICS
        )
        slots = jnp.arange(nonrigid.capacity)
        nonrigid = nonrigid.integrate_non_rigid(
            slots, mask, field, depth, INTRINSICS
        )

        # wherever the non-rigid path integrated, values must match the rigid
        # result (identity warp); the non-rigid path may touch fewer voxels
        # because of the anchor-threshold validity rule.
        w_nr = np.asarray(nonrigid.weight)
        w_r = np.asarray(rigid.weight)
        t_nr = np.asarray(nonrigid.tsdf)
        t_r = np.asarray(rigid.tsdf)
        touched = w_nr > 0
        assert touched.sum() > 1000
        assert (w_r[touched] > 0).all()
        np.testing.assert_allclose(t_nr[touched], t_r[touched], atol=1e-4)

    def test_translated_warp_shifts_surface(self):
        # warp field translates everything +2cm in z: the *canonical* surface
        # voxels now project 2cm in front of the observed depth, so the zero
        # crossing moves to canonical z = 0.98.
        depth = _plane_depth(1.0)
        field = self._graph_over_plane().translate_nodes(
            jnp.broadcast_to(jnp.asarray([0.0, 0.0, 0.02]), (16, 3))
        )
        grid = _fresh_grid()
        keys = grid.compute_unique_block_coordinates(depth, INTRINSICS, stride=2)
        grid = grid.activate(keys)
        mask = grid.find_blocks_intersecting_truncation_region(
            depth, field, INTRINSICS
        )
        grid = grid.integrate_non_rigid(
            jnp.arange(grid.capacity), mask, field, depth, INTRINSICS
        )
        zs = np.arange(94, 102)
        probes = np.stack([np.zeros_like(zs), np.zeros_like(zs), zs], -1)
        t, w, found = map(
            np.asarray,
            grid.extract_voxel_values_at(jnp.asarray(probes, jnp.int32)),
        )
        integrated = w > 0
        assert integrated.any()
        # zero crossing between canonical z=0.97 and z=0.99
        t97 = t[zs == 97][0]
        t99 = t[zs == 99][0]
        assert t97 > 0 and t99 < 0

    def test_sleeve_activation_adds_ring(self):
        grid = _fresh_grid()
        keys = vbh.pack_block_keys(jnp.asarray([[0, 0, 12]], jnp.int32))
        grid = grid.activate(
            jnp.full((4,), vbh.EMPTY_KEY, jnp.int32).at[0].set(keys[0])
        )
        mask = grid.occupied_mask()
        grid = grid.activate_sleeve_blocks(mask)
        assert int(grid.occupied_count()) == 27


def _sphere_grid(r_sphere=0.2):
    """Grid whose TSDF is the analytic normalized sphere SDF (radius 0.2)."""
    grid = _fresh_grid(capacity=1024, voxel_size=0.01)
    rng_blocks = range(-4, 4)
    coords = np.array(
        [[i, j, k] for i in rng_blocks for j in rng_blocks for k in rng_blocks],
        np.int32,
    )
    keys = vbh.pack_block_keys(jnp.asarray(coords))
    padded = jnp.full((1024,), vbh.EMPTY_KEY, jnp.int32).at[: len(coords)].set(
        keys
    )
    grid = grid.activate(padded)
    slots = jnp.arange(grid.capacity)
    world = grid._voxel_world_positions(slots)
    sdf = (jnp.linalg.norm(world, axis=-1) - r_sphere) / grid.sdf_truncation_distance
    sdf = jnp.clip(sdf, -1.0, 1.0)
    occ = grid.occupied_mask()[:, None, None, None]
    return grid.replace(
        tsdf=jnp.where(occ, sdf, 0.0),
        weight=jnp.where(occ, 1.0, 0.0),
    )


class TestExtraction:
    def test_sphere_surface(self):
        r_sphere = 0.2
        grid = _sphere_grid(r_sphere)
        tris, count = grid.extract_triangle_soup(max_triangles=60_000)
        count = int(count)
        assert 0 < count < 60_000
        tris = np.asarray(tris)[:count]
        radii = np.linalg.norm(tris.reshape(-1, 3), axis=-1)
        np.testing.assert_allclose(radii, r_sphere, atol=0.011)
        # outward orientation: face normal must point away from the center
        a, bb, c = tris[:, 0], tris[:, 1], tris[:, 2]
        n = np.cross(bb - a, c - a)
        centroid = tris.mean(axis=1)
        dots = (n * centroid).sum(-1)
        nonzero = np.linalg.norm(n, axis=-1) > 1e-12
        assert (dots[nonzero] > 0).mean() > 0.99

    def test_welded_mesh_matches_soup(self):
        r_sphere = 0.2
        grid = _sphere_grid(r_sphere)
        verts, faces, v_count, t_count = grid.extract_triangle_mesh(
            max_triangles=60_000
        )
        v_count, t_count = int(v_count), int(t_count)
        assert 0 < t_count < 60_000
        # welding must actually share vertices (closed surface: V ~ T/2)
        assert 0 < v_count < t_count
        verts_np = np.asarray(verts)
        faces_np = np.asarray(faces)[:t_count]
        assert faces_np.min() >= 0 and faces_np.max() < v_count
        # reconstructed triangle positions lie on the sphere
        tri_pts = verts_np[faces_np].reshape(-1, 3)
        np.testing.assert_allclose(
            np.linalg.norm(tri_pts, axis=-1), r_sphere, atol=0.011
        )
        # every referenced vertex index is used consistently: welded faces
        # must reproduce the soup area within float tolerance
        soup, sc = grid.extract_triangle_soup(max_triangles=60_000)
        soup = np.asarray(soup)[: int(sc)]

        def area(t):
            return 0.5 * np.linalg.norm(
                np.cross(t[:, 1] - t[:, 0], t[:, 2] - t[:, 0]), axis=-1
            ).sum()

        np.testing.assert_allclose(
            area(verts_np[faces_np]), area(soup), rtol=1e-4
        )


class TestSamplingAndRayCast:
    def test_sample_tsdf_trilinear(self):
        grid = _sphere_grid()
        # at exact voxel centers the trilinear sample equals the stored value
        probes_idx = np.array([[0, 0, 18], [5, -3, 17], [-10, 2, -16]], np.int32)
        stored_t, stored_w, found = map(
            np.asarray, grid.extract_voxel_values_at(jnp.asarray(probes_idx))
        )
        assert found.all() and (stored_w > 0).all()
        val, valid = grid.sample_tsdf(
            jnp.asarray(probes_idx, jnp.float32) * grid.voxel_size
        )
        assert np.asarray(valid).all()
        np.testing.assert_allclose(np.asarray(val), stored_t, atol=1e-5)
        # midway between centers: the average of the two
        mid = jnp.asarray([[0.0, 0.0, 18.5 * grid.voxel_size]])
        val_mid, ok = grid.sample_tsdf(mid)
        t2, _, _ = map(
            np.asarray,
            grid.extract_voxel_values_at(jnp.asarray([[0, 0, 18], [0, 0, 19]])),
        )
        assert np.asarray(ok).all()
        np.testing.assert_allclose(
            np.asarray(val_mid)[0], 0.5 * (t2[0] + t2[1]), atol=1e-5
        )
        # far outside any allocated block -> invalid
        _, bad = grid.sample_tsdf(jnp.asarray([[10.0, 10.0, 10.0]]))
        assert not np.asarray(bad).any()

    def test_ray_cast_sphere(self):
        r_sphere = 0.2
        grid = _sphere_grid(r_sphere)
        # camera at z=-0.6 looking +z at the sphere centered at origin
        extr = jnp.asarray(
            [
                [1.0, 0, 0, 0],
                [0, 1.0, 0, 0],
                [0, 0, 1.0, 0.6],
                [0, 0, 0, 1.0],
            ],
            jnp.float32,
        )
        res = grid.ray_cast(
            INTRINSICS, extr, width=W, height=H, depth_min=0.1,
            with_normals=True,
        )
        mask = np.asarray(res["mask"])
        assert mask[H // 2, W // 2]
        # central ray hits the near pole: depth = 0.6 - 0.2 = 0.4
        d_center = float(np.asarray(res["depth"])[H // 2, W // 2])
        assert abs(d_center - 0.4) < 0.01
        # all hit points lie on the sphere
        pts = np.asarray(res["points"])[mask]
        np.testing.assert_allclose(
            np.linalg.norm(pts, axis=-1), r_sphere, atol=0.01
        )
        # normals point outward (away from origin)
        nrm = np.asarray(res["normals"])[mask]
        dots = (nrm * pts).sum(-1) / np.maximum(
            np.linalg.norm(pts, axis=-1), 1e-9
        )
        assert (dots > 0.9).mean() > 0.99

    def test_ray_cast_integrated_plane(self):
        grid = _fresh_grid()
        depth = _plane_depth(1.0)
        grid = grid.activate(
            grid.compute_unique_block_coordinates(depth, INTRINSICS, stride=2)
        )
        grid = grid.integrate(depth, INTRINSICS)
        res = grid.ray_cast(INTRINSICS, None, width=W, height=H)
        d = np.asarray(res["depth"])
        mask = np.asarray(res["mask"])
        assert mask[H // 2, W // 2]
        # ray_cast depth ~ integrated plane depth at every hit pixel
        np.testing.assert_allclose(d[mask], 1.0, atol=0.01)


class TestMarchingCubes:
    def _sphere_block(self, r=16, radius=0.3):
        import jax.numpy as jnp

        grid = np.mgrid[0 : r + 1, 0 : r + 1, 0 : r + 1].astype(np.float32)
        grid = grid.transpose(1, 2, 3, 0)
        scale = 1.0 / r
        center = np.array([0.5, 0.5, 0.5]) / scale
        tsdf = (
            np.linalg.norm(grid - center, axis=-1) * scale - radius
        ).astype(np.float32)[None]
        valid = np.ones_like(tsdf, bool)
        return (
            jnp.asarray(tsdf),
            jnp.asarray(valid),
            jnp.zeros((1, 3), jnp.float32),
            scale,
        )

    def test_sphere_accuracy_and_orientation(self):
        from dynamicfuion_python_tpu.ops.marching_cubes import marching_cubes

        tsdf, valid, origins, scale = self._sphere_block()
        verts, count = marching_cubes(tsdf, valid, origins, scale, 8192)
        count = int(count)
        assert count > 500
        v = np.asarray(verts)[:count]
        center = np.array([0.5, 0.5, 0.5])
        d = np.linalg.norm(v.reshape(-1, 3) - center, axis=-1)
        assert float(np.abs(d - 0.3).max()) < scale / 4
        # outward winding everywhere (TSDF positive outside)
        a, b, c = v[:, 0], v[:, 1], v[:, 2]
        n = np.cross(b - a, c - a)
        outward = np.einsum("ij,ij->i", n, a - center)
        assert (outward > 0).all()

    def test_closed_surface_is_edge_manifold(self):
        """Crack-free check: after welding, every edge of the closed sphere
        surface is shared by exactly two triangles (the per-face pairing
        convention must agree between neighboring cells)."""
        from dynamicfuion_python_tpu.ops.marching_cubes import marching_cubes

        tsdf, valid, origins, scale = self._sphere_block()
        verts, count = marching_cubes(tsdf, valid, origins, scale, 8192)
        count = int(count)
        v = np.asarray(verts)[:count].reshape(-1, 3)
        q = np.round(v / 1e-6).astype(np.int64)
        _, inv = np.unique(q, axis=0, return_inverse=True)
        faces = inv.reshape(-1, 3)
        deg = (
            (faces[:, 0] == faces[:, 1])
            | (faces[:, 1] == faces[:, 2])
            | (faces[:, 0] == faces[:, 2])
        )
        faces = faces[~deg]
        edges = np.concatenate(
            [faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]]
        )
        edges = np.sort(edges, axis=1)
        _, counts = np.unique(edges, axis=0, return_counts=True)
        assert (counts == 2).all(), np.bincount(counts)

    def test_matches_tetrahedra_isosurface(self):
        """Both kernels approximate the same zero level set: every MC
        vertex must lie within a voxel of the tetrahedra surface."""
        from dynamicfuion_python_tpu.ops.marching_cubes import marching_cubes
        from dynamicfuion_python_tpu.ops.marching_tetrahedra import (
            marching_tetrahedra,
        )
        from scipy.spatial import cKDTree

        tsdf, valid, origins, scale = self._sphere_block()
        mc_v, mc_n = marching_cubes(tsdf, valid, origins, scale, 8192)
        mt_v, mt_n = marching_tetrahedra(tsdf, valid, origins, scale, 32768)
        mc = np.asarray(mc_v)[: int(mc_n)].reshape(-1, 3)
        mt = np.asarray(mt_v)[: int(mt_n)].reshape(-1, 3)
        assert int(mc_n) < int(mt_n) / 2  # the point of MC: far fewer tris
        d, _ = cKDTree(mt).query(mc)
        assert float(d.max()) < scale
