"""Geometry functional layer tests: KNN, camera, normals, sampling, anchors, warp.

Oracles are independent numpy implementations of the reference semantics
(SURVEY.md §2: WarpUtilities.h anchor/blend math, preprocessing.py normals,
GeometrySampling grid ops).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from dynamicfuion_python_tpu.ops.anchors import compute_anchors_euclidean
from dynamicfuion_python_tpu.ops.camera import (
    project_points,
    transform_points,
    unproject_depth_image,
)
from dynamicfuion_python_tpu.ops.knn import knn, squared_distance_matrix
from dynamicfuion_python_tpu.ops.normals import (
    mesh_vertex_normals,
    point_image_normals,
    triangle_normals,
)
from dynamicfuion_python_tpu.ops.sampling import (
    fast_mean_radius_downsample,
    fast_median_radius_subsample,
    mean_grid_downsample,
    median_grid_subsample,
)
from dynamicfuion_python_tpu.ops.warp import blend_warp


class TestKnn:
    def test_matches_scipy(self, rng):
        from scipy.spatial import cKDTree

        refs = rng.normal(size=(300, 3)).astype(np.float32)
        queries = rng.normal(size=(500, 3)).astype(np.float32)
        d2, idx = knn(jnp.asarray(queries), jnp.asarray(refs), 4, chunk_size=128)
        tree = cKDTree(refs)
        dist, expected_idx = tree.query(queries, k=4)
        np.testing.assert_array_equal(np.asarray(idx), expected_idx)
        np.testing.assert_allclose(np.sqrt(np.asarray(d2)), dist, atol=1e-3)

    def test_distance_matrix(self, rng):
        a = rng.normal(size=(10, 3)).astype(np.float32)
        b = rng.normal(size=(7, 3)).astype(np.float32)
        d2 = np.asarray(squared_distance_matrix(jnp.asarray(a), jnp.asarray(b)))
        expected = ((a[:, None] - b[None]) ** 2).sum(-1)
        np.testing.assert_allclose(d2, expected, atol=1e-5)


class TestCamera:
    INTRINSICS = np.array(
        [[570.0, 0.0, 320.0], [0.0, 570.0, 240.0], [0.0, 0.0, 1.0]], np.float32
    )

    def test_unproject_project_round_trip(self, rng):
        depth = (rng.uniform(500, 2500, size=(48, 64))).astype(np.uint16)
        depth[0, 0] = 0  # missing
        depth[1, 1] = 60000  # beyond far clip
        intr = jnp.asarray(self.INTRINSICS)
        points, mask = unproject_depth_image(jnp.asarray(depth), intr, 1000.0, 3.0)
        assert not np.asarray(mask)[0, 0] and not np.asarray(mask)[1, 1]
        uv, in_front = project_points(points, intr)
        v, u = np.mgrid[0:48, 0:64]
        m = np.asarray(mask)
        np.testing.assert_allclose(np.asarray(uv)[m][:, 0], u[m], atol=1e-3)
        np.testing.assert_allclose(np.asarray(uv)[m][:, 1], v[m], atol=1e-3)
        np.testing.assert_allclose(
            np.asarray(points)[m][:, 2], depth[m] / 1000.0, atol=1e-5
        )

    def test_transform_points(self, rng):
        from scipy.spatial.transform import Rotation

        mat = np.eye(4, dtype=np.float32)
        mat[:3, :3] = Rotation.from_rotvec([0.1, -0.2, 0.3]).as_matrix()
        mat[:3, 3] = [1, 2, 3]
        pts = rng.normal(size=(11, 3)).astype(np.float32)
        ours = np.asarray(transform_points(jnp.asarray(pts), jnp.asarray(mat)))
        expected = pts @ mat[:3, :3].T + mat[:3, 3]
        np.testing.assert_allclose(ours, expected, atol=1e-5)


def _reference_normals_oracle(vertex_map):
    """Line-for-line numpy mirror of the reference CUDA kernel semantics."""
    h, w = vertex_map.shape[:2]
    out = np.zeros_like(vertex_map)
    for y in range(1, h - 1):
        for x in range(1, w - 1):
            left, right = vertex_map[y, x - 1], vertex_map[y, x + 1]
            up, down = vertex_map[y - 1, x], vertex_map[y + 1, x]
            if 0 in (left[2], right[2], up[2], down[2]):
                continue
            n = np.cross(right - left, up - down)
            norm = np.linalg.norm(n)
            if norm == 0:
                continue
            n = n / norm
            out[y, x] = -n if n[2] > 0 else n
    return out


class TestNormals:
    def test_point_image_normals_match_reference_kernel(self, rng):
        depth = rng.uniform(0.5, 2.0, size=(12, 16)).astype(np.float32)
        depth[3, 4] = 0.0
        v, u = np.mgrid[0:12, 0:16].astype(np.float32)
        vmap = np.stack([(u - 8) / 570 * depth, (v - 6) / 570 * depth, depth], -1)
        vmap[depth == 0] = 0
        ours = np.asarray(point_image_normals(jnp.asarray(vmap)))
        oracle = _reference_normals_oracle(vmap)
        np.testing.assert_allclose(ours, oracle, atol=1e-5)

    def test_plane_mesh_normals(self):
        verts = jnp.asarray(
            [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], jnp.float32
        )
        tris = jnp.asarray([[0, 1, 2], [0, 2, 3]], jnp.int32)
        fn = np.asarray(triangle_normals(verts, tris))
        np.testing.assert_allclose(fn, [[0, 0, 1], [0, 0, 1]], atol=1e-6)
        vn = np.asarray(mesh_vertex_normals(verts, tris))
        np.testing.assert_allclose(vn, np.tile([[0, 0, 1]], (4, 1)), atol=1e-6)


class TestSampling:
    def test_mean_grid_downsample(self, rng):
        pts = rng.uniform(0, 1, size=(200, 3)).astype(np.float32)
        out, count = mean_grid_downsample(jnp.asarray(pts), 0.25)
        count = int(count)
        # numpy oracle
        mins = pts.min(0)
        cells = np.floor((pts - mins) / 0.25).astype(np.int64)
        keys = {}
        for p, c in zip(pts, cells):
            keys.setdefault(tuple(c), []).append(p)
        expected = {k: np.mean(v, axis=0) for k, v in keys.items()}
        assert count == len(expected)
        got = np.asarray(out)[:count]
        assert np.isnan(np.asarray(out)[count:]).all()
        # order-independent comparison
        got_sorted = got[np.lexsort(got.T)]
        exp = np.stack(list(expected.values()))
        exp_sorted = exp[np.lexsort(exp.T)]
        np.testing.assert_allclose(got_sorted, exp_sorted, atol=1e-5)

    def test_median_grid_subsample_picks_closest_to_mean(self, rng):
        pts = rng.uniform(0, 1, size=(100, 3)).astype(np.float32)
        idx, count = median_grid_subsample(jnp.asarray(pts), 0.5)
        count = int(count)
        idx = np.asarray(idx)[:count]
        assert len(set(idx.tolist())) == count  # unique picks
        mins = pts.min(0)
        cells = np.floor((pts - mins) / 0.5).astype(np.int64)
        cell_of = [tuple(c) for c in cells]
        groups = {}
        for i, c in enumerate(cell_of):
            groups.setdefault(c, []).append(i)
        assert count == len(groups)
        for i in idx:
            members = groups[cell_of[i]]
            mean = pts[members].mean(0)
            d = ((pts[members] - mean) ** 2).sum(-1)
            assert np.isclose(
                ((pts[i] - mean) ** 2).sum(), d.min(), atol=1e-6
            )

    def test_fast_mean_radius_downsample_merges_clusters(self, rng):
        # 6 tight clusters (diameter << radius) far apart: the two-pass grid
        # downsample must merge each cluster to (about) its mean and never
        # merge distinct clusters
        centers = np.array(
            [[0, 0, 0], [5, 0, 0], [0, 5, 0], [0, 0, 5], [5, 5, 0], [5, 5, 5]],
            np.float32,
        )
        pts = np.concatenate(
            [c + rng.normal(0, 0.01, size=(30, 3)) for c in centers]
        ).astype(np.float32)
        out, count = fast_mean_radius_downsample(jnp.asarray(pts), 0.5)
        count = int(count)
        assert count == len(centers)
        got = np.asarray(out)[:count]
        assert np.isnan(np.asarray(out)[count:]).all()
        # each result within 5 cm of one distinct center
        d = np.linalg.norm(got[:, None] - centers[None], axis=-1)
        assert sorted(d.argmin(1).tolist()) == list(range(len(centers)))
        assert (d.min(1) < 0.05).all()

    def test_fast_median_radius_subsample_returns_input_indices(self, rng):
        pts = rng.uniform(0, 1, size=(120, 3)).astype(np.float32)
        idx, count = fast_median_radius_subsample(jnp.asarray(pts), 0.2)
        count = int(count)
        idx = np.asarray(idx)
        assert count >= 1
        assert (idx[:count] >= 0).all() and (idx[:count] < 120).all()
        assert (idx[count:] == -1).all()
        assert len(set(idx[:count].tolist())) == count
        # sparser than the input and coarser radius gives fewer samples
        idx2, count2 = fast_median_radius_subsample(jnp.asarray(pts), 0.6)
        assert int(count2) <= count <= 120


class TestAnchors:
    def test_weights_formula_fixed(self, rng):
        nodes = rng.normal(size=(30, 3)).astype(np.float32)
        pts = rng.normal(size=(50, 3)).astype(np.float32)
        sigma = 0.35
        idx, w, valid = compute_anchors_euclidean(
            jnp.asarray(pts), jnp.asarray(nodes), 4, node_coverage=sigma
        )
        idx, w = np.asarray(idx), np.asarray(w)
        assert np.asarray(valid).all()
        for i in range(50):
            d2 = ((nodes - pts[i]) ** 2).sum(-1)
            nearest = np.argsort(d2)[:4]
            np.testing.assert_array_equal(np.sort(idx[i]), np.sort(nearest))
            expected = np.exp(-d2[idx[i]] / (2 * sigma**2))
            expected /= expected.sum()
            np.testing.assert_allclose(w[i], expected, atol=1e-5)

    def test_threshold_invalidates_far_points(self, rng):
        nodes = np.zeros((5, 3), np.float32)
        nodes[:, 0] = np.arange(5)
        pts = np.array([[0.1, 0, 0], [100.0, 0, 0]], np.float32)
        idx, w, valid = compute_anchors_euclidean(
            jnp.asarray(pts),
            jnp.asarray(nodes),
            4,
            node_coverage=0.5,
            minimum_valid_anchor_count=2,
            use_threshold=True,
        )
        valid = np.asarray(valid)
        assert valid[0] and not valid[1]
        assert (np.asarray(idx)[1] == -1).all()
        assert np.allclose(np.asarray(w)[1], 0)

    def test_variable_coverage(self, rng):
        nodes = rng.normal(size=(20, 3)).astype(np.float32)
        cov_sq = rng.uniform(0.05, 0.3, size=(20,)).astype(np.float32)
        pts = rng.normal(size=(15, 3)).astype(np.float32)
        idx, w, _ = compute_anchors_euclidean(
            jnp.asarray(pts),
            jnp.asarray(nodes),
            4,
            node_coverage_squared=jnp.asarray(cov_sq),
        )
        idx, w = np.asarray(idx), np.asarray(w)
        for i in range(15):
            d2 = ((nodes[idx[i]] - pts[i]) ** 2).sum(-1)
            expected = np.exp(-d2 / (2 * cov_sq[idx[i]]))
            expected /= expected.sum()
            np.testing.assert_allclose(w[i], expected, atol=1e-5)


class TestBlendWarp:
    def test_single_node_rigid(self, rng):
        from scipy.spatial.transform import Rotation

        node = np.array([[0.5, 0.5, 0.5]], np.float32)
        rot = Rotation.from_rotvec([0, np.pi / 4, 0]).as_matrix().astype(np.float32)
        trans = np.array([[0.1, 0.2, -0.3]], np.float32)
        pts = rng.normal(size=(20, 3)).astype(np.float32)
        anchors = np.zeros((20, 1), np.int32)
        weights = np.ones((20, 1), np.float32)
        warped = np.asarray(
            blend_warp(
                jnp.asarray(pts),
                jnp.asarray(node),
                jnp.asarray(rot[None]),
                jnp.asarray(trans),
                jnp.asarray(anchors),
                jnp.asarray(weights),
            )
        )
        expected = (pts - node[0]) @ rot.T + node[0] + trans[0]
        np.testing.assert_allclose(warped, expected, atol=1e-5)

    def test_multi_anchor_blend_oracle_and_normals(self, rng):
        from scipy.spatial.transform import Rotation

        n_nodes = 8
        nodes = rng.normal(size=(n_nodes, 3)).astype(np.float32)
        rots = Rotation.random(n_nodes, rng).as_matrix().astype(np.float32)
        trans = 0.1 * rng.normal(size=(n_nodes, 3)).astype(np.float32)
        pts = rng.normal(size=(10, 3)).astype(np.float32)
        normals = rng.normal(size=(10, 3)).astype(np.float32)
        normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
        anchors = np.stack(
            [rng.choice(n_nodes, 4, replace=False) for _ in range(10)]
        ).astype(np.int32)
        anchors[0, 2:] = -1  # invalid slots must be skipped
        weights = rng.uniform(0.1, 1, size=(10, 4)).astype(np.float32)
        weights[anchors < 0] = 0
        weights /= weights.sum(-1, keepdims=True)
        warped, warped_n = blend_warp(
            jnp.asarray(pts),
            jnp.asarray(nodes),
            jnp.asarray(rots),
            jnp.asarray(trans),
            jnp.asarray(anchors),
            jnp.asarray(weights),
            normals=jnp.asarray(normals),
        )
        # loop oracle mirroring BlendWarp (WarpUtilities.h:429-467)
        exp_p = np.zeros((10, 3), np.float32)
        exp_n = np.zeros((10, 3), np.float32)
        for i in range(10):
            for k in range(4):
                a = anchors[i, k]
                if a == -1:
                    continue
                wgt = weights[i, k]
                exp_p[i] += wgt * (
                    nodes[a] + rots[a] @ (pts[i] - nodes[a]) + trans[a]
                )
                exp_n[i] += wgt * (rots[a] @ normals[i])
        np.testing.assert_allclose(np.asarray(warped), exp_p, atol=1e-5)
        np.testing.assert_allclose(np.asarray(warped_n), exp_n, atol=1e-5)
