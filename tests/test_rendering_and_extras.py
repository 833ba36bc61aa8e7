"""Shaders, forward renderer, legacy image-proc extras, mesh utils."""

import jax.numpy as jnp
import numpy as np
import pytest

INTR = jnp.asarray(
    [[100.0, 0.0, 32.0], [0.0, 100.0, 32.0], [0.0, 0.0, 1.0]], jnp.float32
)
SIZE = (64, 64)


def _quad(z=1.0, half=0.2):
    verts = jnp.asarray(
        [[-half, -half, z], [half, -half, z], [half, half, z], [-half, half, z]],
        jnp.float32,
    )
    tris = jnp.asarray([[0, 2, 1], [0, 3, 2]], jnp.int32)
    return verts, tris


class TestRenderer:
    def test_render_depth_and_normal_shading(self):
        from dynamicfuion_python_tpu.models.renderer import MeshRenderer

        verts, tris = _quad()
        renderer = MeshRenderer(SIZE, INTR)
        color, depth = renderer.render_mesh(verts, tris)
        d = np.asarray(depth)
        c = np.asarray(color)
        assert np.allclose(d[25:40, 25:40], 1.0, atol=1e-4)
        assert (d[:10] == 0).all()
        # lit interior vs white background
        assert c[32, 32].max() <= 0.95 and np.allclose(c[2, 2], 1.0)

    def test_vertex_colors(self):
        from dynamicfuion_python_tpu.models.renderer import MeshRenderer

        verts, tris = _quad()
        colors = jnp.asarray(
            [[1, 0, 0], [1, 0, 0], [1, 0, 0], [1, 0, 0]], jnp.float32
        )
        renderer = MeshRenderer(SIZE, INTR)
        color, _ = renderer.render_mesh(verts, tris, colors)
        np.testing.assert_allclose(np.asarray(color)[32, 36], [1, 0, 0], atol=1e-4)

    def test_flat_edge_shader(self):
        from dynamicfuion_python_tpu.ops.rasterize import (
            extract_face_vertices,
            rasterize_binned,
        )
        from dynamicfuion_python_tpu.ops.shading import flat_edge_shader

        verts, tris = _quad()
        fv, valid = extract_face_vertices(verts, tris, INTR, SIZE)
        frag = rasterize_binned(fv, valid, SIZE)
        img = np.asarray(flat_edge_shader(frag))
        interior = img[30, 36]
        # somewhere near the quad diagonal there must be edge-colored pixels
        diag = np.asarray([img[i, i] for i in range(14, 50)])
        assert np.allclose(interior, 0.8, atol=0.05)
        assert (diag.min(0) < 0.1).any()


class TestImageProcExtras:
    def test_filter_depth_median(self):
        from dynamicfuion_python_tpu.ops.image_proc_extras import filter_depth

        depth = np.zeros((5, 5), np.uint16)
        depth[2, 2] = 1000
        depth[2, 3] = 1200
        depth[1, 2] = 1100
        out = np.asarray(filter_depth(jnp.asarray(depth), radius=1))
        # window of (2,2) holds {1000, 1100, 1200} -> median 1100
        assert out[2, 2] == 1100
        # empty windows stay zero
        assert out[4, 0] == 0

    def test_boundary_mask(self):
        from dynamicfuion_python_tpu.ops.image_proc_extras import (
            compute_boundary_mask,
        )

        depth = np.full((6, 6), 1000, np.float32)
        depth[:, 3:] = 2000
        mask = np.asarray(compute_boundary_mask(jnp.asarray(depth), 100.0))
        assert mask[2, 2] and mask[2, 3]
        assert not mask[2, 1]

    def test_augmented_flow_composition(self):
        from dynamicfuion_python_tpu.ops.image_proc_extras import (
            compute_augmented_flow_from_rotation,
        )

        h = w = 8
        f1 = jnp.full((h, w, 2), 1.0)  # +1 px in u and v
        f2 = jnp.full((h, w, 2), 2.0)
        f3 = jnp.full((h, w, 2), -1.0)
        total = compute_augmented_flow_from_rotation(f1, f2, f3)
        inner = np.asarray(total)[1:-4, 1:-4]
        np.testing.assert_allclose(inner, 2.0, atol=1e-5)


class TestMeshUtils:
    def test_join_and_adjacency(self):
        from dynamicfuion_python_tpu.ops.mesh_utils import (
            adjacency_array_to_edges,
            join_triangle_meshes,
            mesh_to_adjacency_array,
        )

        v = np.zeros((3, 3), np.float32)
        t = np.asarray([[0, 1, 2]], np.int32)
        verts, tris = join_triangle_meshes([(v, t), (v, t)])
        assert verts.shape == (6, 3)
        np.testing.assert_array_equal(tris[1], [3, 4, 5])
        adj = mesh_to_adjacency_array(t, 3, max_degree=4)
        np.testing.assert_array_equal(adj[0], [1, 2, -1, -1])
        edges = adjacency_array_to_edges(adj)
        assert {tuple(e) for e in edges} == {(0, 1), (0, 2), (1, 2)}

    def test_radius_search_averaging(self):
        from dynamicfuion_python_tpu.ops.mesh_utils import radius_search_averaging

        pts = np.asarray(
            [[0, 0, 0], [0.01, 0, 0], [1, 0, 0], [1.02, 0, 0]], np.float32
        )
        out = radius_search_averaging(pts, 0.1)
        assert len(out) == 2
        np.testing.assert_allclose(out[0], [0.005, 0, 0], atol=1e-6)

    def test_regular_graph(self):
        from dynamicfuion_python_tpu.ops.mesh_utils import construct_regular_graph

        h = w = 16
        v, u = np.mgrid[0:h, 0:w].astype(np.float32)
        pts = np.stack([(u - 8) / 100, (v - 8) / 100, np.ones_like(u)], -1)
        nodes, edges, anchors, weights = construct_regular_graph(
            pts, 4, 4, edge_threshold=1.0, max_point_to_node_distance=1.0,
            max_depth=2.0,
        )
        assert len(nodes) == 16
        assert (edges[5] >= 0).sum() == 8  # interior lattice node
        s = weights.sum(-1)
        np.testing.assert_allclose(s[anchors.min(-1) >= 0], 1.0, atol=1e-5)
