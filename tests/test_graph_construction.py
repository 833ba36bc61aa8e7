"""Graph-construction tests (erosion, node sampling, geodesic edges/anchors),
mirroring the reference's ``tests/test_compute_anchors.py`` /
``cpp/tests/test_graph_proc.cpp`` oracle style."""

import numpy as np
import pytest

from dynamicfuion_python_tpu.ops.graph_construction import (
    compute_anchors_shortest_path,
    compute_edges_euclidean,
    compute_edges_shortest_path,
    node_and_edge_cleanup,
    sample_nodes,
    update_pixel_anchors,
    vertex_erosion_mask,
)


def _grid_mesh(n=10, spacing=0.1):
    xs, ys = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    verts = np.stack(
        [xs.ravel() * spacing, ys.ravel() * spacing, np.ones(n * n)], -1
    ).astype(np.float32)
    tris = []
    for i in range(n - 1):
        for j in range(n - 1):
            a, b, c, d = i * n + j, (i + 1) * n + j, (i + 1) * n + j + 1, i * n + j + 1
            tris += [[a, b, c], [a, c, d]]
    return verts, np.asarray(tris, np.int32)


class TestErosion:
    def test_erodes_border(self):
        verts, tris = _grid_mesh(10)
        mask = vertex_erosion_mask(verts, tris, iteration_count=1, min_neighbors=4)
        grid = mask.reshape(10, 10)
        # corners participate in few faces -> eroded
        assert not grid[0, 0] and not grid[9, 9]
        assert grid[5, 5]

    def test_zero_iterations_keeps_all(self):
        verts, tris = _grid_mesh(6)
        mask = vertex_erosion_mask(verts, tris, 0, 4)
        assert mask.all()


class TestSampleNodes:
    def test_coverage_property(self):
        verts, tris = _grid_mesh(20, spacing=0.05)
        nodes, idx = sample_nodes(verts, None, node_coverage=0.15, use_only_non_eroded=False)
        # no two nodes within coverage radius
        d = np.linalg.norm(nodes[:, None] - nodes[None], axis=-1)
        np.fill_diagonal(d, 1e9)
        assert d.min() > 0.15
        # every vertex within coverage of some node (greedy guarantees this)
        dv = np.linalg.norm(verts[:, None] - nodes[None], axis=-1).min(1)
        assert dv.max() <= 0.15 + 1e-6

    def test_respects_erosion_mask(self):
        verts, tris = _grid_mesh(10)
        mask = np.zeros(len(verts), bool)
        mask[:50] = True
        _, idx = sample_nodes(verts, mask, 0.15, use_only_non_eroded=True)
        assert (idx < 50).all()


class TestGeodesicEdges:
    def test_chain_graph(self):
        # a thin strip: geodesic neighbors = sequential along the strip
        n = 20
        verts = np.stack(
            [np.arange(n) * 0.1, np.zeros(n), np.ones(n)], -1
        ).astype(np.float32)
        # build strip triangles with a parallel row
        verts2 = verts + np.array([0, 0.1, 0], np.float32)
        allv = np.concatenate([verts, verts2])
        tris = []
        for i in range(n - 1):
            tris += [[i, n + i, i + 1], [i + 1, n + i, n + i + 1]]
        tris = np.asarray(tris, np.int32)
        node_vertices = np.asarray([0, 5, 10, 15], np.int32)
        edges, weights, dists, n2v = compute_edges_shortest_path(
            allv, tris, node_vertices, 2, node_coverage=0.3,
            enforce_total_num_neighbors=True,
        )
        # node 0 (at x=0) -> nearest geodesic nodes are 1 (x=0.5) then 2 (x=1.0)
        assert edges[0, 0] == 1 and edges[0, 1] == 2
        assert abs(dists[0, 0] - 0.5) < 1e-4
        # middle node sees both sides
        assert set(edges[1].tolist()) == {0, 2}
        # weights normalized
        np.testing.assert_allclose(weights[(edges >= 0).any(1)].sum(1), 1.0, atol=1e-5)

    def test_max_influence_limits_reach(self):
        n = 20
        verts = np.stack(
            [np.arange(n) * 0.1, np.zeros(n), np.ones(n)], -1
        ).astype(np.float32)
        verts2 = verts + np.array([0, 0.1, 0], np.float32)
        allv = np.concatenate([verts, verts2])
        tris = []
        for i in range(n - 1):
            tris += [[i, n + i, i + 1], [i + 1, n + i, n + i + 1]]
        tris = np.asarray(tris, np.int32)
        node_vertices = np.asarray([0, 15], np.int32)
        edges, _, _, _ = compute_edges_shortest_path(
            allv, tris, node_vertices, 2, node_coverage=0.3,
            enforce_total_num_neighbors=False,  # limit = 2 * 0.3 = 0.6 < 1.5
        )
        assert edges[0, 0] == -1  # too far to reach within max influence

    def test_geodesic_vs_euclidean_differ_around_slit(self):
        # two parallel strips close in space but connected only at one end:
        # geodesic distance between facing nodes is large
        n = 12
        row0 = np.stack([np.arange(n) * 0.1, np.zeros(n), np.ones(n)], -1)
        row1 = row0 + [0, 0.02, 0]  # spatially 2cm apart
        verts = np.concatenate([row0, row1]).astype(np.float32)
        tris = [[n - 1, 2 * n - 1, n - 2], [n - 2, 2 * n - 1, 2 * n - 2]]
        for i in range(n - 2):
            tris += [[i, i + 1, i]]  # degenerate padding (keeps rows separate)
        # proper in-row connectivity
        tris = [[i, i + 1, n + 0] for i in range(0)]  # replaced below
        tris = []
        for i in range(n - 1):
            tris.append([i, i + 1, i])  # row 0 chain (degenerate tris OK for adjacency)
            tris.append([n + i, n + i + 1, n + i])
        tris.append([n - 1, 2 * n - 1, n - 1])  # connect only at the far end
        tris = np.asarray(tris, np.int32)
        node_vertices = np.asarray([0, n], np.int32)  # facing pair at near end
        edges, _, dists, _ = compute_edges_shortest_path(
            verts, tris, node_vertices, 1, 0.3, enforce_total_num_neighbors=True
        )
        # geodesic distance must be ~ 1.1*2 (around the slit), not 0.02
        assert dists[0, 0] > 2.0


class TestAnchorsShortestPath:
    def test_anchor_selection(self):
        n2v = np.asarray(
            [[0.0, 0.5, np.inf], [1.0, 0.1, np.inf], [2.0, 3.0, np.inf]],
            np.float32,
        )  # 3 nodes x 3 vertices
        anchors, weights = compute_anchors_shortest_path(n2v, 0.5, anchor_count=2)
        assert anchors[0].tolist() == [0, 1]  # vertex 0: node0 (0.0), node1 (1.0)
        assert anchors[1].tolist() == [1, 0]
        assert (anchors[2] == -1).all()
        np.testing.assert_allclose(weights[:2].sum(1), 1.0, atol=1e-5)
        assert weights[2].sum() == 0


class TestEuclideanEdgesAndCleanup:
    def test_euclidean_edges(self):
        nodes = np.array([[0, 0, 0], [1, 0, 0], [2, 0, 0], [10, 0, 0]], np.float32)
        edges, w = compute_edges_euclidean(nodes, 2, node_coverage=1.0)
        assert edges[0].tolist() == [1, 2]
        assert edges[3, 0] == 2
        np.testing.assert_allclose(w.sum(1), 1.0, atol=1e-5)

    def test_cleanup(self):
        edges = np.array([[1, 2], [0, 2], [0, 1], [-1, -1]], np.int32)
        valid, cleaned = node_and_edge_cleanup(edges, min_neighbors=2)
        assert valid.tolist() == [True, True, True, False]
        assert (cleaned[3] == -1).all()

    def test_update_pixel_anchors(self):
        # nodes 0..3; node 1 removed -> mapping [0, -1, 1, 2]
        mapping = np.array([0, -1, 1, 2], np.int32)
        anchors = np.array(
            [[[0, 1, -1, 3], [2, 2, 1, -1]]], np.int32
        )  # [1, 2, 4] pixel-anchor image
        out = update_pixel_anchors(mapping, anchors)
        assert out[0, 0].tolist() == [0, -1, -1, 2]
        assert out[0, 1].tolist() == [1, 1, -1, -1]


class TestGraphDataApp:
    """create_graph_data app: graph blobs round-trip in the reference's
    byte format (reference apps/create_graph_data.py:331-413, data/io.py:200-407)."""

    def _synthetic_depth(self, h=60, w=80, z_mm=1000):
        depth = np.zeros((h, w), np.uint16)
        depth[10:-10, 10:-10] = z_mm
        intr = np.array(
            [[80.0, 0, w / 2], [0, 80.0, h / 2], [0, 0, 1]], np.float32
        )
        return depth, intr

    def test_roundtrip_and_layout(self, tmp_path):
        from dynamicfuion_python_tpu.apps.create_graph_data import (
            load_graph_data,
            process_frame,
            save_graph_data,
        )

        depth, intr = self._synthetic_depth()
        nodes, edges, ew, clusters, anchors, weights, _ = process_frame(
            depth, intr, node_coverage=0.2, erosion_iterations=1
        )
        assert len(nodes) >= 2 and edges.shape[0] == len(nodes)
        written = save_graph_data(
            tmp_path, "000000_000050", 0.2,
            nodes, edges, ew, clusters, anchors, weights,
        )
        assert (tmp_path / "graph_nodes" / "000000_000050_geodesic_0.20.bin").is_file()
        assert set(written) == {
            "graph_nodes", "graph_edges", "graph_edges_weights",
            "graph_clusters", "pixel_anchors", "pixel_weights",
        }
        data = load_graph_data(tmp_path, "000000_000050", 0.2)
        np.testing.assert_array_equal(data["nodes"], nodes)
        np.testing.assert_array_equal(data["edges"], edges)
        np.testing.assert_array_equal(data["edge_weights"], ew)
        np.testing.assert_array_equal(data["clusters"].ravel(), clusters.ravel())
        np.testing.assert_array_equal(data["pixel_anchors"], anchors)
        np.testing.assert_array_equal(data["pixel_weights"], weights)
        assert data["node_deformations"] is None

    def test_scene_flow_node_deformations(self):
        from dynamicfuion_python_tpu.apps.create_graph_data import process_frame

        depth, intr = self._synthetic_depth()
        flow = np.tile(
            np.array([0.01, -0.02, 0.03], np.float32), depth.shape + (1,)
        )
        *_, deform = process_frame(
            depth, intr, node_coverage=0.2, erosion_iterations=1, scene_flow=flow
        )
        np.testing.assert_allclose(deform, [[0.01, -0.02, 0.03]] * len(deform))
