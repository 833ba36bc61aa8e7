"""Warp-field model tests (flat + hierarchical), mirroring the reference's
``tests/test_graph_warp_field.py`` and the C++ hierarchical-constructor
verification (``cpp/tests/test_graph_warp_field.cpp:342-347``)."""

import jax.numpy as jnp
import numpy as np
import pytest

from dynamicfuion_python_tpu.models.warp_field import (
    GraphWarpField,
    HierarchicalGraphWarpField,
    NodeCoverageMethod,
    WarpField,
    compute_clusters,
)


def _grid_nodes(nx=6, ny=6, spacing=0.1):
    xs, ys = np.meshgrid(np.arange(nx), np.arange(ny), indexing="ij")
    nodes = np.stack(
        [xs.ravel() * spacing, ys.ravel() * spacing, np.ones(nx * ny)], -1
    )
    return nodes.astype(np.float32)


class TestWarpField:
    def test_identity_field_is_noop(self, rng):
        field = WarpField.create(_grid_nodes(), node_coverage=0.15)
        pts = jnp.asarray(rng.uniform(0, 0.5, (40, 3)).astype(np.float32))
        warped = field.warp_points(pts)
        np.testing.assert_allclose(np.asarray(warped), np.asarray(pts), atol=1e-5)

    def test_uniform_translation(self, rng):
        field = WarpField.create(_grid_nodes(), node_coverage=0.15)
        delta = jnp.asarray([0.05, -0.02, 0.03], jnp.float32)
        field = field.translate_nodes(jnp.broadcast_to(delta, (field.num_nodes, 3)))
        pts = jnp.asarray(rng.uniform(0, 0.5, (40, 3)).astype(np.float32))
        warped = field.warp_points(pts)
        np.testing.assert_allclose(
            np.asarray(warped), np.asarray(pts + delta), atol=1e-5
        )

    def test_variable_coverage_is_nearest_neighbor_distance_squared(self):
        nodes = np.array([[0, 0, 0], [1, 0, 0], [3, 0, 0]], np.float32)
        field = WarpField.create(
            nodes,
            node_coverage=0.5,
            coverage_method=NodeCoverageMethod.MINIMAL_K_NEIGHBOR_NODE_DISTANCE,
        )
        np.testing.assert_allclose(
            np.asarray(field.node_coverage_weights_squared), [1.0, 1.0, 4.0], atol=1e-5
        )

    def test_fixed_coverage(self):
        field = WarpField.create(
            _grid_nodes(), node_coverage=0.2, coverage_method=NodeCoverageMethod.FIXED
        )
        np.testing.assert_allclose(
            np.asarray(field.node_coverage_weights_squared), 0.04, atol=1e-6
        )

    def test_rotate_nodes_axis_angle_and_extrinsics(self, rng):
        from scipy.spatial.transform import Rotation

        nodes = _grid_nodes()
        field = WarpField.create(nodes, node_coverage=0.15)
        aa = 0.1 * rng.normal(size=(field.num_nodes, 3)).astype(np.float32)
        field = field.rotate_nodes(jnp.asarray(aa))
        np.testing.assert_allclose(
            np.asarray(field.node_rotations),
            Rotation.from_rotvec(aa).as_matrix(),
            atol=1e-5,
        )
        # extrinsics: rigid transform applied after warp
        ext = np.eye(4, dtype=np.float32)
        ext[:3, :3] = Rotation.from_rotvec([0, 0, 0.3]).as_matrix()
        ext[:3, 3] = [1, 0, 0]
        identity = WarpField.create(nodes, node_coverage=0.15)
        pts = jnp.asarray(rng.uniform(0, 0.5, (10, 3)).astype(np.float32))
        warped = identity.warp_points(pts, extrinsics=jnp.asarray(ext))
        np.testing.assert_allclose(
            np.asarray(warped),
            np.asarray(pts) @ ext[:3, :3].T + ext[:3, 3],
            atol=1e-5,
        )


class TestGraphWarpField:
    def test_clusters_connected_components(self):
        # two components: 0-1-2 and 3-4
        edges = np.array(
            [[1, -1], [0, 2], [1, -1], [4, -1], [3, -1]], np.int32
        )
        labels = compute_clusters(edges)
        assert labels[0] == labels[1] == labels[2]
        assert labels[3] == labels[4]
        assert labels[0] != labels[3]

    def test_from_graph(self, rng):
        nodes = _grid_nodes(4, 4)
        edges = np.full((16, 4), -1, np.int32)
        for i in range(15):
            edges[i, 0] = i + 1
        field = GraphWarpField.from_graph(nodes, edges, node_coverage=0.15)
        assert field.edges.shape == (16, 4)
        assert int(jnp.max(field.clusters)) == 0  # one chain component
        assert field.num_nodes == 16


class TestHierarchicalGraphWarpField:
    def test_layers_partition_nodes(self, rng):
        nodes = _grid_nodes(10, 10, spacing=0.05)
        field = HierarchicalGraphWarpField.build(
            nodes, node_coverage=0.05, layer_count=3, max_vertex_degree=4
        )
        counts = field.layer_node_counts
        assert sum(counts) == 100
        assert counts[0] > counts[1] > counts[2] > 0
        # virtual ordering is a permutation of all original indices
        vni = np.asarray(field.virtual_node_indices)
        assert sorted(vni.tolist()) == list(range(100))
        # decimation radii follow the reference default (i+1)*coverage
        np.testing.assert_allclose(
            field.layer_decimation_radii, [0.05, 0.10, 0.15], atol=1e-6
        )

    def test_saturated_hierarchy_truncates_gracefully(self):
        # a tiny node set cannot populate 4 layers; construction must stop at
        # the deepest layer that still shrinks instead of failing (reference
        # RebuildRegularizationLayers tolerates shallow hierarchies)
        nodes = _grid_nodes(2, 2, spacing=0.5)
        field = HierarchicalGraphWarpField.build(
            nodes, node_coverage=0.05, layer_count=4, max_vertex_degree=4
        )
        counts = field.layer_node_counts
        assert sum(counts) == 4
        assert len(counts) <= 4
        assert len(field.layer_decimation_radii) == len(counts)
        vni = np.asarray(field.virtual_node_indices)
        assert sorted(vni.tolist()) == list(range(4))

    def test_edges_connect_consecutive_layers(self):
        nodes = _grid_nodes(10, 10, spacing=0.05)
        field = HierarchicalGraphWarpField.build(
            nodes, node_coverage=0.05, layer_count=3, max_vertex_degree=4
        )
        counts = field.layer_node_counts
        offsets = np.cumsum([0] + list(counts))
        edges = np.asarray(field.edges)
        layers = np.asarray(field.edge_layer_indices)
        assert edges.shape[1] == 2 and len(edges) == len(layers)
        for (src, dst), layer in zip(edges, layers):
            src_layer = np.searchsorted(offsets, src, side="right") - 1
            dst_layer = np.searchsorted(offsets, dst, side="right") - 1
            assert dst_layer == src_layer + 1
            assert dst_layer == layer
        # every non-coarsest-layer node has exactly max_vertex_degree edges
        n_fine = sum(counts[:-1])
        src_counts = np.bincount(edges[:, 0], minlength=100)
        assert (src_counts[:n_fine] == 4).all()
        assert (src_counts[n_fine:] == 0).all()

    def test_edge_targets_are_knn(self):
        nodes = _grid_nodes(10, 10, spacing=0.05)
        field = HierarchicalGraphWarpField.build(
            nodes, node_coverage=0.05, layer_count=2, max_vertex_degree=2
        )
        counts = field.layer_node_counts
        pos = np.asarray(field.virtual_positions())
        edges = np.asarray(field.edges)
        coarse = pos[counts[0] :]
        for src in range(counts[0]):
            targets = edges[edges[:, 0] == src][:, 1] - counts[0]
            d = ((coarse - pos[src]) ** 2).sum(-1)
            kth = np.sort(d)[1]
            # ties on the regular grid make the exact index set ambiguous;
            # require each chosen target to be within the k-th smallest distance
            assert (d[targets] <= kth + 1e-6).all()
            assert len(set(targets.tolist())) == 2

    def test_virtual_updates_roundtrip(self, rng):
        nodes = _grid_nodes(8, 8, spacing=0.06)
        field = HierarchicalGraphWarpField.build(
            nodes, node_coverage=0.06, layer_count=2
        )
        deltas = rng.normal(size=(64, 3)).astype(np.float32) * 0.01
        updated = field.translate_nodes_virtual(jnp.asarray(deltas))
        vni = np.asarray(field.virtual_node_indices)
        np.testing.assert_allclose(
            np.asarray(updated.node_translations)[vni], deltas, atol=1e-6
        )

    def test_arrow_base(self):
        nodes = _grid_nodes(10, 10, spacing=0.05)
        field = HierarchicalGraphWarpField.build(
            nodes, node_coverage=0.05, layer_count=3
        )
        assert field.arrow_base == field.layer_node_counts[0]
