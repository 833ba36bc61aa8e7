"""Embedded-deformation graph warp fields (flat and hierarchical).

Capability parity with the reference's warp-field class hierarchy:
  - ``WarpField``  (``cpp/geometry/WarpField.h:30-173``): nodes + per-node
    rotation/translation, anchor computation, point/mesh warping, fixed or
    variable ("minimal 1-neighbor distance", ``WarpField.cpp:249-262``) node
    coverage, clone / apply / rotate / translate.
  - ``GraphWarpField`` / ``PlanarGraphWarpField``
    (``cpp/geometry/PlanarGraphWarpField.h:24-53``, python
    ``warp_field/graph_warp_field.py``): + explicit ``edges`` /
    ``edge_weights`` / ``clusters`` (the flat NNRT regularization graph).
  - ``HierarchicalGraphWarpField``
    (``cpp/geometry/HierarchicalGraphWarpField.{h,cpp}:74-312``):
    multi-resolution regularization pyramid with fine-to-coarse "virtual
    ordering" of nodes, per-layer decimation radii, and fixed-degree
    fine->coarse KNN edges — the structure that makes the GN Hessian an
    arrowhead matrix.

TPU-native design: warp fields are immutable flax pytree dataclasses — state
updates return new instances, which composes with jit/grad/scan and with
`jax.sharding` (node arrays shard over devices). Hierarchy *construction*
runs host-side in numpy (it happens once per graph rebuild, matches the
reference doing it on CPU tensors), but everything the per-frame loop touches
is a device array with static shape.
"""

from __future__ import annotations

import enum
from typing import Callable

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from dynamicfuion_python_tpu.ops.anchors import compute_anchors_euclidean
from dynamicfuion_python_tpu.ops.knn import knn
from dynamicfuion_python_tpu.ops.linalg import axis_angle_to_matrix
from dynamicfuion_python_tpu.ops.warp import blend_warp


class NodeCoverageMethod(enum.Enum):
    """Mirrors ``WarpNodeCoverageComputationMethod.h``."""

    FIXED = 0
    MINIMAL_K_NEIGHBOR_NODE_DISTANCE = 1


@flax.struct.dataclass
class WarpField:
    """Base warp field: N nodes with blended rigid transforms."""

    node_positions: jnp.ndarray  # f32[N, 3]
    node_rotations: jnp.ndarray  # f32[N, 3, 3]
    node_translations: jnp.ndarray  # f32[N, 3]
    # squared per-node coverage (VARIABLE method); equals coverage^2 broadcast
    # for FIXED so downstream kernels take one code path
    node_coverage_weights_squared: jnp.ndarray  # f32[N]
    node_coverage: float = flax.struct.field(pytree_node=False, default=0.05)
    anchor_count: int = flax.struct.field(pytree_node=False, default=4)
    minimum_valid_anchor_count: int = flax.struct.field(pytree_node=False, default=0)
    threshold_nodes_by_distance: bool = flax.struct.field(
        pytree_node=False, default=False
    )
    coverage_method: NodeCoverageMethod = flax.struct.field(
        pytree_node=False, default=NodeCoverageMethod.MINIMAL_K_NEIGHBOR_NODE_DISTANCE
    )

    # -- construction ---------------------------------------------------------

    @classmethod
    def create(
        cls,
        node_positions: jnp.ndarray,
        node_coverage: float = 0.05,
        anchor_count: int = 4,
        minimum_valid_anchor_count: int = 0,
        threshold_nodes_by_distance: bool = False,
        coverage_method: NodeCoverageMethod = (
            NodeCoverageMethod.MINIMAL_K_NEIGHBOR_NODE_DISTANCE
        ),
        **extra,
    ):
        node_positions = jnp.asarray(node_positions, jnp.float32)
        n = node_positions.shape[0]
        eye = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (n, 3, 3))
        zeros = jnp.zeros((n, 3), jnp.float32)
        cov_sq = _coverage_weights_squared(
            node_positions, node_coverage, coverage_method
        )
        return cls(
            node_positions=node_positions,
            node_rotations=eye,
            node_translations=zeros,
            node_coverage_weights_squared=cov_sq,
            node_coverage=float(node_coverage),
            anchor_count=int(anchor_count),
            minimum_valid_anchor_count=int(minimum_valid_anchor_count),
            threshold_nodes_by_distance=bool(threshold_nodes_by_distance),
            coverage_method=coverage_method,
            **extra,
        )

    @property
    def num_nodes(self) -> int:
        return self.node_positions.shape[0]

    # -- anchors & warping ----------------------------------------------------

    def compute_anchors(
        self, points: jnp.ndarray, disable_thresholding: bool = False
    ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """K-NN anchors + weights for arbitrary points (see ops.anchors)."""
        use_threshold = self.threshold_nodes_by_distance and not disable_thresholding
        return compute_anchors_euclidean(
            points,
            self.node_positions,
            self.anchor_count,
            node_coverage_squared=self.node_coverage_weights_squared,
            minimum_valid_anchor_count=self.minimum_valid_anchor_count,
            use_threshold=use_threshold,
        )

    def warp_points(
        self,
        points: jnp.ndarray,
        anchors: jnp.ndarray | None = None,
        weights: jnp.ndarray | None = None,
        normals: jnp.ndarray | None = None,
        extrinsics: jnp.ndarray | None = None,
    ):
        """Warp points (optionally with normals) by the blended field.

        ``extrinsics``: optional 4x4 applied after warping (world -> camera),
        matching ``WarpField::WarpMesh``'s extrinsics argument.
        """
        if anchors is None or weights is None:
            anchors, weights, _ = self.compute_anchors(points)
        out = blend_warp(
            points,
            self.node_positions,
            self.node_rotations,
            self.node_translations,
            anchors,
            weights,
            normals=normals,
        )
        if extrinsics is None:
            return out
        rot, t = extrinsics[:3, :3], extrinsics[:3, 3]
        apply = lambda p: jnp.einsum(
            "ij,...j->...i", rot, p, precision=jax.lax.Precision.HIGHEST
        )
        if normals is None:
            return apply(out) + t
        warped_p, warped_n = out
        return apply(warped_p) + t, apply(warped_n)

    def get_warped_nodes(self) -> jnp.ndarray:
        return self.node_positions + self.node_translations

    # -- state updates (return new instances) ---------------------------------

    def apply_transformations(
        self, rotations: jnp.ndarray, translations: jnp.ndarray
    ) -> "WarpField":
        """Overwrite node transforms (reference ``SetNodeRotations`` etc.)."""
        return self.replace(
            node_rotations=rotations, node_translations=translations
        )

    def rotate_nodes(self, rotation_deltas: jnp.ndarray) -> "WarpField":
        """Left-multiply per-node rotation deltas: R <- dR R.

        ``rotation_deltas``: f32[N, 3, 3] or axis-angle f32[N, 3]
        (axis-angle goes through Rodrigues, matching the GN update path,
        ``DeformableMeshToImageFitter.cpp:261``).
        """
        if rotation_deltas.ndim == 2:
            rotation_deltas = axis_angle_to_matrix(rotation_deltas)
        new_rot = jnp.einsum(
            "nab,nbc->nac",
            rotation_deltas,
            self.node_rotations,
            precision=jax.lax.Precision.HIGHEST,
        )
        return self.replace(node_rotations=new_rot)

    def translate_nodes(self, translation_deltas: jnp.ndarray) -> "WarpField":
        return self.replace(
            node_translations=self.node_translations + translation_deltas
        )

    def reset_rotations(self) -> "WarpField":
        eye = jnp.broadcast_to(
            jnp.eye(3, dtype=jnp.float32), self.node_rotations.shape
        )
        return self.replace(node_rotations=eye)

    def clone(self) -> "WarpField":
        return jax.tree_util.tree_map(lambda x: x, self)


def _coverage_weights_squared(
    node_positions: jnp.ndarray,
    node_coverage: float,
    method: NodeCoverageMethod,
) -> jnp.ndarray:
    """FIXED: coverage^2 broadcast. VARIABLE: squared distance to the nearest
    *other* node (reference ``RecomputeNodeCoverageWeights``,
    ``WarpField.cpp:249-262``; single-node fields fall back to coverage)."""
    n = node_positions.shape[0]
    if method == NodeCoverageMethod.FIXED or n == 1:
        base = node_coverage**2 if method == NodeCoverageMethod.FIXED else node_coverage
        return jnp.full((n,), jnp.float32(base))
    d2, _ = knn(node_positions, node_positions, 2)
    return d2[:, 1]


@flax.struct.dataclass
class GraphWarpField(WarpField):
    """Flat NNRT graph warp field: + edges / edge weights / clusters
    (python ``GraphWarpField`` semantics, ``warp_field/graph_warp_field.py:139``,
    ``cpp/geometry/PlanarGraphWarpField.h:24``).

    ``edges``: int32[N, Ke], -1-padded per-node neighbor lists (geodesic or
    Euclidean KNN). ``edge_weights``: f32[N, Ke]. ``clusters``: int32[N]
    connected-component label per node.
    """

    edges: jnp.ndarray = None  # type: ignore
    edge_weights: jnp.ndarray = None  # type: ignore
    clusters: jnp.ndarray = None  # type: ignore

    @classmethod
    def from_graph(
        cls,
        nodes: jnp.ndarray,
        edges: jnp.ndarray,
        edge_weights: jnp.ndarray | None = None,
        clusters: jnp.ndarray | None = None,
        **kwargs,
    ) -> "GraphWarpField":
        nodes = jnp.asarray(nodes, jnp.float32)
        edges = jnp.asarray(edges, jnp.int32)
        if edge_weights is None:
            edge_weights = jnp.where(edges >= 0, 1.0, 0.0).astype(jnp.float32)
        if clusters is None:
            clusters = compute_clusters(np.asarray(edges))
        return cls.create(
            nodes,
            edges=edges,
            edge_weights=jnp.asarray(edge_weights, jnp.float32),
            clusters=jnp.asarray(clusters, jnp.int32),
            **kwargs,
        )


def compute_clusters(edges: np.ndarray) -> np.ndarray:
    """Connected-component label per node over -1-padded neighbor lists.

    Host-side union-find (runs at graph build only) — mirrors
    ``nnrt.compute_clusters`` / ``find_knn_graph_connected_components``.
    """
    n = edges.shape[0]
    parent = np.arange(n)

    def find(i):
        root = i
        while parent[root] != root:
            root = parent[root]
        while parent[i] != root:
            parent[i], i = root, parent[i]
        return root

    for i in range(n):
        for j in edges[i]:
            if j >= 0:
                ri, rj = find(i), find(int(j))
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
    roots = np.array([find(i) for i in range(n)])
    _, labels = np.unique(roots, return_inverse=True)
    return labels.astype(np.int32)


@flax.struct.dataclass
class HierarchicalGraphWarpField(WarpField):
    """Multi-resolution regularization hierarchy over the warp-field nodes.

    Construction mirrors ``RebuildRegularizationLayers``
    (``HierarchicalGraphWarpField.cpp:74-200``):
      - layer 0 starts as all nodes; for each coarser layer i, the finer
        layer is median-grid-subsampled at cell 2 * decimation_radius(i) and
        the picked nodes MOVE UP to layer i (layers are disjoint);
      - ``virtual_node_indices`` lists original node indices in fine-to-coarse
        layer order — "virtual ordering". Virtual index v corresponds to
        original node ``virtual_node_indices[v]``;
      - each finer-layer node gets up to ``max_vertex_degree`` KNN edges into
        the next-coarser layer, expressed in virtual indices;
      - ``edge_layer_indices[e]`` = layer of the edge's (coarser) target;
      - arrow base for the arrowhead Hessian = #layer-0 nodes.
    """

    virtual_node_indices: jnp.ndarray = None  # int32[N] original idx per virtual idx
    edges: jnp.ndarray = None  # int32[E, 2] (fine virtual, coarse virtual)
    edge_layer_indices: jnp.ndarray = None  # int8[E]
    layer_node_counts: tuple = flax.struct.field(pytree_node=False, default=())
    layer_decimation_radii: tuple = flax.struct.field(pytree_node=False, default=())

    @classmethod
    def build(
        cls,
        node_positions: np.ndarray,
        node_coverage: float = 0.05,
        layer_count: int = 4,
        max_vertex_degree: int = 4,
        compute_layer_decimation_radius: Callable[[int, float], float] | None = None,
        **kwargs,
    ) -> "HierarchicalGraphWarpField":
        if compute_layer_decimation_radius is None:
            # reference default: (i_layer + 1) * node_coverage
            compute_layer_decimation_radius = lambda i, cov: float(i + 1) * cov

        positions = np.asarray(node_positions, np.float32)
        n = positions.shape[0]
        layer_members: list[np.ndarray] = [np.arange(n)]  # original indices
        radii = [float(node_coverage)]
        for i_layer in range(1, layer_count):
            finer = layer_members[i_layer - 1]
            radius = compute_layer_decimation_radius(i_layer, node_coverage)
            radii.append(float(radius))
            picked_local = _median_grid_subsample_np(positions[finer], 2.0 * radius)
            if len(picked_local) >= len(finer):
                # the finer layer is already at (or below) this layer's target
                # density — stop here with a shallower hierarchy instead of
                # failing; small scenes (few nodes) legitimately saturate
                # before reaching the configured layer_count
                radii.pop()
                break
            picked = finer[picked_local]
            keep_mask = np.ones(len(finer), bool)
            keep_mask[picked_local] = False
            layer_members[i_layer - 1] = finer[keep_mask]
            layer_members.append(picked)

        # virtual ordering: fine-to-coarse concatenation of original indices
        virtual_node_indices = np.concatenate(layer_members).astype(np.int32)
        layer_offsets = np.cumsum([0] + [len(m) for m in layer_members])

        # fine->coarse KNN edges between consecutive layers (virtual indices)
        edge_list, edge_layers = [], []
        for i_layer in range(len(layer_members) - 1, 0, -1):
            coarser = layer_members[i_layer]
            finer = layer_members[i_layer - 1]
            if len(coarser) == 0 or len(finer) == 0:
                continue
            deg = min(max_vertex_degree, len(coarser))
            _, nbr = knn(
                jnp.asarray(positions[finer]), jnp.asarray(positions[coarser]), deg
            )
            nbr = np.asarray(nbr)  # [F, deg] local coarse indices, ascending dist
            src = np.repeat(
                np.arange(len(finer)) + layer_offsets[i_layer - 1], deg
            )
            dst = (nbr + layer_offsets[i_layer]).reshape(-1)
            edge_list.append(np.stack([src, dst], axis=1))
            edge_layers.append(np.full(len(src), i_layer, np.int8))

        # concatenation order follows the reference: coarse-to-fine edge sets
        edges = (
            np.concatenate(edge_list) if edge_list else np.zeros((0, 2), np.int32)
        )
        edge_layer_indices = (
            np.concatenate(edge_layers) if edge_layers else np.zeros(0, np.int8)
        )

        return cls.create(
            jnp.asarray(positions),
            node_coverage=node_coverage,
            virtual_node_indices=jnp.asarray(virtual_node_indices),
            edges=jnp.asarray(edges.astype(np.int32)),
            edge_layer_indices=jnp.asarray(edge_layer_indices),
            layer_node_counts=tuple(int(len(m)) for m in layer_members),
            layer_decimation_radii=tuple(radii),
            **kwargs,
        )

    # -- virtual-ordering views ----------------------------------------------

    @property
    def arrow_base(self) -> int:
        """#finest-layer nodes == stem size of the arrowhead Hessian."""
        return self.layer_node_counts[0]

    def virtual_positions(self) -> jnp.ndarray:
        return self.node_positions[self.virtual_node_indices]

    def virtual_rotations(self) -> jnp.ndarray:
        return self.node_rotations[self.virtual_node_indices]

    def virtual_translations(self) -> jnp.ndarray:
        return self.node_translations[self.virtual_node_indices]

    def virtual_coverage_weights_squared(self) -> jnp.ndarray:
        return self.node_coverage_weights_squared[self.virtual_node_indices]

    def rotate_nodes_virtual(self, deltas: jnp.ndarray) -> "HierarchicalGraphWarpField":
        """Apply per-node rotation deltas given in virtual order."""
        if deltas.ndim == 2:
            deltas = axis_angle_to_matrix(deltas)
        scattered = jnp.zeros_like(deltas).at[self.virtual_node_indices].set(deltas)
        return self.rotate_nodes(scattered)

    def translate_nodes_virtual(
        self, deltas: jnp.ndarray
    ) -> "HierarchicalGraphWarpField":
        scattered = jnp.zeros_like(deltas).at[self.virtual_node_indices].set(deltas)
        return self.translate_nodes(scattered)


def _median_grid_subsample_np(points: np.ndarray, cell_size: float) -> np.ndarray:
    """Host-side closest-to-cell-mean subsample returning local indices
    (numpy twin of ``ops.sampling.median_grid_subsample`` for construction)."""
    mins = points.min(axis=0)
    cells = np.floor((points - mins) / cell_size).astype(np.int64)
    _, inverse = np.unique(cells, axis=0, return_inverse=True)
    picked = []
    for seg in range(inverse.max() + 1):
        members = np.nonzero(inverse == seg)[0]
        mean = points[members].mean(axis=0)
        picked.append(members[np.argmin(((points[members] - mean) ** 2).sum(-1))])
    return np.sort(np.asarray(picked))
