"""Deformation-graph construction from meshes (host-side, runs at graph
(re)build time only).

Capability parity with the reference's legacy NNRT preprocessing
(``cpp/cpu/graph_proc.{h:15-101,cpp}``): mesh erosion masks, greedy
coverage-radius node sampling, geodesic (shortest-path-over-mesh) node edges
with Gaussian weights, geodesic/Euclidean vertex anchors, node/edge cleanup,
and connected-component clusters. These are inherently sequential graph
traversals that run once per sequence / graph rebuild, so — per the build
plan (SURVEY.md §7.2 item 7) — they stay on the host in numpy + heapq rather
than being forced into XLA.

Semantics matched to the reference:
  - erosion: iteratively drop faces any of whose vertices touch fewer than
    ``min_neighbors`` surviving faces; the mask marks vertices of surviving
    faces (``graph_proc.cpp:27-90``);
  - node sampling: greedy Poisson-disk — accept a vertex as node iff no
    previously accepted node lies within ``node_coverage``
    (``graph_proc.cpp:92-152``);
  - geodesic edges: per node, Dijkstra over the mesh vertex graph in
    ascending distance order; the first ``max_neighbor_count`` *other* nodes
    reached become edges with weights exp(-d^2 / (2 sigma^2)) normalized per
    node (uniform fallback), expansion limited to 2 * node_coverage unless
    ``enforce_total_num_neighbors`` (``graph_proc.cpp:195-338``);
  - anchors (shortest-path): per vertex, the K nodes with smallest geodesic
    distance, weights as above (``compute_pixel_anchors_shortest_path``).
"""

from __future__ import annotations

import heapq

import numpy as np


def mesh_from_depth_image(
    point_image: np.ndarray,
    max_triangle_edge_distance: float = 0.05,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Point image f32[H, W, 3] (z == 0 invalid) -> grid-connected mesh.

    Mirrors ``cpp/cpu/image_proc.cpp:341`` ``compute_mesh_from_depth``: each
    pixel square becomes up to two triangles (00-01-10 and 01-11-10 pixel
    order) whose edges must all be shorter than
    ``max_triangle_edge_distance``; winding makes normals face the camera.

    Returns (vertices f32[V, 3], vertex_pixels i32[V, 2] as (v_row, u_col),
    faces i32[F, 3]).
    """
    pts = np.asarray(point_image, np.float32)
    h, w = pts.shape[:2]
    valid = pts[..., 2] > 0

    p00 = pts[:-1, :-1]
    p01 = pts[1:, :-1]
    p10 = pts[:-1, 1:]
    p11 = pts[1:, 1:]
    v00 = valid[:-1, :-1]
    v01 = valid[1:, :-1]
    v10 = valid[:-1, 1:]
    v11 = valid[1:, 1:]

    def edge_ok(a, b):
        return np.linalg.norm(a - b, axis=-1) <= max_triangle_edge_distance

    tri_a = v00 & v01 & v10 & edge_ok(p00, p01) & edge_ok(p00, p10) & edge_ok(p01, p10)
    tri_b = v01 & v11 & v10 & edge_ok(p01, p11) & edge_ok(p01, p10) & edge_ok(p11, p10)

    used = np.zeros((h, w), bool)
    yy, xx = np.nonzero(tri_a)
    used[yy, xx] = True
    used[yy + 1, xx] = True
    used[yy, xx + 1] = True
    yy, xx = np.nonzero(tri_b)
    used[yy + 1, xx] = True
    used[yy + 1, xx + 1] = True
    used[yy, xx + 1] = True

    vert_index = np.full((h, w), -1, np.int64)
    vy, vx = np.nonzero(used)
    vert_index[vy, vx] = np.arange(len(vy))
    vertices = pts[vy, vx]
    vertex_pixels = np.stack([vy, vx], 1).astype(np.int32)

    ya, xa = np.nonzero(tri_a)
    faces_a = np.stack(
        [vert_index[ya, xa], vert_index[ya + 1, xa], vert_index[ya, xa + 1]], 1
    )
    yb, xb = np.nonzero(tri_b)
    faces_b = np.stack(
        [vert_index[yb + 1, xb], vert_index[yb + 1, xb + 1], vert_index[yb, xb + 1]], 1
    )
    faces = np.concatenate([faces_a, faces_b]).astype(np.int32)
    return vertices, vertex_pixels, faces


def vertex_erosion_mask(
    vertex_positions: np.ndarray,
    triangles: np.ndarray,
    iteration_count: int,
    min_neighbors: int,
) -> np.ndarray:
    """bool[V]: True for vertices surviving ``iteration_count`` erosions."""
    v = len(vertex_positions)
    faces = np.asarray(triangles, np.int64)
    for _ in range(iteration_count):
        counts = np.bincount(faces.reshape(-1), minlength=v)
        keep = (counts[faces] >= min_neighbors).all(axis=1)
        faces = faces[keep]
    mask = np.zeros(v, bool)
    if len(faces):
        mask[np.unique(faces)] = True
    return mask


def sample_nodes(
    vertex_positions: np.ndarray,
    vertex_mask: np.ndarray | None,
    node_coverage: float,
    use_only_non_eroded: bool = True,
    random_shuffle: bool = False,
    seed: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Greedy coverage sampling -> (node positions f32[N,3], vertex idx i32[N])."""
    pts = np.asarray(vertex_positions, np.float32)
    order = np.arange(len(pts))
    if random_shuffle:
        np.random.default_rng(seed).shuffle(order)
    cov_sq = node_coverage * node_coverage
    chosen: list[int] = []
    chosen_pts = np.empty((0, 3), np.float32)
    # grid hash for O(1) coverage queries
    cell = node_coverage
    grid: dict[tuple, list[int]] = {}
    for vi in order:
        if use_only_non_eroded and vertex_mask is not None and not vertex_mask[vi]:
            continue
        p = pts[vi]
        key = tuple((p // cell).astype(np.int64))
        covered = False
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dz in (-1, 0, 1):
                    for ci in grid.get((key[0] + dx, key[1] + dy, key[2] + dz), ()):
                        if ((p - pts[ci]) ** 2).sum() <= cov_sq:
                            covered = True
                            break
                    if covered:
                        break
                if covered:
                    break
            if covered:
                break
        if not covered:
            grid.setdefault(key, []).append(vi)
            chosen.append(vi)
    idx = np.asarray(chosen, np.int32)
    return pts[idx], idx


def _vertex_adjacency(vertex_count: int, triangles: np.ndarray):
    """Adjacency lists (index array + neighbor array, CSR-ish)."""
    faces = np.asarray(triangles, np.int64)
    src = np.concatenate(
        [faces[:, 0], faces[:, 0], faces[:, 1], faces[:, 1], faces[:, 2], faces[:, 2]]
    )
    dst = np.concatenate(
        [faces[:, 1], faces[:, 2], faces[:, 0], faces[:, 2], faces[:, 0], faces[:, 1]]
    )
    pairs = np.unique(np.stack([src, dst], 1), axis=0)
    counts = np.bincount(pairs[:, 0], minlength=vertex_count)
    starts = np.concatenate([[0], np.cumsum(counts)])
    return starts, pairs[:, 1]


def compute_edges_shortest_path(
    vertex_positions: np.ndarray,
    triangles: np.ndarray,
    node_vertex_indices: np.ndarray,
    max_neighbor_count: int,
    node_coverage: float,
    enforce_total_num_neighbors: bool = False,
    vertex_mask: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Geodesic node edges.

    Returns (edges i32[N,K] -1-padded, weights f32[N,K] normalized,
    distances f32[N,K], node_to_vertex_distances f32[N,V] inf where
    unreached).
    """
    pts = np.asarray(vertex_positions, np.float32)
    v = len(pts)
    n = len(node_vertex_indices)
    k = max_neighbor_count
    starts, nbrs = _vertex_adjacency(v, triangles)
    vertex_to_node = np.full(v, -1, np.int64)
    vertex_to_node[np.asarray(node_vertex_indices, np.int64)] = np.arange(n)
    max_influence = 2.0 * node_coverage
    sigma_sq2 = 2.0 * node_coverage * node_coverage

    edges = np.full((n, k), -1, np.int32)
    weights = np.zeros((n, k), np.float32)
    distances = np.zeros((n, k), np.float32)
    n2v = np.full((n, v), np.inf, np.float32)

    for ni in range(n):
        start_vertex = int(node_vertex_indices[ni])
        if start_vertex < 0:
            continue
        heap = [(0.0, start_vertex)]
        visited = np.zeros(v, bool)
        found = 0
        raw_w = []
        while heap:
            d, vi = heapq.heappop(heap)
            if visited[vi]:
                continue
            node_id = vertex_to_node[vi]
            if node_id >= 0 and node_id != ni:
                edges[ni, found] = node_id
                raw_w.append(np.exp(-d * d / sigma_sq2))
                distances[ni, found] = d
                found += 1
                if found >= k:
                    break
            n2v[ni, vi] = d
            visited[vi] = True
            p = pts[vi]
            for nb in nbrs[starts[vi] : starts[vi + 1]]:
                if vertex_mask is not None and not vertex_mask[nb]:
                    continue
                if visited[nb]:
                    continue
                nd = d + float(np.linalg.norm(p - pts[nb]))
                if enforce_total_num_neighbors or nd <= max_influence:
                    heapq.heappush(heap, (nd, int(nb)))
        if raw_w:
            s = sum(raw_w)
            norm = s if s > 0 else len(raw_w)
            weights[ni, : len(raw_w)] = np.asarray(raw_w, np.float32) / norm
    return edges, weights, distances, n2v


def compute_anchors_shortest_path(
    node_to_vertex_distances: np.ndarray,
    node_coverage: float,
    anchor_count: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Geodesic vertex anchors from the N x V distance matrix.

    Per vertex: the K nodes with smallest geodesic distance (inf = unreached
    -> -1), weights exp(-d^2/(2 sigma^2)) normalized
    (``compute_vertex_anchors_shortest_path`` semantics).
    """
    d = np.asarray(node_to_vertex_distances)  # [N, V]
    n, v = d.shape
    k = min(anchor_count, n)
    order = np.argsort(d, axis=0, kind="stable")[:k]  # [K, V]
    dist = np.take_along_axis(d, order, axis=0)  # [K, V]
    valid = np.isfinite(dist)
    anchors = np.where(valid, order, -1).T.astype(np.int32)  # [V, K]
    w = np.where(
        valid, np.exp(-(dist**2) / (2.0 * node_coverage**2)), 0.0
    ).T.astype(np.float32)
    sums = w.sum(1, keepdims=True)
    counts = np.maximum((anchors >= 0).sum(1, keepdims=True), 1)
    w = np.where(
        sums > 0, w / np.maximum(sums, 1e-30), np.where(anchors >= 0, 1.0 / counts, 0.0)
    )
    return anchors, w.astype(np.float32)


def compute_pixel_anchors_shortest_path(
    point_image: np.ndarray,  # f32[H, W, 3] camera-space points (z=0 invalid)
    node_positions: np.ndarray,  # f32[N, 3]
    node_edges: np.ndarray,  # int32[N, Ke] (-1 pad) node adjacency
    anchor_count: int,
    node_coverage: float,
) -> tuple[np.ndarray, np.ndarray]:
    """Shortest-path pixel anchors (the reference's
    ``compute_anchors_and_weights_shortest_path_fixed_node_weight`` on point
    images, ``WarpAnchorComputationImpl.h``): each pixel seeds at its
    Euclidean-nearest node and ranks nodes by (euclidean distance to the
    seed) + (graph-geodesic distance seed -> node over the node adjacency).
    Weights exp(-d^2 / (2 sigma^2)), normalized. Anchors beyond
    2 * node_coverage are dropped (-1).
    """
    from scipy.sparse import csr_matrix
    from scipy.sparse.csgraph import dijkstra
    from scipy.spatial import cKDTree

    nodes = np.asarray(node_positions, np.float32)
    n = len(nodes)
    edges = np.asarray(node_edges)
    src = np.repeat(np.arange(n), edges.shape[1])
    dst = edges.reshape(-1)
    ok = dst >= 0
    src, dst = src[ok], dst[ok]
    lengths = np.linalg.norm(nodes[src] - nodes[dst], axis=1)
    graph = csr_matrix((lengths, (src, dst)), shape=(n, n))
    node_dist = dijkstra(graph, directed=False)  # [N, N], inf unreachable

    h, w = point_image.shape[:2]
    pts = np.asarray(point_image, np.float32).reshape(-1, 3)
    valid = pts[:, 2] > 0
    anchors = np.full((h * w, anchor_count), -1, np.int32)
    weights = np.zeros((h * w, anchor_count), np.float32)
    if valid.any() and n > 0:
        seed_d, seed = cKDTree(nodes).query(pts[valid], k=1)
        total = seed_d[:, None] + node_dist[seed]  # [P, N]
        k = min(anchor_count, n)
        order = np.argsort(total, axis=1, kind="stable")[:, :k]
        dist = np.take_along_axis(total, order, axis=1)
        keep = np.isfinite(dist) & (dist <= 2.0 * node_coverage)
        a = np.where(keep, order, -1).astype(np.int32)
        wts = np.where(
            keep, np.exp(-(dist**2) / (2.0 * node_coverage**2)), 0.0
        )
        sums = wts.sum(1, keepdims=True)
        counts = np.maximum((a >= 0).sum(1, keepdims=True), 1)
        wts = np.where(
            sums > 0,
            wts / np.maximum(sums, 1e-30),
            np.where(a >= 0, 1.0 / counts, 0.0),
        )
        anchors[valid, :k] = a
        weights[valid, :k] = wts.astype(np.float32)
    return anchors.reshape(h, w, anchor_count), weights.reshape(
        h, w, anchor_count
    )


def compute_edges_euclidean(
    node_positions: np.ndarray, max_neighbor_count: int, node_coverage: float
) -> tuple[np.ndarray, np.ndarray]:
    """Euclidean KNN node edges + normalized Gaussian weights
    (``nnrt.compute_edges_euclidean``)."""
    from scipy.spatial import cKDTree

    pts = np.asarray(node_positions, np.float32)
    k = min(max_neighbor_count + 1, len(pts))
    dist, idx = cKDTree(pts).query(pts, k=k)
    # drop self (first column)
    dist, idx = dist[:, 1:], idx[:, 1:]
    edges = idx.astype(np.int32)
    w = np.exp(-(dist**2) / (2.0 * node_coverage**2)).astype(np.float32)
    w /= np.maximum(w.sum(1, keepdims=True), 1e-30)
    if edges.shape[1] < max_neighbor_count:
        pad = max_neighbor_count - edges.shape[1]
        edges = np.pad(edges, ((0, 0), (0, pad)), constant_values=-1)
        w = np.pad(w, ((0, 0), (0, pad)))
    return edges, w


def node_and_edge_cleanup(edges: np.ndarray, min_neighbors: int = 2):
    """Iteratively mark nodes with too few neighbors invalid and remove
    edges to them (``nnrt.node_and_edge_clean_up`` semantics). Returns
    (valid_mask bool[N], cleaned edges)."""
    edges = np.asarray(edges).copy()
    n = edges.shape[0]
    valid = np.ones(n, bool)
    changed = True
    while changed:
        changed = False
        neighbor_counts = (edges >= 0).sum(1)
        kill = valid & (neighbor_counts < min_neighbors)
        if kill.any():
            valid[kill] = False
            edges[np.isin(edges, np.nonzero(kill)[0])] = -1
            edges[kill] = -1
            changed = True
    return valid, edges


def update_pixel_anchors(
    node_id_mapping: np.ndarray, pixel_anchors: np.ndarray
) -> np.ndarray:
    """Renumber a pixel-anchor image after node removal
    (``nnrt.update_pixel_anchors`` semantics,
    ``cpp/cpu/graph_proc.h:15-101``): ``node_id_mapping[i]`` is the new
    index of old node ``i`` (-1 = removed). Anchors pointing at removed
    nodes become -1."""
    mapping = np.asarray(node_id_mapping, np.int32)
    anchors = np.asarray(pixel_anchors, np.int32)
    out = np.full_like(anchors, -1)
    present = anchors >= 0
    out[present] = mapping[anchors[present]]
    return out
