"""Offline deformation-graph data generator for DeepDeform-layout sequences.

Capability parity with the reference ``apps/create_graph_data.py:27-419``:
for each (masked) depth frame of a sequence, build the embedded deformation
graph — depth -> mesh -> erosion -> coverage-radius node sampling -> geodesic
(shortest-path) edges -> node/edge cleanup -> per-pixel anchors + weights ->
connected-component clusters — and write the results as DeepDeform graph-data
blobs (``graph_nodes/ graph_edges/ graph_edges_weights/ graph_clusters/
pixel_anchors/ pixel_weights`` subdirs, ``<pair>_geodesic_<coverage>.bin``
files) byte-compatible with the reference's ``data/io.py`` formats, plus
optional node deformations when a scene-flow frame is given.

The graph build itself is host-side numpy (it runs once per sequence /
keyframe, not per tracked frame — see SURVEY.md §7.2 step 7); all per-frame
hot paths live in the JAX ops.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

from dynamicfuion_python_tpu.data import io as dio
from dynamicfuion_python_tpu.data.camera import load_intrinsics_txt
from dynamicfuion_python_tpu.data.deform_dataset import build_graph_for_frame


def save_graph_data(
    seq_dir: str | Path,
    pair_name: str,
    node_coverage: float,
    nodes: np.ndarray,
    edges: np.ndarray,
    edge_weights: np.ndarray,
    clusters: np.ndarray,
    pixel_anchors: np.ndarray | None = None,
    pixel_weights: np.ndarray | None = None,
    node_deformations: np.ndarray | None = None,
) -> dict[str, Path]:
    """Write one frame's graph blobs in the reference directory layout."""
    seq_dir = Path(seq_dir)
    stem = f"{pair_name}_geodesic_{node_coverage:.2f}.bin"
    written: dict[str, Path] = {}

    def _put(subdir: str, saver, array) -> None:
        out_dir = seq_dir / subdir
        out_dir.mkdir(parents=True, exist_ok=True)
        path = out_dir / stem
        saver(path, array)
        written[subdir] = path

    _put("graph_nodes", dio.save_graph_nodes, nodes)
    _put("graph_edges", dio.save_graph_edges, edges)
    _put("graph_edges_weights", dio.save_graph_edges_weights, edge_weights)
    _put("graph_clusters", dio.save_graph_clusters, clusters.reshape(-1, 1))
    if node_deformations is not None:
        _put(
            "graph_node_deformations",
            dio.save_graph_node_deformations,
            node_deformations,
        )
    if pixel_anchors is not None:
        _put("pixel_anchors", dio.save_int_image, pixel_anchors)
    if pixel_weights is not None:
        _put("pixel_weights", dio.save_float_image, pixel_weights)
    return written


def load_graph_data(seq_dir: str | Path, pair_name: str, node_coverage: float):
    """Inverse of :func:`save_graph_data` -> dict of arrays (missing optional
    blobs map to None)."""
    seq_dir = Path(seq_dir)
    stem = f"{pair_name}_geodesic_{node_coverage:.2f}.bin"

    def _opt(subdir: str, loader):
        path = seq_dir / subdir / stem
        return loader(path) if path.is_file() else None

    return {
        "nodes": dio.load_graph_nodes(seq_dir / "graph_nodes" / stem),
        "edges": dio.load_graph_edges(seq_dir / "graph_edges" / stem),
        "edge_weights": dio.load_graph_edges_weights(
            seq_dir / "graph_edges_weights" / stem
        ),
        "clusters": dio.load_graph_clusters(seq_dir / "graph_clusters" / stem),
        "node_deformations": _opt(
            "graph_node_deformations", dio.load_graph_node_deformations
        ),
        "pixel_anchors": _opt("pixel_anchors", dio.load_int_image),
        "pixel_weights": _opt("pixel_weights", dio.load_float_image),
    }


def _load_depth_png(path: Path) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path)).astype(np.uint16)


def process_frame(
    depth: np.ndarray,
    intrinsics: np.ndarray,
    node_coverage: float,
    mask: np.ndarray | None = None,
    scene_flow: np.ndarray | None = None,
    max_neighbor_count: int = 8,
    erosion_iterations: int = 10,
    erosion_min_neighbors: int = 4,
    depth_scale: float = 1000.0,
    depth_max: float = 6.0,
):
    """One frame -> graph arrays (+ node deformations when scene flow given).

    ``scene_flow`` is f32[H, W, 3] per-pixel 3D motion; node deformations are
    sampled at the node source pixels (reference ``create_graph_data.py:135-142``).
    """
    if mask is not None:
        depth = np.where(mask > 0, depth, 0)
    nodes, edges, edge_weights, clusters, anchors, weights, node_pixels = (
        build_graph_for_frame(
            depth,
            intrinsics,
            node_coverage=node_coverage,
            max_neighbor_count=max_neighbor_count,
            erosion_iterations=erosion_iterations,
            erosion_min_neighbors=erosion_min_neighbors,
            depth_scale=depth_scale,
            depth_max=depth_max,
            return_node_pixels=True,
        )
    )
    node_deformations = None
    if scene_flow is not None:
        # per-node 3D motion sampled at each node's SOURCE-VERTEX pixel
        # (reference vertex_pixels path) — reprojection+rounding can land on
        # masked/background scene-flow pixels near object boundaries
        node_deformations = scene_flow[
            node_pixels[:, 0], node_pixels[:, 1]
        ].astype(np.float32)
    return nodes, edges, edge_weights, clusters, anchors, weights, node_deformations


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("sequence_dir", help="DeepDeform-layout sequence directory")
    parser.add_argument("--node-coverage", type=float, default=0.05)
    parser.add_argument("--max-neighbor-count", type=int, default=8)
    parser.add_argument("--erosion-iterations", type=int, default=10)
    parser.add_argument("--erosion-min-neighbors", type=int, default=4)
    parser.add_argument("--depth-scale", type=float, default=1000.0)
    parser.add_argument("--depth-max", type=float, default=6.0)
    parser.add_argument(
        "--frames", type=int, nargs="*", default=None,
        help="frame indices to process (default: all)",
    )
    args = parser.parse_args(argv)

    seq_dir = Path(args.sequence_dir)
    depth_dir = seq_dir / "depth"
    mask_dir = seq_dir / "mask"
    intrinsics = load_intrinsics_txt(seq_dir / "intrinsics.txt")

    depth_paths = sorted(depth_dir.glob("*.png"))
    if args.frames is not None:
        depth_paths = [depth_paths[i] for i in args.frames]
    for depth_path in depth_paths:
        depth = _load_depth_png(depth_path)
        mask_path = mask_dir / depth_path.name
        mask = _load_depth_png(mask_path) if mask_path.is_file() else None
        try:
            nodes, edges, ew, clusters, anchors, weights, _ = process_frame(
                depth,
                intrinsics,
                args.node_coverage,
                mask=mask,
                max_neighbor_count=args.max_neighbor_count,
                erosion_iterations=args.erosion_iterations,
                erosion_min_neighbors=args.erosion_min_neighbors,
                depth_scale=args.depth_scale,
                depth_max=args.depth_max,
            )
        except ValueError as exc:
            print(f"{depth_path.name}: skipped ({exc})", file=sys.stderr)
            continue
        pair_name = depth_path.stem
        save_graph_data(
            seq_dir, pair_name, args.node_coverage,
            nodes, edges, ew, clusters, anchors, weights,
        )
        print(
            f"{depth_path.name}: {len(nodes)} nodes, "
            f"{int((edges >= 0).sum())} edges, "
            f"{int(np.all(anchors >= 0, axis=-1).sum())} fully-anchored pixels"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
