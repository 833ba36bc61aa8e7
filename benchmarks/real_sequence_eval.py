"""Fuse a REAL RGB-D sequence pair and measure reconstruction accuracy
(VERDICT r4 item 2: the pipeline had only ever seen synthetic data).

The mounted reference data (``/root/reference/example_data``) ships real
DeepDeform captures — depth + color + (for test/seq017) PRECOMPUTED graph
blobs — but only the two frames of each alignment pair (e.g. seq017 has
exactly 000300.png and 000600.png). A 30+-frame run therefore needs the full
DeepDeform download; this harness fuses what is actually mounted and reports
honest per-frame metrics:

  - data_loss per GN iteration, valid-solve flags;
  - reconstruction error: the warped canonical mesh is rendered back into
    the current camera and its depth compared against the OBSERVED depth
    (median / p95 over pixels where both are valid) — the per-frame
    warped-mesh-vs-depth error the north star asks for.

Usage:
  python benchmarks/real_sequence_eval.py [--seq /root/reference/example_data/test/seq017]
      [--downscale 2] [--voxel 0.01] [--out REALSEQ.json] [--platform cpu]

Prints one JSON line per sequence and appends a table to BENCH.md when
``--record`` is given.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def downscale_frame(depth: np.ndarray, color, factor: int):
    if factor <= 1:
        return depth, color
    h, w = depth.shape
    hp, wp = h // factor * factor, w // factor * factor
    d = depth[:hp, :wp].reshape(
        hp // factor, factor, wp // factor, factor
    )
    # min-pool ignoring zeros (invalid): preserves thin structures' validity
    big = np.where(d > 0, d.astype(np.float32), np.inf)
    pooled = big.min(axis=(1, 3))
    depth_s = np.where(np.isfinite(pooled), pooled, 0).astype(depth.dtype)
    color_s = None
    if color is not None:
        color_s = color[:hp:factor, :wp:factor]
    return depth_s, color_s


def evaluate_sequence(
    seq_dir: str,
    downscale: int = 2,
    voxel: float = 0.01,
    max_triangles: int = 16384,
    far_clip: float = 2.4,
):
    import jax
    import jax.numpy as jnp

    from dynamicfuion_python_tpu.apps.fusion_pipeline import (
        FusionPipeline,
        resolve_frame_metrics,
    )
    from dynamicfuion_python_tpu.data.frame_sequence import (
        FrameSequenceDataset,
    )
    from dynamicfuion_python_tpu.models.renderer import MeshRenderer
    from dynamicfuion_python_tpu.settings import Parameters
    from dynamicfuion_python_tpu.utils.config import apply_overrides

    # use the shipped subject masks when the sequence has them (the
    # reference's frame loader applies them before fusion,
    # data/frame.py mask_image_path) — background surfaces otherwise feed
    # occlusion-mismatched associations to the fitter
    seq = FrameSequenceDataset(
        seq_dir, far_clip_mm=int(far_clip * 1000), use_mask=True
    )
    frames = list(seq)
    graph = seq.get_frame_graph(0)
    mode = (
        "FIRST_FRAME_LOADED_GRAPH" if graph is not None
        else "FIRST_FRAME_DEPTH_IMAGE"
    )
    params = apply_overrides(
        Parameters(),
        [
            f"fusion.graph_generation_mode={mode}",
            f"fusion.far_clip_distance={far_clip}",
            f"fusion.extraction_max_triangles={max_triangles}",
            f"tsdf.voxel_size={voxel}",
            f"tsdf.sdf_truncation_distance={4 * voxel}",
            "tsdf.initial_block_count=2048",
            "tsdf.max_active_blocks=1024",
            "fusion.mesh_capacity_hint=16384",
            "alignment.use_rigid_alignment=true",
            "telemetry.print_runtime=false",
            # the mounted pairs are 100-300 capture-frames apart (~0.3 m of
            # deformation) — allow large per-iteration motion, warm up with
            # a translation-only pass, and give GN a real budget; a live
            # 30 fps stream would use the defaults instead
            "alignment.max_iteration_count=16",
            "alignment.iteration_modes=translation_only,all",
            "alignment.valid_solve_translation_limit=0.5",
            "alignment.use_tukey_penalty=true",
            "alignment.tukey_penalty_cutoff=0.05",
        ],
    )
    intr = np.array(seq.intrinsics, np.float32)
    d0, c0 = downscale_frame(frames[0].depth, frames[0].color, downscale)
    if downscale > 1:
        intr = intr.copy()
        intr[:2] /= downscale

    pipe = FusionPipeline(params, intr)
    t0 = time.perf_counter()
    pipe.initialize(d0, c0, frame_graph=graph)
    init_s = time.perf_counter() - t0
    renderer = MeshRenderer(d0.shape, jnp.asarray(intr))

    def depth_error(depth_obs_mm):
        """Render the warped canonical mesh; compare depth vs observation."""
        warped = pipe.warp_field.warp_points(pipe.canonical_vertices)
        _, depth_r = renderer.render_mesh(warped, pipe.canonical_triangles)
        d_r = np.asarray(depth_r)
        d_o = depth_obs_mm.astype(np.float32) / 1000.0
        both = (d_r > 0) & (d_o > 0)
        if both.sum() == 0:
            return dict(median_m=float("nan"), p95_m=float("nan"), pixels=0)
        err = np.abs(d_r[both] - d_o[both])
        return dict(
            median_m=float(np.median(err)),
            p95_m=float(np.percentile(err, 95)),
            pixels=int(both.sum()),
        )

    def pair_flow(src_frame, dst_frame):
        """Ground-truth optical flow shipped with train pairs (plays the
        trained DeformNet's role — its weights are NOT shipped with the
        reference, ``nn_data/models/model_A`` is a marker file)."""
        from dynamicfuion_python_tpu.data import io as blob_io

        flow_dir = Path(seq_dir) / "optical_flow"
        if not flow_dir.is_dir():
            return None
        src = Path(seq.depth_paths[src_frame]).stem
        dst = Path(seq.depth_paths[dst_frame]).stem
        for path in flow_dir.glob("*.oflow"):
            if src in path.stem and dst in path.stem:
                flow = blob_io.load_flow_binary(path)  # [2, H, W]
                flow = np.transpose(flow, (1, 2, 0))  # [H, W, 2]
                if downscale > 1:
                    flow = flow[::downscale, ::downscale] / downscale
                return flow
        return None

    per_frame = [dict(frame=frames[0].index, **depth_error(d0))]
    fps_window = 0.0
    for f in frames[1:]:
        d, c = downscale_frame(f.depth, f.color, downscale)
        flow = pair_flow(0, f.index)
        t0 = time.perf_counter()
        metrics = resolve_frame_metrics(
            pipe.process_frame(d, c, prior_flow=flow)
        )
        fps_window += time.perf_counter() - t0
        row = dict(
            frame=f.index,
            used_gt_flow_prior=flow is not None,
            data_loss_first=metrics["data_loss"][0],
            data_loss_final=metrics["data_loss"][-1],
            valid_solve=metrics["valid_solve"],
            **depth_error(d),
        )
        if "prior_valid" in metrics:
            row["prior_valid"] = bool(metrics["prior_valid"])
            row["prior_matches"] = int(metrics.get("prior_matches", 0))
        per_frame.append(row)
    n_nodes = pipe.warp_field.num_nodes
    result = dict(
        sequence=str(seq_dir),
        frames=len(frames),
        graph_mode=mode,
        nodes=int(n_nodes),
        image=list(d0.shape),
        voxel=voxel,
        init_s=round(init_s, 1),
        fusion_s=round(fps_window, 2),
        per_frame=per_frame,
        # fraction of valid GN iterations over the whole run (the reference
        # counts per-solve validity, point_cloud_alignment_optimizer.py:219;
        # a frame-level all() would zero on one benign escalated iteration)
        valid_ratio=float(
            np.mean(
                [
                    np.mean(r["valid_solve"])
                    for r in per_frame
                    if "valid_solve" in r
                ]
            )
            if len(per_frame) > 1
            else 1.0
        ),
    )
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--seq",
        nargs="+",
        default=[
            "/root/reference/example_data/test/seq017",
            "/root/reference/example_data/train/seq258",
        ],
    )
    ap.add_argument("--downscale", type=int, default=2)
    ap.add_argument("--voxel", type=float, default=0.01)
    ap.add_argument("--max-triangles", type=int, default=16384)
    ap.add_argument("--out", default="REALSEQ.json")
    ap.add_argument("--record", action="store_true")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import bench  # noqa: F401  (compile cache + cpu helper platform)

    results = []
    for seq_dir in args.seq:
        res = evaluate_sequence(
            seq_dir,
            downscale=args.downscale,
            voxel=args.voxel,
            max_triangles=args.max_triangles,
        )
        print(json.dumps(res))
        results.append(res)
    Path(args.out).write_text(json.dumps(results, indent=1))
    if args.record:
        lines = [
            "",
            "## Real-sequence fusion (benchmarks/real_sequence_eval.py)",
            "",
            "The mounted reference data ships 2-frame real pairs"
            " (full DeepDeform not available in this image).",
            "",
            "| sequence | frames | nodes | valid | depth err median / p95 (m) |",
            "|---|---|---|---|---|",
        ]
        for r in results:
            last = r["per_frame"][-1]
            lines.append(
                f"| {Path(r['sequence']).name} | {r['frames']} |"
                f" {r['nodes']} | {r['valid_ratio']:.2f} |"
                f" {last['median_m']:.4f} / {last['p95_m']:.4f} |"
            )
        with open("BENCH.md", "a") as fh:
            fh.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
