"""Per-stage wall-clock + optional ``jax.profiler`` trace of the fusion
frame loop (VERDICT item: "no jax.profiler harness").

Usage:
  python benchmarks/profile_fusion.py [--frames 8] [--size 240 320]
      [--trace-dir /tmp/jax_trace]

Prints a per-stage table (odometry / fit / volume-update / mesh-refresh /
total) of warm frames on the default platform (the real TPU chip under the
deployment harness). With ``--trace-dir`` the warm frames also run inside
``jax.profiler.trace`` for TensorBoard/Perfetto inspection.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: F401  (platform + persistent compile cache config)
import numpy as np
import jax


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--frames", type=int, default=8)
    parser.add_argument("--size", type=int, nargs=2, default=(240, 320))
    parser.add_argument("--max-triangles", type=int, default=16384)
    parser.add_argument("--trace-dir", default=None)
    args = parser.parse_args()

    import dynamicfuion_python_tpu.apps.fusion_pipeline as fp
    from dynamicfuion_python_tpu.apps.fusion_pipeline import FusionPipeline
    from dynamicfuion_python_tpu.data.frame_sequence import (
        SyntheticBendingPlaneSequence,
    )
    from dynamicfuion_python_tpu.settings import Parameters
    from dynamicfuion_python_tpu.utils.config import apply_overrides

    params = apply_overrides(
        Parameters(),
        [
            f"fusion.extraction_max_triangles={args.max_triangles}",
            "alignment.use_rigid_alignment=true",
            "telemetry.print_runtime=false",
            # mirror bench.bench_fusion's configuration
            "tsdf.voxel_size=0.01",
            "tsdf.sdf_truncation_distance=0.04",
            "fusion.mesh_capacity_hint=8192",
            "tsdf.initial_block_count=512",
            "tsdf.max_active_blocks=256",
        ],
    )
    h, w = args.size
    seq = SyntheticBendingPlaneSequence(
        frame_count=args.frames, image_size=(h, w), focal=min(h, w) * 1.4
    )
    frames = list(seq)
    pipe = FusionPipeline(params, seq.intrinsics)
    t0 = time.perf_counter()
    pipe.initialize(frames[0].depth, frames[0].color)
    for f in frames[1:3]:
        pipe.process_frame(f.depth, f.color)
    print(
        f"init + 2 warm-up frames (compiles): {time.perf_counter()-t0:.1f}s",
        file=sys.stderr,
    )

    times: dict[str, list[float]] = {}

    def wrap(name, fn):
        def inner(*a, **k):
            t = time.perf_counter()
            out = jax.block_until_ready(fn(*a, **k))
            times.setdefault(name, []).append(time.perf_counter() - t)
            return out

        return inner

    fp.fit_to_image = wrap("fit", fp.fit_to_image)
    fp._volume_update_program = wrap("volume_update", fp._volume_update_program)
    orig_refresh = FusionPipeline._refresh_canonical_mesh

    def timed_refresh(self):
        t = time.perf_counter()
        orig_refresh(self)
        times.setdefault("mesh_refresh", []).append(time.perf_counter() - t)

    FusionPipeline._refresh_canonical_mesh = timed_refresh
    from dynamicfuion_python_tpu.ops import rigid_odometry as ro

    ro_orig = ro.rigid_odometry_multi_scale
    fp.rigid_odometry_multi_scale = wrap("odometry", ro_orig)
    ro.rigid_odometry_multi_scale = fp.rigid_odometry_multi_scale

    ctx = (
        jax.profiler.trace(args.trace_dir)
        if args.trace_dir
        else _null_context()
    )
    with ctx:
        for f in frames[3:]:
            t = time.perf_counter()
            pipe.process_frame(f.depth, f.color)
            times.setdefault("TOTAL", []).append(time.perf_counter() - t)

    n_warm = len(frames[3:])
    fps = n_warm / sum(times["TOTAL"])
    print(f"warm frames: {n_warm}; {fps:.2f} frames/s")
    for k, v in sorted(times.items(), key=lambda kv: -np.sum(kv[1])):
        per = " ".join(f"{1e3*x:.0f}" for x in v)
        print(
            f"{k:14s} n={len(v):2d} mean={1e3*np.mean(v):8.1f} ms  "
            f"sum={1e3*np.sum(v):8.1f} ms  per=[{per}]"
        )
    print(
        f"final mesh caps: v={pipe._mesh_v_cap} t={pipe._mesh_t_cap} "
        f"tris={pipe.canonical_triangle_count}"
    )
    if args.trace_dir:
        print(f"jax.profiler trace written to {args.trace_dir}")


class _null_context:
    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


if __name__ == "__main__":
    main()
