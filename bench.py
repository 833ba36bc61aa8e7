"""Benchmark harness: prints ONE JSON line for the driver.

Headline metric: the block-sparse arrowhead (Schur-complement) solve on the
reference's published 1500x1500 system (250 6x6 blocks, arrow base 208 —
``cpp/tests/test_block_sparse_arrowhead_solver.cpp:34``). Reference CUDA
budget: 2.5 ms (README.md:31). ``vs_baseline`` = baseline_ms / ours_ms
(>1 = faster than the reference).

The JSON line's "extras" object carries the other two north-star headlines:
  - raster_4m45_ms: the 64-object 4.45M-triangle rasterization at 480x640
    (reference CUDA budget < 77 ms, README.md:21-23);
  - fusion_fps: warm frames/sec of the full synthetic-sequence fusion loop
    at 240x320 (rigid odometry + 6-iteration GN fit + block discovery +
    non-rigid integrate + welded mesh extraction) on one chip.
All numbers also print to stderr with their budgets. BENCH.md records the
narrative. Set BENCH_SKIP_FUSION=1 / BENCH_SKIP_RASTER=1 to skip the slow
compiles.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _configure_platforms():
    """Keep the TPU default but make a host CPU backend available so that
    setup/preprocessing ops don't each pay a remote-TPU compile round trip
    (the deployment harness pins JAX_PLATFORMS to the TPU plugin only)."""
    import os

    import jax

    platforms = os.environ.get("JAX_PLATFORMS", "")
    if platforms and "cpu" not in platforms:
        try:
            jax.config.update("jax_platforms", platforms + ",cpu")
        except Exception:
            pass
    # persistent compilation cache: the fusion/rasterizer programs take
    # minutes to compile over the remote-TPU tunnel; cache them across runs
    try:
        jax.config.update(
            "jax_compilation_cache_dir", "/root/repo/.jax_cache"
        )
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass


_configure_platforms()


def _time(fn, *args, warmup=2, iters=10):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def bench_arrowhead():
    import jax
    import jax.numpy as jnp

    from dynamicfuion_python_tpu.ops.linalg import (
        BlockSparseArrowheadMatrix,
        solve_block_sparse_arrowhead,
    )

    rng = np.random.default_rng(7)
    n0, nc, b, k = 208, 42, 6, 4
    diag = rng.normal(size=(n0, b, b)).astype(np.float32)
    diag = diag @ diag.transpose(0, 2, 1) + 8 * np.eye(b, dtype=np.float32)
    wing = 0.3 * rng.normal(size=(n0, k, b, b)).astype(np.float32)
    cols = np.full((n0, k), -1, np.int32)
    for i in range(n0):
        d = rng.integers(1, k + 1)
        cols[i, :d] = rng.choice(nc, size=d, replace=False)
    wing[cols < 0] = 0
    corner = rng.normal(size=(nc * b, nc * b)).astype(np.float32)
    corner = corner @ corner.T + 8 * n0 / nc * np.eye(nc * b, dtype=np.float32)
    mat = BlockSparseArrowheadMatrix(
        jnp.asarray(diag), jnp.asarray(wing), jnp.asarray(cols), jnp.asarray(corner)
    )
    rhs = jnp.asarray(rng.normal(size=((n0 + nc) * b,)).astype(np.float32))
    solver = jax.jit(solve_block_sparse_arrowhead)
    dt = _time(solver, mat, rhs, iters=50)
    return dt * 1e3


def bench_raster():
    sys.path.insert(0, "benchmarks")
    from bench_rasterizer import run as raster_run

    dt_ms, covered = raster_run(iters=10)
    return dt_ms


def bench_raster_indexed():
    """The reference's 64-bunny timing starts from an INDEXED mesh
    (``cpp/tests/test_rasterize.cpp:362-373``); the soup fast path is
    legitimate for the fusion pipeline (extraction emits soup) but the
    apples-to-apples comparison includes the face-vertex expansion."""
    sys.path.insert(0, "benchmarks")
    from bench_rasterizer import run as raster_run

    dt_ms, _ = raster_run(iters=10, method="splat-indexed")
    return dt_ms


def bench_fusion(
    frames=30,
    size=(240, 320),
    max_triangles=16384,
    warmup=5,
    extra_overrides=(),
):
    import jax

    from dynamicfuion_python_tpu.apps.fusion_pipeline import (
        FusionPipeline,
        resolve_frame_metrics,
    )
    from dynamicfuion_python_tpu.data.frame_sequence import (
        SyntheticBendingPlaneSequence,
    )
    from dynamicfuion_python_tpu.settings import Parameters
    from dynamicfuion_python_tpu.utils.config import apply_overrides

    params = apply_overrides(
        Parameters(),
        [
            f"fusion.extraction_max_triangles={max_triangles}",
            "alignment.use_rigid_alignment=true",
            "telemetry.print_runtime=false",
            # 1 cm voxels for the 240x320 sensor (the 4 mm default is sized
            # for 640x480 close-range capture and over-tessellates this
            # scene ~6x past the fitter's needs)
            "tsdf.voxel_size=0.01",
            "tsdf.sdf_truncation_distance=0.04",
            # pre-size the mesh capacity buckets: compile once, never grow
            "fusion.mesh_capacity_hint=8192",
            "tsdf.initial_block_count=512",
            "tsdf.max_active_blocks=256",
            # streaming mode: metrics stay on device; the loop never blocks
            # on the tunnel and frames pipeline (transfer overlaps compute)
            "fusion.sync_frame_metrics=false",
            # coarse-to-fine GN (the reference fitter is coarse-to-fine):
            # first 4 of 6 iterations fit a 2x-strided frame — the data
            # term's per-pixel stages cost ~1/4 there, and the convergence
            # while_loop still polishes at full resolution (+21% fps A/B)
            "alignment.coarse_iteration_count=4",
            *extra_overrides,
        ],
    )
    seq = SyntheticBendingPlaneSequence(
        frame_count=frames, image_size=size, focal=min(size) * 1.4
    )
    frames_list = list(seq)
    pipe = FusionPipeline(params, seq.intrinsics)
    pipe.initialize(frames_list[0].depth, frames_list[0].color)
    # warm-up frames compile the fit/integrate/extract programs
    for f in frames_list[1 : 1 + warmup]:
        resolve_frame_metrics(pipe.process_frame(f.depth, f.color))
    t0 = time.perf_counter()
    timed = frames_list[1 + warmup :]
    for f in timed:
        metrics = pipe.process_frame(f.depth, f.color)
    # resolving the final frame's metrics (and the last extraction's counts)
    # drains the device queue, so the window covers every dispatched frame
    resolve_frame_metrics(metrics)
    if pipe._pending_counts is not None:
        jax.device_get(pipe._pending_counts)
    dt = time.perf_counter() - t0
    return len(timed) / dt


def bench_fit_step():
    import jax

    from __graft_entry__ import entry

    # build the problem on host CPU (graph build / anchor precompute are
    # many small programs — remote-compiling each is pure overhead)
    with jax.default_device(jax.devices("cpu")[0]):
        fn, args = entry()
        args = jax.block_until_ready(args)
    jfn = jax.jit(fn)
    dt = _time(jfn, *args, iters=5)
    return dt * 1e3


def main():
    import os

    results = {}
    t0 = time.time()
    results["arrowhead_solve_1500_ms"] = bench_arrowhead()
    print(
        f"arrowhead 1500x1500: {results['arrowhead_solve_1500_ms']:.3f} ms "
        f"(CUDA ref budget 2.5 ms)",
        file=sys.stderr,
    )
    extras = {}
    if not os.environ.get("BENCH_SKIP_RASTER"):
        try:
            extras["raster_4m45_ms"] = round(bench_raster(), 2)
            print(
                f"rasterizer 4.45M tris 480x640: {extras['raster_4m45_ms']:.1f} ms "
                f"(CUDA ref budget 77 ms, vs_baseline "
                f"{77.0 / extras['raster_4m45_ms']:.2f})",
                file=sys.stderr,
            )
        except Exception as exc:
            print(f"raster bench failed: {exc}", file=sys.stderr)
        try:
            extras["raster_4m45_indexed_ms"] = round(bench_raster_indexed(), 2)
            print(
                f"rasterizer (indexed mesh) 4.45M tris: "
                f"{extras['raster_4m45_indexed_ms']:.1f} ms",
                file=sys.stderr,
            )
        except Exception as exc:
            print(f"indexed raster bench failed: {exc}", file=sys.stderr)
    if not os.environ.get("BENCH_SKIP_FUSION"):
        try:
            extras["fusion_fps"] = round(bench_fusion(), 3)
            print(
                f"fusion (240x320 synthetic, warm): {extras['fusion_fps']:.2f} "
                f"frames/s (north-star target 30 fps)",
                file=sys.stderr,
            )
        except Exception as exc:
            print(f"fusion bench failed: {exc}", file=sys.stderr)
    print(f"total bench time: {time.time()-t0:.0f}s", file=sys.stderr)

    headline = results["arrowhead_solve_1500_ms"]
    line = {
        "metric": "arrowhead_solve_1500x1500",
        "value": round(headline, 4),
        "unit": "ms",
        "vs_baseline": round(2.5 / headline, 2),
    }
    if extras:
        line["extras"] = extras
    _write_bench_md(line)
    print(json.dumps(line))


def _write_bench_md(line):
    try:
        from pathlib import Path

        extras = line.get("extras", {})
        rows = [
            "# BENCH narrative (written by bench.py on the real TPU chip)",
            "",
            "| metric | ours | reference budget | vs_baseline |",
            "|---|---|---|---|",
            f"| arrowhead solve 1500x1500 | {line['value']} ms | 2.5 ms "
            f"(README.md:31) | {line['vs_baseline']}x |",
        ]
        if "raster_4m45_ms" in extras:
            rows.append(
                f"| rasterize 4.45M tris @480x640 (soup) | {extras['raster_4m45_ms']} ms "
                f"| 77 ms (README.md:21-23) | "
                f"{round(77.0 / extras['raster_4m45_ms'], 2)}x |"
            )
        if "raster_4m45_indexed_ms" in extras:
            rows.append(
                f"| rasterize 4.45M tris @480x640 (indexed mesh, reference "
                f"test config) | {extras['raster_4m45_indexed_ms']} ms "
                f"| 77 ms | "
                f"{round(77.0 / extras['raster_4m45_indexed_ms'], 2)}x |"
            )
        if "fusion_fps" in extras:
            rows.append(
                f"| fusion frames/s (240x320 synthetic, 1 chip, warm) | "
                f"{extras['fusion_fps']} fps | 30 fps north-star target "
                f"(BASELINE.md) | {round(extras['fusion_fps'] / 30.0, 3)}x |"
            )
        rows += [
            "",
            "fusion_fps provenance: BENCH_r04's 10.62 fps was measured "
            "with the round-4 valid-solve guard zeroing most solves — the "
            "tracker froze after ~4 frames (loss blew up to 7.7, every "
            "later solve invalid) and the convergence while_loop exited "
            "after one no-op iteration per frame, so most of the timed "
            "window did no fitting. Round 5's guard fix restored real "
            "6-iteration fits on every frame (losses now decrease "
            "monotonically across the sequence); the honest per-frame "
            "cost is higher, partially recovered by the coarse-to-fine "
            "schedule.",
        ]
        # preserve hand-/harness-appended sections (e.g. the real-sequence
        # accuracy table from benchmarks/real_sequence_eval.py --record)
        # below the generated narrative
        path = Path("BENCH.md")
        tail = ""
        if path.exists():
            old = path.read_text()
            idx = old.find("\n## ")
            if idx >= 0:
                tail = old[idx:]
        path.write_text("\n".join(rows) + "\n" + tail)
    except Exception:
        pass


if __name__ == "__main__":
    main()
