"""Amortized per-program timings of the fusion frame's device stages.

Times each jitted program in a 10-call loop with a single trailing
``block_until_ready`` so the remote-tunnel round trip amortizes away and
the number approximates pure device time (unlike profile_fusion.py, which
syncs per stage and therefore includes ~1 RTT per stage).

Usage: python benchmarks/profile_fit.py [--size 240 320]
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
import jax.numpy as jnp


def _amortized(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--size", type=int, nargs=2, default=(240, 320))
    args = parser.parse_args()
    size = tuple(args.size)

    from dynamicfuion_python_tpu.apps.fusion_pipeline import (
        FusionPipeline,
        _observed_points_program,
        _volume_update_program,
    )
    from dynamicfuion_python_tpu.data.frame_sequence import (
        SyntheticBendingPlaneSequence,
    )
    from dynamicfuion_python_tpu.models import fitter as F
    from dynamicfuion_python_tpu.models.voxel_block_grid import (
        extract_mesh_fitter_arrays,
    )
    from dynamicfuion_python_tpu.ops.normals import mesh_vertex_normals
    from dynamicfuion_python_tpu.ops.rasterize import (
        extract_face_vertices,
        rasterize_splat,
    )
    from dynamicfuion_python_tpu.ops.rigid_odometry import (
        rigid_odometry_multi_scale,
    )
    from dynamicfuion_python_tpu.settings import Parameters
    from dynamicfuion_python_tpu.utils.config import apply_overrides

    params = apply_overrides(
        Parameters(),
        [
            "fusion.extraction_max_triangles=16384",
            "alignment.use_rigid_alignment=true",
            "telemetry.print_runtime=false",
            "tsdf.voxel_size=0.01",
            "tsdf.sdf_truncation_distance=0.04",
            "fusion.mesh_capacity_hint=8192",
            "tsdf.initial_block_count=512",
            "tsdf.max_active_blocks=256",
        ],
    )
    seq = SyntheticBendingPlaneSequence(
        frame_count=4, image_size=size, focal=min(size) * 1.4
    )
    frames = list(seq)
    pipe = FusionPipeline(params, seq.intrinsics)
    pipe.initialize(frames[0].depth, frames[0].color)
    pipe.process_frame(frames[1].depth, frames[1].color)  # warm state
    p = params

    depth_j = jnp.asarray(frames[2].depth)
    field = pipe.warp_field
    cv, ct = pipe.canonical_vertices, pipe.canonical_triangles
    intr = pipe.intrinsics
    cfg = pipe.fitter_config
    max_deg = F._max_wing_degree(field)
    points, mask = _observed_points_program(
        depth_j, intr, pipe.extrinsics, p.fusion.depth_scale,
        p.fusion.far_clip_distance, True,
    )

    rows = {}

    rows["odometry"] = _amortized(
        lambda: rigid_odometry_multi_scale(
            depth_j, depth_j, intr,
            depth_scale=p.fusion.depth_scale,
            depth_max=p.fusion.far_clip_distance,
        )
    )
    rows["observed_points"] = _amortized(
        lambda: _observed_points_program(
            depth_j, intr, pipe.extrinsics, p.fusion.depth_scale,
            p.fusion.far_clip_distance, True,
        )
    )

    fit = jax.jit(F._fit_program, static_argnames=("config", "max_deg"))
    rows["fit_6iter"] = _amortized(
        lambda: fit(field, cv, ct, points, mask, intr, config=cfg, max_deg=max_deg)
    )

    cfg1 = cfg.replace(max_iterations=1)
    rows["fit_1iter"] = _amortized(
        lambda: fit(field, cv, ct, points, mask, intr, config=cfg1, max_deg=max_deg)
    )

    pre = F.precompute_face_associations(field, cv, ct)
    rows["anchor_precompute"] = _amortized(
        lambda: F.precompute_face_associations(field, cv, ct)
    )

    cn = mesh_vertex_normals(cv, ct)
    h, w = mask.shape

    @jax.jit
    def raster_once(cvx):
        pos_v = field.virtual_positions()
        wv = F._warp_vertices(
            cvx, pos_v, field.virtual_rotations(),
            field.virtual_translations(), pre.anchors, pre.weights,
        )
        fv, valid_faces = extract_face_vertices(
            wv, ct, intr, (h, w), near=1e-3, far=cfg.max_depth
        )
        return rasterize_splat(
            fv, valid_faces, (h, w), faces_per_pixel=1,
            perspective_correct=True, cull_back_faces=False,
        )

    frag = raster_once(cv)
    rows["warp+raster"] = _amortized(raster_once, cv)

    ff = frag.face_indices[..., 0]

    @jax.jit
    def data_term_once():
        return F._data_term_fast(
            field.virtual_positions(), field.virtual_rotations(),
            field.virtual_translations(), cv, cn, ct, pre, ff,
            points, mask, intr, cfg, field.num_nodes,
        )

    rows["data_term"] = _amortized(data_term_once)

    ext = pipe.extrinsics
    rows["volume_update"] = _amortized(
        lambda: _volume_update_program(
            pipe.volume, field, depth_j, depth_j, intr, ext,
            jnp.bool_(True), min(p.tsdf.max_active_blocks, pipe.volume.capacity),
            False, p.fusion.depth_scale, p.fusion.far_clip_distance,
        )
    )
    t_max = 16384
    from dynamicfuion_python_tpu.apps.fusion_pipeline import _capacity_bucket

    t_cap = _capacity_bucket(t_max)
    v_cap = _capacity_bucket(t_cap * 3 // 2 + 2)
    thr = pipe._extraction_weight_threshold()
    rows["mesh_extract"] = _amortized(
        lambda: extract_mesh_fitter_arrays(pipe.volume, v_cap, t_cap, thr)
    )

    for k, v in rows.items():
        print(f"{k:18s} {v:8.2f} ms")


if __name__ == "__main__":
    main()
