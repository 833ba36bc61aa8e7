"""Pallas TPU kernel for tiled triangle rasterization (phase 2).

The performance-critical half of the rasterizer (the reference's
per-pixel-per-bin CUDA loop, ``RasterizeNdcTrianglesCUDA.cuh:31-248``):
given per-tile face lists produced by the XLA binning phase, rasterize each
16 x 16 pixel tile against its faces and keep the nearest fragment per
pixel.

Kernel design (why it beats the XLA formulation):
  - face data is pre-gathered per (tile, slot) into an SoA layout
    ``[T, 16, K]`` (attribute-major, 16 sublane-aligned rows, K on the 128-lane axis) so the kernel
    has NO gathers — it streams dense VMEM blocks;
  - one grid step per tile; the bin axis is consumed in 128-lane chunks
    with a running (depth, face, barycentric, distance) minimum kept in
    VMEM scratch;
  - all [256-pixel x 128-face] intermediates tile exactly onto the (8, 128)
    f32 VPU layout;
  - per-pixel "gather at argmin" is a one-hot contraction (no dynamic lane
    indexing).

Only faces_per_pixel == 1 (the depth-buffer case — the fitter's and forward
renderer's hot path) runs here; K > 1 falls back to the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BG_DEPTH = 3.0e38
_CHUNK = 128
_P = 256  # pixels per 16x16 tile


def _make_kernel(tile_size: int, tw: int, perspective: bool, cull: bool, num_chunks: int):
    def kernel(
        data_ref,  # VMEM [1, 16, K] f32
        ids_ref,  # VMEM [1, 1, K] i32
        blur_ref,  # SMEM [1] f32
        face_out,  # VMEM [1, 1, P] i32
        depth_out,  # VMEM [1, 1, P] f32
        bary_out,  # VMEM [1, 3, P] f32
        dist_out,  # VMEM [1, 1, P] f32
    ):
        tile_idx = pl.program_id(0)
        blur = blur_ref[0]

        base_x = (tile_idx % tw) * tile_size
        base_y = (tile_idx // tw) * tile_size
        lin = jax.lax.broadcasted_iota(jnp.int32, (_P, 1), 0)
        px = (base_x + lin % tile_size).astype(jnp.float32)  # [P, 1]
        py = (base_y + lin // tile_size).astype(jnp.float32)

        def edge(px_, py_, ax_, ay_, bx_, by_):
            return (px_ - ax_) * (by_ - ay_) - (py_ - ay_) * (bx_ - ax_)

        def seg_d2(px_, py_, ax_, ay_, bx_, by_):
            dx = bx_ - ax_
            dy = by_ - ay_
            len2 = dx * dx + dy * dy
            t = jnp.clip(
                ((px_ - ax_) * dx + (py_ - ay_) * dy)
                / jnp.maximum(len2, 1e-12),
                0.0,
                1.0,
            )
            ex = ax_ + t * dx - px_
            ey = ay_ + t * dy - py_
            return ex * ex + ey * ey

        def chunk_body(c, state):
            best_d, best_f, best_b0, best_b1, best_b2, best_s = state
            sl = data_ref[0, :, pl.ds(c * _CHUNK, _CHUNK)]  # [12, CHUNK]
            ids = ids_ref[0, 0, pl.ds(c * _CHUNK, _CHUNK)]  # [CHUNK]
            ax = sl[0][None, :]
            ay = sl[1][None, :]
            az = sl[2][None, :]
            bx = sl[3][None, :]
            by = sl[4][None, :]
            bz = sl[5][None, :]
            cx = sl[6][None, :]
            cy = sl[7][None, :]
            cz = sl[8][None, :]

            area = edge(cx, cy, ax, ay, bx, by)  # [1, C]
            e0 = edge(px, py, bx, by, cx, cy)  # [P, C]
            e1 = edge(px, py, cx, cy, ax, ay)
            e2 = edge(px, py, ax, ay, bx, by)
            if cull:
                orientation_ok = area > 0
            else:
                orientation_ok = jnp.abs(area) > 1e-12
            safe_area = jnp.where(jnp.abs(area) > 1e-12, area, 1e-12)
            w0 = e0 / safe_area
            w1 = e1 / safe_area
            w2 = e2 / safe_area
            inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)

            d2e = jnp.minimum(
                jnp.minimum(
                    seg_d2(px, py, ax, ay, bx, by),
                    seg_d2(px, py, bx, by, cx, cy),
                ),
                seg_d2(px, py, cx, cy, ax, ay),
            )
            signed_d2 = jnp.where(inside, -d2e, d2e)
            hit = orientation_ok & (inside | (d2e <= blur * blur))

            if perspective:
                pa = w0 / jnp.maximum(az, 1e-9)
                pb = w1 / jnp.maximum(bz, 1e-9)
                pc = w2 / jnp.maximum(cz, 1e-9)
            else:
                pa, pb, pc = w0, w1, w2
            denom = pa + pb + pc
            denom = jnp.where(jnp.abs(denom) > 1e-12, denom, 1e-12)
            b0 = pa / denom
            b1 = pb / denom
            b2 = pc / denom
            depth = b0 * az + b1 * bz + b2 * cz
            hit = hit & (depth > 0) & (ids[None, :] >= 0)
            depth = jnp.where(hit, depth, BG_DEPTH)

            cand_d = jnp.min(depth, axis=1)  # [P]
            arg = jnp.argmin(depth, axis=1)  # [P]
            onehot = (
                jax.lax.broadcasted_iota(jnp.int32, (_P, _CHUNK), 1)
                == arg[:, None]
            )
            ohf = onehot.astype(jnp.float32)
            take = lambda v: jnp.sum(ohf * v, axis=1)
            cand_f = jnp.sum(jnp.where(onehot, ids[None, :], 0), axis=1)
            cand_b0 = take(b0)
            cand_b1 = take(b1)
            cand_b2 = take(b2)
            cand_s = take(signed_d2)

            better = cand_d < best_d
            return (
                jnp.where(better, cand_d, best_d),
                jnp.where(better, cand_f, best_f),
                jnp.where(better, cand_b0, best_b0),
                jnp.where(better, cand_b1, best_b1),
                jnp.where(better, cand_b2, best_b2),
                jnp.where(better, cand_s, best_s),
            )

        init = (
            jnp.full((_P,), BG_DEPTH, jnp.float32),
            jnp.full((_P,), -1, jnp.int32),
            jnp.zeros((_P,), jnp.float32),
            jnp.zeros((_P,), jnp.float32),
            jnp.zeros((_P,), jnp.float32),
            jnp.zeros((_P,), jnp.float32),
        )
        best_d, best_f, best_b0, best_b1, best_b2, best_s = jax.lax.fori_loop(
            0, num_chunks, chunk_body, init
        )

        empty = best_d >= BG_DEPTH
        face_out[0, 0, :] = jnp.where(empty, -1, best_f)
        depth_out[0, 0, :] = best_d
        bary_out[0, 0, :] = jnp.where(empty, 0.0, best_b0)
        bary_out[0, 1, :] = jnp.where(empty, 0.0, best_b1)
        bary_out[0, 2, :] = jnp.where(empty, 0.0, best_b2)
        dist_out[0, 0, :] = jnp.where(empty, 0.0, best_s)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "tile_size",
        "tw",
        "perspective_correct",
        "cull_back_faces",
        "interpret",
    ),
)
def rasterize_tiles_pallas(
    tile_face_data: jnp.ndarray,  # f32[T, 16, K] SoA face vertices per tile
    tile_face_ids: jnp.ndarray,  # int32[T, K]
    blur_radius,
    tile_size: int,
    tw: int,
    perspective_correct: bool = True,
    cull_back_faces: bool = False,
    interpret: bool = False,
):
    """-> (face i32[T, P], depth f32[T, P], bary f32[T, 3, P], d2 f32[T, P]);
    tile_size must be 16 (P = 256). ``interpret`` runs the kernel in pallas
    interpret mode (CPU-testable, mirroring the reference's CPU/CUDA paired
    tests)."""
    t, _, k = tile_face_data.shape
    if tile_size * tile_size != _P:
        raise ValueError("pallas rasterizer is specialized for 16x16 tiles")
    if k % _CHUNK:
        raise ValueError(f"bin capacity must be a multiple of {_CHUNK}")
    blur = jnp.asarray([blur_radius], jnp.float32)
    kernel = _make_kernel(
        tile_size, tw, perspective_correct, cull_back_faces, k // _CHUNK
    )

    face, depth, bary, dist = pl.pallas_call(
        kernel,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, 16, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, _P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, _P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t, 1, _P), jnp.int32),
            jax.ShapeDtypeStruct((t, 1, _P), jnp.float32),
            jax.ShapeDtypeStruct((t, 3, _P), jnp.float32),
            jax.ShapeDtypeStruct((t, 1, _P), jnp.float32),
        ),
        interpret=interpret,
    )(tile_face_data, tile_face_ids[:, None, :], blur)
    return face[:, 0], depth[:, 0], bary, dist[:, 0]
