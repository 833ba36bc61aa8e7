"""Stage-by-stage timing of the 4.45M-triangle rasterizer on the real TPU.

Splits rasterize_binned into its phases (AABB/tier math, pair sort, bin
table gather, SoA layout, pallas tile kernel) to locate the time.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp
import numpy as np

from bench_rasterizer import build_scene
from dynamicfuion_python_tpu.ops.rasterize import extract_face_vertices


def timeit(name, fn, *args, iters=5):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:35s} {dt:9.2f} ms", file=sys.stderr)
    return out


def main():
    h, w = 480, 640
    tile_size = 16
    max_faces_per_bin = 1024
    th, tw = h // tile_size, w // tile_size
    num_tiles = th * tw
    intr = jnp.asarray(
        [[580.0, 0, w / 2], [0, 580.0, h / 2], [0, 0, 1]], jnp.float32
    )
    verts_np, faces_np = build_scene()
    verts = jnp.asarray(verts_np)
    faces = jnp.asarray(faces_np)
    f = faces.shape[0]
    print(f"faces: {f:,}", file=sys.stderr)

    fv, valid = timeit(
        "extract_face_vertices", jax.jit(
            lambda v: extract_face_vertices(v, faces, intr, (h, w))
        ), verts
    )

    @jax.jit
    def tiers(fv, valid):
        fv9 = fv.reshape(f, 9)
        us = (fv9[:, 0], fv9[:, 3], fv9[:, 6])
        vs = (fv9[:, 1], fv9[:, 4], fv9[:, 7])
        u_min = jnp.minimum(jnp.minimum(us[0], us[1]), us[2])
        u_max = jnp.maximum(jnp.maximum(us[0], us[1]), us[2])
        v_min = jnp.minimum(jnp.minimum(vs[0], vs[1]), vs[2])
        v_max = jnp.maximum(jnp.maximum(vs[0], vs[1]), vs[2])
        u0 = jnp.clip(u_min / tile_size, 0, tw - 1).astype(jnp.int32)
        u1 = jnp.clip(u_max / tile_size, 0, tw - 1).astype(jnp.int32)
        v0 = jnp.clip(v_min / tile_size, 0, th - 1).astype(jnp.int32)
        v1 = jnp.clip(v_max / tile_size, 0, th - 1).astype(jnp.int32)
        on = valid & (u_max >= 0) & (u_min < w) & (v_max >= 0) & (v_min < h)
        return u0, u1, v0, v1, on

    u0, u1, v0, v1, on = timeit("AABB/tier math", tiers, fv, valid)

    face_ids = jnp.arange(f, dtype=jnp.int32)

    @jax.jit
    def build_pairs(u0, u1, v0, v1, on):
        tiles = []
        oks = []
        for cu, cv, distinct in (
            (u0, v0, None), (u1, v0, "u"), (u0, v1, "v"), (u1, v1, "uv"),
        ):
            ok = on
            if distinct in ("u", "uv"):
                ok = ok & (u1 > u0)
            if distinct in ("v", "uv"):
                ok = ok & (v1 > v0)
            tiles.append(cv * tw + cu)
            oks.append(ok)
        tile_all = jnp.concatenate(tiles)
        face_all = jnp.concatenate([face_ids] * 4)
        ok_all = jnp.concatenate(oks)
        return jnp.where(ok_all, tile_all, num_tiles), face_all

    keys, vals = timeit("pair build (4F)", build_pairs, u0, u1, v0, v1, on)
    print(f"pairs: {keys.shape[0]:,}", file=sys.stderr)

    @jax.jit
    def argsort_pairs(keys, vals):
        order = jnp.argsort(keys, stable=True)
        return keys[order], vals[order]

    @jax.jit
    def laxsort_pairs(keys, vals):
        return jax.lax.sort((keys, vals), num_keys=1, is_stable=False)

    timeit("argsort+2 gathers (old)", argsort_pairs, keys, vals)
    sk, sf = timeit("lax.sort 2-operand", laxsort_pairs, keys, vals)

    @jax.jit
    def bin_table(sorted_tiles, sorted_faces):
        starts = jnp.searchsorted(
            sorted_tiles, jnp.arange(num_tiles + 1, dtype=sorted_tiles.dtype),
            side="left",
        )
        take = starts[:num_tiles, None] + jnp.arange(max_faces_per_bin)[None]
        within = take < starts[1: num_tiles + 1, None]
        return jnp.where(
            within, sorted_faces[jnp.minimum(take, sorted_faces.shape[0] - 1)], -1
        )

    table = timeit("bin table gather", bin_table, sk, sf)

    fv_safe = jnp.where(valid[:, None, None], fv, -1e9)

    @jax.jit
    def soa_layout(table, fv_safe):
        k_pad = (max_faces_per_bin + 127) // 128 * 128
        gathered = fv_safe[jnp.maximum(table, 0)]
        soa = jnp.zeros((num_tiles, 16, k_pad), jnp.float32)
        soa = soa.at[:, :9, :].set(
            gathered.reshape(num_tiles, k_pad, 9).transpose(0, 2, 1)
        )
        return soa

    soa = timeit("SoA gather+layout", soa_layout, table, fv_safe)

    from dynamicfuion_python_tpu.ops.pallas.rasterize_tiles import (
        rasterize_tiles_pallas,
    )

    @jax.jit
    def phase2(soa, table):
        return rasterize_tiles_pallas(
            soa, table, 0.0, tile_size, tw,
            perspective_correct=True, cull_back_faces=False,
        )

    timeit("pallas phase 2", phase2, soa, table)


if __name__ == "__main__":
    main()
