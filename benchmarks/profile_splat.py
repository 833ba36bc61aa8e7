"""Stage-by-stage timing of the (current) splat rasterizer on the real TPU."""

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
from dynamicfuion_python_tpu.ops import rasterize as R


def timeit(name, fn, *args, iters=5):
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:38s} {dt:9.2f} ms   (compile {compile_s:.1f}s)", file=sys.stderr)
    return out


def main():
    h, w = 480, 640
    hw = h * w
    intr = jnp.asarray(
        [[580.0, 0, w / 2], [0, 580.0, h / 2], [0, 0, 1]], jnp.float32
    )
    verts_np, faces_np = build_scene()
    soup = jnp.asarray(verts_np[faces_np])
    f = faces_np.shape[0]
    quad_cap = max(4096, f // 16)
    hex_cap = max(4096, f // 64)
    print(f"faces {f:,} quad_cap {quad_cap:,} hex_cap {hex_cap:,}", file=sys.stderr)

    fv, valid = timeit(
        "project_face_soup",
        jax.jit(lambda s: R.project_face_soup(s, intr)),
        soup,
    )

    @jax.jit
    def tiers(fv, valid):
        fv9 = fv.reshape(f, 9)
        cols = tuple(fv9[:, i] for i in range(9))
        us = (cols[0], cols[3], cols[6])
        vs = (cols[1], cols[4], cols[7])
        u_min = jnp.minimum(jnp.minimum(us[0], us[1]), us[2])
        u_max = jnp.maximum(jnp.maximum(us[0], us[1]), us[2])
        v_min = jnp.minimum(jnp.minimum(vs[0], vs[1]), vs[2])
        v_max = jnp.maximum(jnp.maximum(vs[0], vs[1]), vs[2])
        on = valid & (u_max >= 0) & (u_min < w - 1) & (v_max >= 0) & (v_min < h - 1)
        span_u = u_max - u_min
        span_v = v_max - v_min
        cu0 = jnp.ceil(u_min).astype(jnp.int32)
        cv0 = jnp.ceil(v_min).astype(jnp.int32)
        tier1 = on & (span_u < 1) & (span_v < 1)
        tier2 = on & ~tier1 & (span_u < 2) & (span_v < 2)
        tier4 = on & ~tier1 & ~tier2 & (span_u < 4) & (span_v < 4)
        return cu0, cv0, tier1, tier2, tier4

    cu0, cv0, t1, t2, t4 = timeit("AABB + tiers", tiers, fv, valid)
    print(
        f"tier counts: t1={int(t1.sum()):,} t2={int(t2.sum()):,} "
        f"t4={int(t4.sum()):,}",
        file=sys.stderr,
    )

    fv9 = fv.reshape(f, 9)
    face_ids = jnp.arange(f, dtype=jnp.int32)

    @jax.jit
    def cls_sort(t2, t4):
        cls_key = jnp.where(
            t2, face_ids, jnp.where(t4, f + face_ids, jnp.int32(2 * f))
        )
        return jax.lax.sort(cls_key, is_stable=False), jnp.sum(t2)

    cls_sorted, n2 = timeit("class sort (1-op 4.47M)", cls_sort, t2, t4)

    @jax.jit
    def slice_gather(cls_sorted):
        ent = jax.lax.dynamic_slice(cls_sorted, (0,), (quad_cap,))
        has = ent < f
        idx = jnp.where(has, ent, 0)
        rows = fv9[idx]
        return rows, idx, has

    q_rows, q_idx, q_has = timeit("tier2 slice + row gather", slice_gather, cls_sorted)

    @jax.jit
    def emit1(fv9, cu0, cv0, t1):
        cols = tuple(fv9[:, i] for i in range(9))
        hit, depth, _, _ = R._eval_columns(
            cu0.astype(jnp.float32), cv0.astype(jnp.float32), cols,
            0.0, True, False, False,
        )
        ok = t1 & hit & (cu0 >= 0) & (cu0 < w) & (cv0 >= 0) & (cv0 < h)
        pix = jnp.where(ok, cv0 * w + cu0, hw + 1)
        dbits = jax.lax.bitcast_convert_type(
            jnp.where(ok, jnp.maximum(depth, 0.0), 0.0), jnp.int32
        )
        return pix, dbits, face_ids

    p1, d1, f1 = timeit("emit tier1 (4.45M evals)", emit1, fv9, cu0, cv0, t1)

    @jax.jit
    def emit2(q_rows, q_idx, q_has):
        cols = tuple(q_rows[:, i] for i in range(9))
        gu_min = jnp.minimum(jnp.minimum(cols[0], cols[3]), cols[6])
        gv_min = jnp.minimum(jnp.minimum(cols[1], cols[4]), cols[7])
        cu = jnp.ceil(gu_min).astype(jnp.int32)
        cv = jnp.ceil(gv_min).astype(jnp.int32)
        du = jnp.arange(4, dtype=jnp.int32)
        pu = cu[:, None] + (du % 2)[None, :]
        pv = cv[:, None] + (du // 2)[None, :]
        okp = q_has[:, None] & (pu >= 0) & (pu < w) & (pv >= 0) & (pv < h)
        bcols = tuple(c[:, None] for c in cols)
        hit, depth, _, _ = R._eval_columns(
            pu.astype(jnp.float32), pv.astype(jnp.float32), bcols,
            0.0, True, False, False,
        )
        ok = okp & hit
        pix = jnp.where(ok, pv * w + pu, hw + 1)
        dbits = jax.lax.bitcast_convert_type(
            jnp.where(ok, jnp.maximum(depth, 0.0), 0.0), jnp.int32
        )
        fid = jnp.broadcast_to(q_idx[:, None], pix.shape)
        return pix.reshape(-1), dbits.reshape(-1), fid.reshape(-1)

    p2, d2, f2 = timeit("emit tier2 (rows)", emit2, q_rows, q_idx, q_has)

    sent_pix = jnp.arange(hw + 1, dtype=jnp.int32)
    sent_dbits = jnp.full((hw + 1,), jnp.iinfo(jnp.int32).min, jnp.int32)
    sent_face = jnp.full((hw + 1,), -1, jnp.int32)

    @jax.jit
    def bigsort(p1, d1, f1, p2, d2, f2):
        pix = jnp.concatenate([p1, p2, sent_pix])
        db = jnp.concatenate([d1, d2, sent_dbits])
        fi = jnp.concatenate([f1, f2, sent_face])
        return jax.lax.sort((pix, db, fi), num_keys=3, is_stable=False)

    sp, sd, sf = timeit("3-op sort (5.9M, 3 keys)", bigsort, p1, d1, f1, p2, d2, f2)
    n_pairs = sp.shape[0]

    @jax.jit
    def recover(sf):
        return jax.lax.sort(
            jnp.where(
                sf == -1,
                jnp.arange(n_pairs, dtype=jnp.int32),
                jnp.int32(n_pairs),
            ),
            is_stable=False,
        )[: hw + 1]

    sent_pos = timeit("sentinel recovery (1-op 5.9M)", recover, sf)

    k = 1

    @jax.jit
    def select(sent_pos, sf, sd):
        take = sent_pos[:hw, None] + 1 + jnp.arange(k, dtype=jnp.int32)[None]
        within = take < sent_pos[1:, None]
        take_c = jnp.minimum(take, n_pairs - 1)
        sel_face = jnp.where(within, sf[take_c], -1)
        sel_depth = jnp.where(
            within,
            jax.lax.bitcast_convert_type(sd[take_c], jnp.float32),
            R.BG_DEPTH,
        )
        return sel_face, sel_depth

    sel_face, sel_depth = timeit("select winners", select, sent_pos, sf, sd)
    print(f"covered {int((sel_face >= 0).sum()):,}/{hw}", file=sys.stderr)

    @jax.jit
    def reeval(fv9, sel_face):
        rows = fv9[jnp.maximum(sel_face, 0).reshape(-1)]
        cols = tuple(rows[:, i] for i in range(9))
        lin = jnp.arange(hw, dtype=jnp.int32)
        hit, depth, bary, d2 = R._eval_columns(
            (lin % w).astype(jnp.float32),
            (lin // w).astype(jnp.float32),
            cols,
            0.0,
            True,
            False,
            False,
        )
        return bary, d2

    timeit("re-eval winners (307k rows)", reeval, fv9, sel_face)


if __name__ == "__main__":
    main()
