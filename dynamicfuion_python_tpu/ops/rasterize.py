"""Differentiable triangle rasterization (naive + tiled/binned).

Capability parity with the reference's coarse-to-fine CUDA rasterizer
(``cpp/rendering/RasterizeNdcTriangles.{h:26,cpp:32-129}``,
``kernel/RasterizeNdcTrianglesImpl.h``, ``RasterizeNdcTrianglesCUDA.cuh``):
PyTorch3D-style two-phase rasterization producing, per pixel, the K nearest
fragments along z — face index, depth, barycentric coordinates, and signed
point-to-face distance (for blur) — with options for perspective-correct /
clipped barycentrics and back-face culling.

TPU-native design:
  - the per-bin atomic counters + shared-memory bitmask binning become a
    sort-by-tile-id + rank-within-segment compaction producing a static
    ``[num_tiles, max_faces_per_bin]`` face table;
  - faces spanning more than ``SMALL_SPAN`` tiles are routed through a
    capped "large face" path that bins them to every covered tile (the
    reference handles this with chunked looping; here it's just more pairs);
  - the per-pixel K-nearest fragment queue (bubble sort in CUDA) becomes a
    vectorized sort over the bin axis per 2D tile;
  - everything is jit-safe with static shapes; the naive variant is the
    correctness oracle, mirroring the reference's brute-force fallback and
    its naive==binned test contract (``cpp/tests/test_rasterize.cpp``).

Geometry convention: rasterization happens in *pixel space* — face vertices
arrive as (u, v, z) with u,v in pixels and z the camera-space depth. NDC
in/out conversion helpers live alongside for API parity with the reference
(which inherits PyTorch3D's NDC convention).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

# plain Python float — a module-level jnp scalar would initialize the device
# backend (and, under the axon harness, claim the TPU tunnel) at import time
BG_DEPTH = 3.0e38


class Fragments(NamedTuple):
    """Per-pixel fragment buffers, K nearest along z (ascending)."""

    face_indices: jnp.ndarray  # int32[H, W, K], -1 = empty
    depths: jnp.ndarray  # f32[H, W, K], BG_DEPTH = empty
    barycentrics: jnp.ndarray  # f32[H, W, K, 3]
    distances: jnp.ndarray  # f32[H, W, K] signed squared px distance (neg inside)


def extract_face_vertices(
    vertices: jnp.ndarray,
    triangles: jnp.ndarray,
    intrinsics: jnp.ndarray,
    image_size: tuple[int, int],
    near: float = 0.05,
    far: float = 10.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Camera-space mesh -> per-face pixel-space vertex triples + clip mask.

    Mirrors ``GetMeshNdcFaceVerticesAndClipMask``
    (``cpp/rendering/functional/ExtractFaceVertices.h``): faces with any
    vertex outside (near, far) are masked out.

    Returns (face_vertices f32[F, 3, 3] as (u, v, z), valid bool[F]).
    """
    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]
    f = triangles.shape[0]
    # per-corner 1-D gathers + [F]-shaped math (a [F, 3, 3] intermediate
    # pads each face to a full TPU tile — ~10x slower at millions of faces)
    cols = []
    valid = None
    for i in range(3):
        vi = vertices[triangles[:, i]]  # [F, 3]
        z = vi[:, 2]
        ok = (z > near) & (z < far)
        valid = ok if valid is None else (valid & ok)
        safe_z = jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)
        cols.append(vi[:, 0] / safe_z * fx + cx)
        cols.append(vi[:, 1] / safe_z * fy + cy)
        cols.append(z)
    return jnp.stack(cols, axis=-1).reshape(f, 3, 3), valid


def project_face_soup(
    face_soup: jnp.ndarray,
    intrinsics: jnp.ndarray,
    near: float = 0.05,
    far: float = 10.0,
    valid: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Camera-space triangle soup [F, 3, 3] -> pixel-space face vertices.

    The gather-free sibling of :func:`extract_face_vertices` for the
    TPU-native mesh layout: marching-cubes extraction and the warp field both
    produce/consume triangle SOUP (vertices stored per-face), so the
    per-frame projection is pure elementwise math — no [F, 3] index gather,
    which costs ~90 ms at 4.5M faces on a v5e (random 12-byte-row gathers
    use a few percent of the HBM lanes). Same clip semantics as
    ``GetMeshNdcFaceVerticesAndClipMask``
    (``cpp/rendering/functional/ExtractFaceVertices.h``).
    """
    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]
    x, y, z = face_soup[..., 0], face_soup[..., 1], face_soup[..., 2]
    ok = jnp.all((z > near) & (z < far), axis=-1)
    if valid is not None:
        ok = ok & valid
    safe_z = jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)
    u = x / safe_z * fx + cx
    v = y / safe_z * fy + cy
    return jnp.stack([u, v, z], axis=-1), ok


def pixel_to_ndc(face_vertices_pix: jnp.ndarray, image_size) -> jnp.ndarray:
    """Pixel-space (u, v, z) faces -> PyTorch3D-style NDC (+x left, +y up,
    short side spans [-1, 1]) for reference-API parity."""
    h, w = image_size
    s = min(h, w)
    u, v, z = (face_vertices_pix[..., i] for i in range(3))
    x_ndc = -(2.0 * u - w) / s
    y_ndc = -(2.0 * v - h) / s
    return jnp.stack([x_ndc, y_ndc, z], axis=-1)


def ndc_to_pixel(face_vertices_ndc: jnp.ndarray, image_size) -> jnp.ndarray:
    h, w = image_size
    s = min(h, w)
    x, y, z = (face_vertices_ndc[..., i] for i in range(3))
    u = (w - s * x) / 2.0
    v = (h - s * y) / 2.0
    return jnp.stack([u, v, z], axis=-1)


# ---------------------------------------------------------------------------
# shared per-pixel/per-face math
# ---------------------------------------------------------------------------


def _edge_fn(px, py, ax, ay, bx, by):
    """Signed area x2 of (a, b, p): >0 when p is left of a->b."""
    return (px - ax) * (by - ay) - (py - ay) * (bx - ax)


def _point_segment_d2(px, py, ax, ay, bx, by):
    dx, dy = bx - ax, by - ay
    len2 = dx * dx + dy * dy
    t = jnp.clip(
        ((px - ax) * dx + (py - ay) * dy) / jnp.maximum(len2, 1e-12), 0.0, 1.0
    )
    ex, ey = ax + t * dx - px, ay + t * dy - py
    return ex * ex + ey * ey


def _fragment_candidates(
    px,
    py,
    face_verts,
    blur_radius: float,
    perspective_correct: bool,
    clip_barycentrics: bool,
    cull_back_faces: bool,
):
    """Evaluate faces at pixels.

    px, py: f32[P] pixel centers; face_verts: f32[P, B, 3, 3] or broadcastable
    (B faces per pixel row). Returns (hit bool[P,B], depth f32[P,B],
    bary f32[P,B,3], signed_d2 f32[P,B]).
    """
    ax, ay, az = (face_verts[..., 0, i] for i in range(3))
    bx, by, bz = (face_verts[..., 1, i] for i in range(3))
    cx, cy, cz = (face_verts[..., 2, i] for i in range(3))
    px = px[..., None]
    py = py[..., None]

    area = _edge_fn(cx, cy, ax, ay, bx, by)
    e0 = _edge_fn(px, py, bx, by, cx, cy)  # opposite vertex a
    e1 = _edge_fn(px, py, cx, cy, ax, ay)  # opposite vertex b
    e2 = _edge_fn(px, py, ax, ay, bx, by)  # opposite vertex c

    # back-face: screen-space winding (y down): front faces have area < 0 for
    # counter-clockwise world winding viewed by the camera; accept both unless
    # culling
    if cull_back_faces:
        orientation_ok = area > 0
    else:
        orientation_ok = jnp.abs(area) > 1e-12
    safe_area = jnp.where(jnp.abs(area) > 1e-12, area, 1e-12)
    w0 = e0 / safe_area
    w1 = e1 / safe_area
    w2 = e2 / safe_area
    inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)

    d2_edges = jnp.minimum(
        jnp.minimum(
            _point_segment_d2(px, py, ax, ay, bx, by),
            _point_segment_d2(px, py, bx, by, cx, cy),
        ),
        _point_segment_d2(px, py, cx, cy, ax, ay),
    )
    signed_d2 = jnp.where(inside, -d2_edges, d2_edges)
    hit = orientation_ok & (inside | (d2_edges <= blur_radius * blur_radius))

    bary = jnp.stack([w0, w1, w2], axis=-1)
    if perspective_correct:
        inv_z = 1.0 / jnp.maximum(
            jnp.stack([az, bz, cz], axis=-1), 1e-9
        )
        pw = bary * inv_z
        bary_pc = pw / jnp.maximum(
            jnp.sum(pw, axis=-1, keepdims=True), 1e-12
        )
        bary = bary_pc
    if clip_barycentrics:
        clipped = jnp.clip(bary, 0.0, 1.0)
        bary = clipped / jnp.maximum(
            jnp.sum(clipped, axis=-1, keepdims=True), 1e-12
        )
    depth = (
        bary[..., 0] * az + bary[..., 1] * bz + bary[..., 2] * cz
    )
    hit = hit & (depth > 0)
    return hit, depth, bary, signed_d2


def _top_k_fragments(hit, depth, bary, signed_d2, face_ids, k: int):
    """Per pixel row, keep K nearest hits along the candidate axis.

    hit/depth/signed_d2: [P, B]; bary: [P, B, 3]; face_ids: int32[P, B] or [B].
    """
    sort_key = jnp.where(hit, depth, BG_DEPTH)
    k = min(k, sort_key.shape[-1])
    neg_top, top_idx = jax.lax.top_k(-sort_key, k)  # ascending depth
    depths = -neg_top
    gather = lambda arr: jnp.take_along_axis(arr, top_idx, axis=-1)
    face_ids = jnp.broadcast_to(face_ids, sort_key.shape)
    sel_faces = jnp.where(
        depths < BG_DEPTH, gather(face_ids), -1
    )
    sel_bary = jnp.take_along_axis(bary, top_idx[..., None], axis=-2)
    sel_d2 = gather(signed_d2)
    empty = depths >= BG_DEPTH
    sel_bary = jnp.where(empty[..., None], 0.0, sel_bary)
    sel_d2 = jnp.where(empty, 0.0, sel_d2)
    return sel_faces.astype(jnp.int32), depths, sel_bary, sel_d2


# ---------------------------------------------------------------------------
# naive rasterizer (oracle)
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=(
        "image_size",
        "faces_per_pixel",
        "blur_radius",
        "perspective_correct",
        "clip_barycentrics",
        "cull_back_faces",
        "row_chunk",
    ),
)
def rasterize_naive(
    face_vertices: jnp.ndarray,
    valid_faces: jnp.ndarray,
    image_size: tuple[int, int],
    faces_per_pixel: int = 1,
    blur_radius: float = 0.0,
    perspective_correct: bool = True,
    clip_barycentrics: bool = False,
    cull_back_faces: bool = False,
    row_chunk: int = 16,
) -> Fragments:
    """Brute-force all-pixels x all-faces rasterization (correctness oracle,
    reference naive fallback). Memory O(row_chunk * W * F)."""
    h, w = image_size
    f = face_vertices.shape[0]
    face_ids = jnp.arange(f, dtype=jnp.int32)
    fv = jnp.where(valid_faces[:, None, None], face_vertices, -1e9)

    h_pad = (h + row_chunk - 1) // row_chunk * row_chunk
    rows = jnp.arange(0, h_pad, dtype=jnp.int32).reshape(-1, row_chunk)

    def do_rows(row_batch):
        # evaluate [row_chunk * w] pixels against all faces
        pxf = jnp.tile(jnp.arange(w, dtype=jnp.float32), row_chunk)
        pyf = jnp.repeat(row_batch.astype(jnp.float32), w)
        hit, depth, bary, d2 = _fragment_candidates(
            pxf,
            pyf,
            fv[None, :, :, :],
            blur_radius,
            perspective_correct,
            clip_barycentrics,
            cull_back_faces,
        )
        return _top_k_fragments(hit, depth, bary, d2, face_ids, faces_per_pixel)

    faces_r, depths_r, bary_r, d2_r = jax.lax.map(do_rows, rows)
    k = min(faces_per_pixel, f)
    out = Fragments(
        face_indices=faces_r.reshape(h_pad, w, k)[:h],
        depths=depths_r.reshape(h_pad, w, k)[:h],
        barycentrics=bary_r.reshape(h_pad, w, k, 3)[:h],
        distances=d2_r.reshape(h_pad, w, k)[:h],
    )
    return _pad_k(out, faces_per_pixel)


def _pad_k(frag: Fragments, k: int) -> Fragments:
    have = frag.face_indices.shape[-1]
    if have == k:
        return frag
    pad = k - have
    h, w = frag.face_indices.shape[:2]
    return Fragments(
        face_indices=jnp.concatenate(
            [frag.face_indices, jnp.full((h, w, pad), -1, jnp.int32)], -1
        ),
        depths=jnp.concatenate(
            [frag.depths, jnp.full((h, w, pad), BG_DEPTH)], -1
        ),
        barycentrics=jnp.concatenate(
            [frag.barycentrics, jnp.zeros((h, w, pad, 3))], -2
        ),
        distances=jnp.concatenate([frag.distances, jnp.zeros((h, w, pad))], -1),
    )


# ---------------------------------------------------------------------------
# binned rasterizer
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=(
        "image_size",
        "faces_per_pixel",
        "blur_radius",
        "perspective_correct",
        "clip_barycentrics",
        "cull_back_faces",
        "tile_size",
        "max_faces_per_bin",
        "small_span",
        "max_large_faces",
        "return_overflow",
        "tile_chunk",
        "use_pallas",
    ),
)
def rasterize_binned(
    face_vertices: jnp.ndarray,
    valid_faces: jnp.ndarray,
    image_size: tuple[int, int],
    faces_per_pixel: int = 1,
    blur_radius: float = 0.0,
    perspective_correct: bool = True,
    clip_barycentrics: bool = False,
    cull_back_faces: bool = False,
    tile_size: int = 16,
    max_faces_per_bin: int = 256,
    small_span: int = 4,
    max_large_faces: int = 512,
    return_overflow: bool = False,
    tile_chunk: int = 64,
    use_pallas: str = "auto",
) -> Fragments:
    """Two-phase tiled rasterization (production path).

    Phase 1 bins face AABBs to ``tile_size``-pixel tiles (sort + rank
    compaction); faces spanning more than ``small_span`` tiles per axis are
    binned through a capped large-face path covering their full AABB.
    Phase 2 rasterizes each tile against its (padded) face list and keeps the
    K nearest fragments.

    With ``return_overflow`` the result is ``(Fragments, overflow)`` where
    ``overflow`` = {"dropped_large_faces": int32, "dropped_bin_entries":
    int32}; non-zero values mean the static capacities were exceeded and the
    caller should re-run with larger ``max_large_faces`` /
    ``max_faces_per_bin`` (mirrors the reference's bin-overflow error,
    which aborts instead).
    """
    h, w = image_size
    f = face_vertices.shape[0]
    th = (h + tile_size - 1) // tile_size
    tw = (w + tile_size - 1) // tile_size
    num_tiles = th * tw
    margin = blur_radius

    fv = face_vertices
    # one relayout to [F, 9] so every AABB op below runs on 1-D [F] columns
    # ([F, 3, 3] arrays pad each face's tiny trailing dims to a full TPU
    # (8, 128) tile — measured ~10x slower for this phase)
    fv9 = fv.reshape(f, 9)
    us = (fv9[:, 0], fv9[:, 3], fv9[:, 6])
    vs = (fv9[:, 1], fv9[:, 4], fv9[:, 7])
    u_min = jnp.minimum(jnp.minimum(us[0], us[1]), us[2])
    u_max = jnp.maximum(jnp.maximum(us[0], us[1]), us[2])
    v_min = jnp.minimum(jnp.minimum(vs[0], vs[1]), vs[2])
    v_max = jnp.maximum(jnp.maximum(vs[0], vs[1]), vs[2])
    u0 = jnp.clip((u_min - margin) / tile_size, 0, tw - 1).astype(jnp.int32)
    u1 = jnp.clip((u_max + margin) / tile_size, 0, tw - 1).astype(jnp.int32)
    v0 = jnp.clip((v_min - margin) / tile_size, 0, th - 1).astype(jnp.int32)
    v1 = jnp.clip((v_max + margin) / tile_size, 0, th - 1).astype(jnp.int32)
    on_screen = (
        valid_faces
        & (u_max >= -margin)
        & (u_min < w + margin)
        & (v_max >= -margin)
        & (v_min < h + margin)
    )
    span_x = u1 - u0 + 1
    span_y = v1 - v0 + 1
    # three tiers: faces spanning <= 2x2 tiles are fully covered by their
    # four AABB-corner tiles (the common case for dense fusion meshes —
    # 4 pairs/face instead of small_span^2 = 16); spans up to ``small_span``
    # go through a capped medium path for their non-corner tiles; anything
    # bigger through the capped large path over its full AABB
    small2 = on_screen & (span_x <= 2) & (span_y <= 2)
    medium = (
        on_screen & ~small2 & (span_x <= small_span) & (span_y <= small_span)
    )
    large = on_screen & ~small2 & ~medium

    # --- corner pairs (small + medium faces): 4 x [F] 1-D arrays
    not_large = small2 | medium
    face_ids = jnp.arange(f, dtype=jnp.int32)
    corner_tiles = []
    corner_ok = []
    for cu, cv, distinct in (
        (u0, v0, None),
        (u1, v0, "u"),
        (u0, v1, "v"),
        (u1, v1, "uv"),
    ):
        ok = not_large
        if distinct in ("u", "uv"):
            ok = ok & (u1 > u0)
        if distinct in ("v", "uv"):
            ok = ok & (v1 > v0)
        corner_tiles.append(cv * tw + cu)
        corner_ok.append(ok)
    tile_s = jnp.concatenate(corner_tiles)
    face_s = jnp.concatenate([face_ids] * 4)
    ok_s = jnp.concatenate(corner_ok)

    # --- medium-face pairs: capped set x small_span^2 offsets, corner tiles
    # excluded (already emitted above)
    max_medium_faces = max_large_faces * 16
    (med_ids,) = jnp.nonzero(medium, size=max_medium_faces, fill_value=f)
    has_med = med_ids < f
    safe_med = jnp.where(has_med, med_ids, 0)
    offs = jnp.arange(small_span)
    dx = jnp.tile(offs, small_span)
    dy = jnp.repeat(offs, small_span)
    mu0 = u0[safe_med]
    mu1 = u1[safe_med]
    mv0 = v0[safe_med]
    mv1 = v1[safe_med]
    tx = mu0[:, None] + dx[None]
    ty = mv0[:, None] + dy[None]
    is_corner = ((tx == mu0[:, None]) | (tx == mu1[:, None])) & (
        (ty == mv0[:, None]) | (ty == mv1[:, None])
    )
    pair_ok_m = (
        has_med[:, None]
        & (tx <= mu1[:, None])
        & (ty <= mv1[:, None])
        & ~is_corner
    )
    tile_m = (ty * tw + tx).reshape(-1)
    face_m = jnp.broadcast_to(
        safe_med[:, None].astype(jnp.int32),
        (max_medium_faces, small_span * small_span),
    ).reshape(-1)
    ok_m = pair_ok_m.reshape(-1)

    # --- large-face pairs: capped face set x all tiles, masked to each AABB
    (large_ids,) = jnp.nonzero(large, size=max_large_faces, fill_value=f)
    has_large = large_ids < f
    safe_large = jnp.where(has_large, large_ids, 0)
    tile_ids_all = jnp.arange(num_tiles, dtype=jnp.int32)
    ttx = tile_ids_all % tw
    tty = tile_ids_all // tw
    in_box = (
        has_large[:, None]
        & (ttx[None] >= u0[safe_large][:, None])
        & (ttx[None] <= u1[safe_large][:, None])
        & (tty[None] >= v0[safe_large][:, None])
        & (tty[None] <= v1[safe_large][:, None])
    )
    tile_l = jnp.broadcast_to(tile_ids_all[None], in_box.shape).reshape(-1)
    face_l = jnp.broadcast_to(
        safe_large[:, None].astype(jnp.int32), in_box.shape
    ).reshape(-1)
    ok_l = in_box.reshape(-1)

    tile_all = jnp.concatenate([tile_s, tile_m, tile_l])
    face_all = jnp.concatenate([face_s, face_m, face_l])
    ok_all = jnp.concatenate([ok_s, ok_m, ok_l])

    # sort pairs by tile; invalid pairs sort last. A 2-operand lax.sort
    # carries the face payload through the sort network directly — the
    # argsort-then-gather formulation costs 13x more at 17.8M pairs (two
    # full-size random gathers, ~300 ms each on v5e)
    sort_key = jnp.where(ok_all, tile_all, num_tiles)
    sorted_tiles, sorted_faces = jax.lax.sort(
        (sort_key, face_all), num_keys=1, is_stable=True
    )
    # per-tile segment starts via binary search over the num_tiles tile ids
    # (cheap: num_tiles queries), then GATHER each tile's first
    # max_faces_per_bin entries — a [T, K] gather instead of a 2M-element
    # scatter, which XLA serializes on TPU (measured 430 ms vs ~10 ms).
    starts = jnp.searchsorted(
        sorted_tiles, jnp.arange(num_tiles + 1, dtype=sorted_tiles.dtype),
        side="left",
    )  # [T+1]
    take = starts[:num_tiles, None] + jnp.arange(max_faces_per_bin)[None]
    within = take < starts[1 : num_tiles + 1, None]
    table = jnp.where(
        within,
        sorted_faces[jnp.minimum(take, sorted_faces.shape[0] - 1)],
        -1,
    )

    # --- phase 2: per-tile rasterization
    fv_safe = jnp.where(valid_faces[:, None, None], fv, -1e9)

    pallas_ok = (
        use_pallas != "never"
        and faces_per_pixel == 1
        and tile_size == 16
        and (use_pallas == "force" or jax.default_backend() == "tpu")
    )
    if pallas_ok:
        from dynamicfuion_python_tpu.ops.pallas.rasterize_tiles import (
            rasterize_tiles_pallas,
        )

        k_pad = (max_faces_per_bin + 127) // 128 * 128
        if k_pad != max_faces_per_bin:
            table = jnp.concatenate(
                [table, jnp.full((num_tiles, k_pad - max_faces_per_bin), -1, jnp.int32)],
                axis=1,
            )
        gathered = fv_safe[jnp.maximum(table, 0)]  # [T, K, 3, 3]
        soa = jnp.zeros((num_tiles, 16, k_pad), jnp.float32)
        soa = soa.at[:, :9, :].set(
            gathered.reshape(num_tiles, k_pad, 9).transpose(0, 2, 1)
        )
        face_t, depth_t, bary_t, d2_t = rasterize_tiles_pallas(
            soa,
            table,
            blur_radius,
            tile_size,
            tw,
            perspective_correct=perspective_correct,
            cull_back_faces=cull_back_faces,
            # 'force' off-TPU = pallas interpret mode (CPU-testable)
            interpret=(
                use_pallas == "force" and jax.default_backend() != "tpu"
            ),
        )
        # note: clip_barycentrics is a no-op for K=1 hard rasterization of
        # interior pixels; blur-region pixels keep unclipped coordinates
        frag = Fragments(
            face_indices=_detile(
                face_t.reshape(num_tiles, tile_size, tile_size),
                th, tw, tile_size, (),
            )[:h, :w][..., None],
            depths=_detile(
                depth_t.reshape(num_tiles, tile_size, tile_size),
                th, tw, tile_size, (),
            )[:h, :w][..., None],
            barycentrics=_detile(
                bary_t.transpose(0, 2, 1).reshape(
                    num_tiles, tile_size, tile_size, 3
                ),
                th, tw, tile_size, (3,),
            )[:h, :w][:, :, None, :],
            distances=_detile(
                d2_t.reshape(num_tiles, tile_size, tile_size),
                th, tw, tile_size, (),
            )[:h, :w][..., None],
        )
        frag = _pad_k(frag, faces_per_pixel)
        if not return_overflow:
            return frag
        overflow = {
            "dropped_large_faces": (
                jnp.sum(large)
                - jnp.sum(has_large & large[safe_large])
                + jnp.sum(medium)
                - jnp.sum(has_med & medium[safe_med])
            ),
            "dropped_bin_entries": jnp.sum(
                jnp.maximum(
                    starts[1 : num_tiles + 1]
                    - starts[:num_tiles]
                    - max_faces_per_bin,
                    0,
                )
            ),
        }
        return frag, overflow
    px_local = jnp.arange(tile_size, dtype=jnp.float32)
    tile_px = jnp.tile(px_local, tile_size)
    tile_py = jnp.repeat(px_local, tile_size)

    bin_chunk = min(128, max_faces_per_bin)
    n_bin_chunks = (max_faces_per_bin + bin_chunk - 1) // bin_chunk

    def do_tile(tile_idx):
        base_x = (tile_idx % tw) * tile_size
        base_y = (tile_idx // tw) * tile_size
        px = tile_px + base_x
        py = tile_py + base_y

        def eval_chunk(chunk_idx):
            faces_chunk = jax.lax.dynamic_slice(
                table[tile_idx], (chunk_idx * bin_chunk,), (bin_chunk,)
            )
            present = faces_chunk >= 0
            gathered = fv_safe[jnp.maximum(faces_chunk, 0)]
            gathered = jnp.where(present[:, None, None], gathered, -1e9)
            return faces_chunk, _fragment_candidates(
                px,
                py,
                gathered[None],
                blur_radius,
                perspective_correct,
                clip_barycentrics,
                cull_back_faces,
            )

        if faces_per_pixel == 1:
            # depth-buffer specialization: a running min over bin chunks
            # replaces the per-pixel sort — this is the hot path of the
            # fitter and forward renderer
            def chunk_body(carry, chunk_idx):
                best_d, best_f, best_b, best_s = carry
                faces_chunk, (hit, depth, bary, d2) = eval_chunk(chunk_idx)
                depth = jnp.where(hit, depth, BG_DEPTH)
                arg = jnp.argmin(depth, axis=-1)  # [P]
                take = lambda a: jnp.take_along_axis(
                    a, arg[..., None], axis=-1
                )[..., 0]
                cand_d = take(depth)
                cand_f = faces_chunk[arg]
                cand_b = jnp.take_along_axis(
                    bary, arg[..., None, None], axis=-2
                )[..., 0, :]
                cand_s = take(d2)
                better = cand_d < best_d
                return (
                    jnp.where(better, cand_d, best_d),
                    jnp.where(better, cand_f, best_f),
                    jnp.where(better[..., None], cand_b, best_b),
                    jnp.where(better, cand_s, best_s),
                ), None

            p = tile_size * tile_size
            init = (
                jnp.full((p,), BG_DEPTH),
                jnp.full((p,), -1, jnp.int32),
                jnp.zeros((p, 3)),
                jnp.zeros((p,)),
            )
            (best_d, best_f, best_b, best_s), _ = jax.lax.scan(
                chunk_body, init, jnp.arange(n_bin_chunks)
            )
            empty = best_d >= BG_DEPTH
            return (
                jnp.where(empty, -1, best_f)[:, None],
                best_d[:, None],
                jnp.where(empty[:, None], 0.0, best_b)[:, None, :],
                jnp.where(empty, 0.0, best_s)[:, None],
            )

        faces_in_tile = table[tile_idx]
        present = faces_in_tile >= 0
        gathered = fv_safe[jnp.maximum(faces_in_tile, 0)]
        gathered = jnp.where(present[:, None, None], gathered, -1e9)
        hit, depth, bary, d2 = _fragment_candidates(
            px,
            py,
            gathered[None],
            blur_radius,
            perspective_correct,
            clip_barycentrics,
            cull_back_faces,
        )
        return _top_k_fragments(
            hit, depth, bary, d2, faces_in_tile, faces_per_pixel
        )

    # tiles are processed vmapped in chunks: vmap gives cross-tile
    # parallelism on the VPU while the outer lax.map bounds peak memory to
    # O(tile_chunk * tile_px * max_faces_per_bin)
    chunk = min(tile_chunk, num_tiles)
    pad_tiles = (-num_tiles) % chunk
    tile_ids = jnp.concatenate(
        [jnp.arange(num_tiles), jnp.zeros((pad_tiles,), jnp.int32)]
    ).reshape(-1, chunk)
    faces_t, depths_t, bary_t, d2_t = jax.lax.map(
        jax.vmap(do_tile), tile_ids
    )
    faces_t = faces_t.reshape(-1, *faces_t.shape[2:])[:num_tiles]
    depths_t = depths_t.reshape(-1, *depths_t.shape[2:])[:num_tiles]
    bary_t = bary_t.reshape(-1, *bary_t.shape[2:])[:num_tiles]
    d2_t = d2_t.reshape(-1, *d2_t.shape[2:])[:num_tiles]
    k = min(faces_per_pixel, max_faces_per_bin)

    def detile(arr, extra=()):
        arr = arr.reshape(th, tw, tile_size, tile_size, *extra)
        arr = arr.transpose(0, 2, 1, 3, *range(4, 4 + len(extra)))
        return arr.reshape(th * tile_size, tw * tile_size, *extra)

    frag = Fragments(
        face_indices=_detile(faces_t, th, tw, tile_size, (k,))[:h, :w],
        depths=_detile(depths_t, th, tw, tile_size, (k,))[:h, :w],
        barycentrics=_detile(bary_t, th, tw, tile_size, (k, 3))[:h, :w],
        distances=_detile(d2_t, th, tw, tile_size, (k,))[:h, :w],
    )
    frag = _pad_k(frag, faces_per_pixel)
    if not return_overflow:
        return frag
    overflow = {
        "dropped_large_faces": (
            jnp.sum(large)
            - jnp.sum(has_large & large[safe_large])
            + jnp.sum(medium)
            - jnp.sum(has_med & medium[safe_med])
        ),
        "dropped_bin_entries": jnp.sum(
            jnp.maximum(
                starts[1 : num_tiles + 1]
                - starts[:num_tiles]
                - max_faces_per_bin,
                0,
            )
        ),
    }
    return frag, overflow


def _detile(arr, th, tw, tile_size, extra):
    arr = arr.reshape(th, tw, tile_size, tile_size, *extra)
    perm = (0, 2, 1, 3) + tuple(range(4, 4 + len(extra)))
    return arr.transpose(*perm).reshape(
        th * tile_size, tw * tile_size, *extra
    )


# ---------------------------------------------------------------------------
# splat rasterizer (sub-pixel-face fast path)
# ---------------------------------------------------------------------------
#
# TPU-native K-nearest rasterization for meshes whose faces are at most a few
# pixels across (the 4.45M-triangle headline scene averages ~0.25 px/face;
# dense fusion meshes 1-3 px). Instead of binning faces to tiles and looping
# pixels x bin entries, each face is evaluated DIRECTLY at the few pixel
# centers inside its AABB (+blur margin) as flat [F]-shaped column math, and
# the per-pixel K-nearest reduction becomes one 3-operand lexicographic
# lax.sort by (pixel_id, depth_bits). This removes the bin table, the
# [T, K, 3, 3] gather, and the pixels-x-bin-capacity compute of the tiled
# path entirely; faces spanning more than 4 (+2*blur) pixels per axis route
# through rasterize_binned on a compacted subset and the two fragment sets
# merge by depth.
#
# Per-pixel selection is scatter- and search-free: one SENTINEL entry per
# pixel (depth key INT32_MIN, face -1) rides the main sort and lands at the
# head of its pixel's segment; recovering the sentinels' sorted positions is
# a single 1-operand sort, and pixel p's K nearest fragments then sit at
# positions sentinel_pos[p] + 1 .. + K. (A jnp.searchsorted over the sorted
# pair array does the same job 8x slower — 307k binary searches are 7M
# dependent gathers.)
#
# Same contract as rasterize_naive / rasterize_binned (the reference's
# coarse-to-fine rasterizer, cpp/rendering/RasterizeNdcTriangles.cpp:32-129).


def _eval_columns(
    px,
    py,
    cols,
    blur_radius: float,
    perspective_correct: bool,
    clip_barycentrics: bool,
    cull_back_faces: bool,
):
    """Fragment math on flat columns: px/py f32[N] pixel centers, cols =
    9-tuple (ax, ay, az, bx, by, bz, cx, cy, cz) of f32[N]. Returns
    (hit bool[N], depth f32[N], bary f32[N, 3], signed_d2 f32[N])."""
    ax, ay, az, bx, by, bz, cx, cy, cz = cols

    area = _edge_fn(cx, cy, ax, ay, bx, by)
    e0 = _edge_fn(px, py, bx, by, cx, cy)
    e1 = _edge_fn(px, py, cx, cy, ax, ay)
    e2 = _edge_fn(px, py, ax, ay, bx, by)
    if cull_back_faces:
        orientation_ok = area > 0
    else:
        orientation_ok = jnp.abs(area) > 1e-12
    safe_area = jnp.where(jnp.abs(area) > 1e-12, area, 1e-12)
    w0 = e0 / safe_area
    w1 = e1 / safe_area
    w2 = e2 / safe_area
    inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)

    d2_edges = jnp.minimum(
        jnp.minimum(
            _point_segment_d2(px, py, ax, ay, bx, by),
            _point_segment_d2(px, py, bx, by, cx, cy),
        ),
        _point_segment_d2(px, py, cx, cy, ax, ay),
    )
    signed_d2 = jnp.where(inside, -d2_edges, d2_edges)
    hit = orientation_ok & (inside | (d2_edges <= blur_radius * blur_radius))

    if perspective_correct:
        pa = w0 / jnp.maximum(az, 1e-9)
        pb = w1 / jnp.maximum(bz, 1e-9)
        pc = w2 / jnp.maximum(cz, 1e-9)
        denom = jnp.maximum(pa + pb + pc, 1e-12)
        w0, w1, w2 = pa / denom, pb / denom, pc / denom
    if clip_barycentrics:
        c0 = jnp.clip(w0, 0.0, 1.0)
        c1 = jnp.clip(w1, 0.0, 1.0)
        c2 = jnp.clip(w2, 0.0, 1.0)
        denom = jnp.maximum(c0 + c1 + c2, 1e-12)
        w0, w1, w2 = c0 / denom, c1 / denom, c2 / denom
    depth = w0 * az + w1 * bz + w2 * cz
    hit = hit & (depth > 0)
    return hit, depth, jnp.stack([w0, w1, w2], axis=-1), signed_d2


def _compact_indices(mask: jnp.ndarray, cap: int):
    """Indices of true entries (first ``cap``, ascending) via a 1-operand
    sort — scatter-free. Returns (idx int32[cap] clipped to valid range,
    has bool[cap], dropped int32)."""
    n = mask.shape[0]
    key = jnp.where(mask, jnp.arange(n, dtype=jnp.int32), jnp.int32(n))
    sorted_key = jax.lax.sort(key)[:cap]
    has = sorted_key < n
    dropped = jnp.maximum(jnp.sum(mask) - cap, 0)
    return jnp.where(has, sorted_key, 0), has, dropped


@functools.partial(
    jax.jit,
    static_argnames=(
        "image_size",
        "faces_per_pixel",
        "blur_radius",
        "perspective_correct",
        "clip_barycentrics",
        "cull_back_faces",
        "quad_cap",
        "hex_cap",
        "oct_cap",
        "max_large_faces",
        "return_overflow",
    ),
)
def rasterize_splat(
    face_vertices: jnp.ndarray,
    valid_faces: jnp.ndarray,
    image_size: tuple[int, int],
    faces_per_pixel: int = 1,
    blur_radius: float = 0.0,
    perspective_correct: bool = True,
    clip_barycentrics: bool = False,
    cull_back_faces: bool = False,
    quad_cap: int | None = None,
    hex_cap: int | None = None,
    oct_cap: int | None = None,
    max_large_faces: int = 512,
    return_overflow: bool = False,
):
    """Splat-path rasterization (see module comment above).

    ``quad_cap`` / ``hex_cap`` / ``oct_cap`` bound the compacted 2x2-,
    4x4- and 8x8-candidate tiers (defaults: F/4, F/16, F/64, floored at
    4096/4096/2048); ``max_large_faces`` bounds the faces routed through the
    brute-force fallback — a ``lax.cond``-guarded dense evaluation that the
    common all-small-face frame skips entirely at runtime (0 disables the
    fallback — faces wider than 8 (+2*blur) px are then dropped and counted
    in the overflow report).
    """
    h, w = image_size
    hw = h * w
    f = face_vertices.shape[0]
    k = faces_per_pixel
    r = float(blur_radius)
    if quad_cap is None:
        quad_cap = min(f, max(4096, f // 4))
    if hex_cap is None:
        hex_cap = min(f, max(4096, f // 16))
    if oct_cap is None:
        oct_cap = min(f, max(2048, f // 64))
    quad_cap = min(quad_cap, f)
    hex_cap = min(hex_cap, f)
    oct_cap = min(oct_cap, f)
    max_large_faces = min(max_large_faces, f)

    fv9 = face_vertices.reshape(f, 9)
    cols_all = tuple(fv9[:, i] for i in range(9))
    us = (cols_all[0], cols_all[3], cols_all[6])
    vs = (cols_all[1], cols_all[4], cols_all[7])
    u_min = jnp.minimum(jnp.minimum(us[0], us[1]), us[2])
    u_max = jnp.maximum(jnp.maximum(us[0], us[1]), us[2])
    v_min = jnp.minimum(jnp.minimum(vs[0], vs[1]), vs[2])
    v_max = jnp.maximum(jnp.maximum(vs[0], vs[1]), vs[2])
    on_screen = (
        valid_faces
        & (u_max >= -r)
        & (u_min < w - 1 + r)
        & (v_max >= -r)
        & (v_min < h - 1 + r)
    )
    span_u = u_max - u_min + 2 * r
    span_v = v_max - v_min + 2 * r
    # candidate-pixel window origin: first integer center >= u_min - r
    cu0 = jnp.ceil(u_min - r).astype(jnp.int32)
    cv0 = jnp.ceil(v_min - r).astype(jnp.int32)

    tier1 = on_screen & (span_u < 1) & (span_v < 1)
    tier2 = on_screen & ~tier1 & (span_u < 2) & (span_v < 2)
    tier4 = on_screen & ~tier1 & ~tier2 & (span_u < 4) & (span_v < 4)
    tier8 = (
        on_screen & ~tier1 & ~tier2 & ~tier4 & (span_u < 8) & (span_v < 8)
    )
    large = on_screen & ~tier1 & ~tier2 & ~tier4 & ~tier8

    face_ids = jnp.arange(f, dtype=jnp.int32)

    def emit(cols, ids, cu, cv, active, n_cand):
        """Evaluate faces at an n_cand-wide window of pixel centers; returns
        flat (pix int32, depth_bits int32, face int32) pair columns."""
        # square candidate window: n_cand = s * s pixel centers
        s = int(round(n_cand**0.5))
        du = jnp.arange(n_cand, dtype=jnp.int32)
        pu = cu[:, None] + (du % s)[None, :] if s > 1 else cu[:, None]
        pv = cv[:, None] + (du // s)[None, :] if s > 1 else cv[:, None]
        okp = (
            active[:, None]
            & (pu >= 0)
            & (pu < w)
            & (pv >= 0)
            & (pv < h)
        )
        pxf = pu.astype(jnp.float32)
        pyf = pv.astype(jnp.float32)
        bcols = tuple(c[:, None] for c in cols)
        hit, depth, _, _ = _eval_columns(
            pxf,
            pyf,
            bcols,
            blur_radius,
            perspective_correct,
            clip_barycentrics,
            cull_back_faces,
        )
        ok = okp & hit
        pix = jnp.where(ok, pv * w + pu, hw + 1)
        dbits = jax.lax.bitcast_convert_type(
            jnp.where(ok, jnp.maximum(depth, 0.0), 0.0), jnp.int32
        )
        fid = jnp.broadcast_to(ids[:, None], pix.shape)
        return pix.reshape(-1), dbits.reshape(-1), fid.reshape(-1)

    # tier 1: all faces, their single candidate center
    p1, d1, f1 = emit(cols_all, face_ids, cu0, cv0, tier1, 1)

    # tiers 2/4/8 + large: ONE compaction sort classifies all four at once
    # (key = class * F + index; per-class segments come out contiguous and
    # ascending), replacing four F-sized sorts with one
    n2 = jnp.sum(tier2).astype(jnp.int32)
    n4 = jnp.sum(tier4).astype(jnp.int32)
    n8 = jnp.sum(tier8).astype(jnp.int32)
    nl = jnp.sum(large).astype(jnp.int32)
    cls_key = jnp.where(
        tier2,
        face_ids,
        jnp.where(
            tier4,
            f + face_ids,
            jnp.where(
                tier8,
                2 * f + face_ids,
                jnp.where(large, 3 * f + face_ids, jnp.int32(4 * f)),
            ),
        ),
    )
    cls_sorted = jax.lax.sort(cls_key, is_stable=False)

    def tier_slice(start, cap, base):
        ent = jax.lax.dynamic_slice(cls_sorted, (start,), (cap,))
        has = (ent >= base) & (ent < base + f)
        return jnp.where(has, ent - base, 0), has

    q_idx, q_has = tier_slice(jnp.int32(0), quad_cap, 0)
    x_idx, x_has = tier_slice(n2, hex_cap, f)
    o_idx, o_has = tier_slice(n2 + n4, oct_cap, 2 * f)
    q_drop = jnp.maximum(n2 - quad_cap, 0)
    x_drop = jnp.maximum(n4 - hex_cap, 0)
    o_drop = jnp.maximum(n8 - oct_cap, 0)

    # tier 2: row-gather the 9 face columns at once ([cap, 9] — one gather
    # instead of nine F-sized scalar-column gathers), recompute the window
    # origin from the gathered columns (elementwise, cheaper than gathering)
    def gathered_cols(idx):
        rows = fv9[idx]  # [cap, 9]
        cols = tuple(rows[:, i] for i in range(9))
        gu_min = jnp.minimum(jnp.minimum(cols[0], cols[3]), cols[6])
        gv_min = jnp.minimum(jnp.minimum(cols[1], cols[4]), cols[7])
        gcu = jnp.ceil(gu_min - r).astype(jnp.int32)
        gcv = jnp.ceil(gv_min - r).astype(jnp.int32)
        return cols, gcu, gcv

    q_cols, q_cu, q_cv = gathered_cols(q_idx)
    p2, d2_, f2 = emit(q_cols, q_idx, q_cu, q_cv, q_has, 4)

    # tier 4: compacted faces, 4x4 window
    x_cols, x_cu, x_cv = gathered_cols(x_idx)
    p4, d4, f4 = emit(x_cols, x_idx, x_cu, x_cv, x_has, 16)

    # tier 8: compacted faces, 8x8 window
    o_cols, o_cu, o_cv = gathered_cols(o_idx)
    p8, d8, f8 = emit(o_cols, o_idx, o_cu, o_cv, o_has, 64)

    # one SENTINEL entry per pixel (plus a tail guard at pix == hw): depth
    # key INT32_MIN puts it at the head of its pixel's segment in the main
    # sort; pixel p's K nearest fragments then sit right after sentinel p,
    # bounded by sentinel p+1 (see module comment — this replaces a
    # searchsorted that costs 8x more)
    sent_pix = jnp.arange(hw + 1, dtype=jnp.int32)
    sent_dbits = jnp.full((hw + 1,), jnp.iinfo(jnp.int32).min, jnp.int32)
    sent_face = jnp.full((hw + 1,), -1, jnp.int32)

    pix_all = jnp.concatenate([p1, p2, p4, p8, sent_pix])
    dbits_all = jnp.concatenate([d1, d2_, d4, d8, sent_dbits])
    face_all = jnp.concatenate([f1, f2, f4, f8, sent_face])

    # num_keys=3: face id is a sort key too, so equal-depth ties resolve to
    # the lowest face id exactly like the naive oracle, independent of
    # emission order
    sorted_pix, sorted_dbits, sorted_face = jax.lax.sort(
        (pix_all, dbits_all, face_all), num_keys=3, is_stable=False
    )
    n_pairs = sorted_pix.shape[0]
    # sentinel positions are ascending (one per pixel, segments in pixel
    # order): recover them with one single-operand unstable sort
    sent_pos = jax.lax.sort(
        jnp.where(
            sorted_face == -1,
            jnp.arange(n_pairs, dtype=jnp.int32),
            jnp.int32(n_pairs),
        ),
        is_stable=False,
    )[: hw + 1]
    take = sent_pos[:hw, None] + 1 + jnp.arange(k, dtype=jnp.int32)[None]
    within = take < sent_pos[1:, None]
    take_c = jnp.minimum(take, n_pairs - 1)
    # gather ONLY the face id (TPU gathers are latency-bound per row — each
    # avoided gather column saves ~25 ns x HW*K); depth comes for free from
    # the winner re-evaluation below, bit-identical to the sort key
    sel_face = jnp.where(within, sorted_face[take_c], -1)  # [HW, K]

    # re-evaluate depth / barycentrics / signed distance at the winners
    # (cheaper than carrying 4 more payload operands through the
    # multi-million-pair sort); row-gather [HW*K, 9] — one gather, not nine
    win_rows = fv9[jnp.maximum(sel_face, 0).reshape(-1)]
    win_cols = tuple(win_rows[:, i] for i in range(9))
    pix_lin = jnp.arange(hw, dtype=jnp.int32)
    win_px = jnp.repeat(pix_lin % w, k).astype(jnp.float32)
    win_py = jnp.repeat(pix_lin // w, k).astype(jnp.float32)
    _, win_depth, win_bary, win_d2 = _eval_columns(
        win_px,
        win_py,
        win_cols,
        blur_radius,
        perspective_correct,
        clip_barycentrics,
        cull_back_faces,
    )
    have = sel_face.reshape(-1) >= 0
    sel_depth = jnp.where(
        have, jnp.maximum(win_depth, 0.0), BG_DEPTH
    ).reshape(hw, k)
    bary = jnp.where(have[:, None], win_bary, 0.0).reshape(hw, k, 3)
    dist = jnp.where(have, win_d2, 0.0).reshape(hw, k)

    frag = Fragments(
        face_indices=sel_face.reshape(h, w, k),
        depths=sel_depth.reshape(h, w, k),
        barycentrics=bary.reshape(h, w, k, 3),
        distances=dist.reshape(h, w, k),
    )

    l_drop = jnp.int32(0)
    if max_large_faces > 0:
        l_idx, l_has = tier_slice(n2 + n4 + n8, max_large_faces, 3 * f)
        l_drop = jnp.maximum(nl - max_large_faces, 0)

        def _with_large(frag_in):
            # brute-force the compacted large-face subset against every pixel
            # and merge by depth; for >= 8 px faces the per-face pixel count
            # is large enough that the dense [rows, L] evaluation is the
            # right shape for the VPU (the reference handles these with
            # tile-chunked bin looping, RasterizeNdcTriangles.cpp:96-129)
            l_fv = face_vertices[l_idx]
            lfrag = rasterize_naive(
                l_fv,
                l_has,
                image_size,
                faces_per_pixel=k,
                blur_radius=blur_radius,
                perspective_correct=perspective_correct,
                clip_barycentrics=clip_barycentrics,
                cull_back_faces=cull_back_faces,
            )
            lfaces = jnp.where(
                lfrag.face_indices >= 0,
                l_idx[jnp.maximum(lfrag.face_indices, 0)],
                -1,
            )
            return _merge_fragments(
                frag_in, lfrag._replace(face_indices=lfaces), k
            )

        # the branch is skipped at RUNTIME when no large face exists — the
        # common sub-pixel-mesh frame pays nothing for the capability
        frag = jax.lax.cond(nl > 0, _with_large, lambda fr: fr, frag)
    else:
        l_drop = jnp.sum(large)

    if not return_overflow:
        return frag
    return frag, {
        "dropped_large_faces": l_drop,
        "dropped_bin_entries": q_drop + x_drop + o_drop,
    }


def _merge_fragments(a: Fragments, b: Fragments, k: int) -> Fragments:
    """Merge two K-fragment buffers per pixel, keeping the K nearest."""
    depths = jnp.concatenate([a.depths, b.depths], axis=-1)
    faces = jnp.concatenate([a.face_indices, b.face_indices], axis=-1)
    bary = jnp.concatenate([a.barycentrics, b.barycentrics], axis=-2)
    dist = jnp.concatenate([a.distances, b.distances], axis=-1)
    neg_top, idx = jax.lax.top_k(-depths, k)
    gather = lambda arr: jnp.take_along_axis(arr, idx, axis=-1)
    return Fragments(
        face_indices=gather(faces),
        depths=-neg_top,
        barycentrics=jnp.take_along_axis(bary, idx[..., None], axis=-2),
        distances=gather(dist),
    )
