"""Surface extraction from TSDF volumes via marching tetrahedra.

Fills the role of the reference's marching-cubes mesh extraction
(``cpp/geometry/VoxelBlockGrid.h:48`` ``ExtractTriangleMesh``, backed by
Open3D's MC kernels). Marching *tetrahedra* is chosen for the TPU build:
identical zero-isosurface fidelity for TSDF fusion purposes, but the case
table is tiny and is **generated programmatically at import time** (below)
instead of being a 256-entry magic constant — every case is derived and
orientation-checked numerically, so the kernel is verifiable from first
principles.

Pipeline (all jit-safe, static shapes):
  1. per cube cell, split into 6 tetrahedra (the standard diagonal split);
  2. per tet, a 4-bit sign case selects 0/1/2 triangles whose vertices lie
     on sign-changing tet edges (linear interpolation to the zero crossing);
  3. occupancy -> fixed-capacity compaction via ``jnp.nonzero(size=...)``,
     then geometry is computed only for surviving triangles.

Output is a triangle soup (3 unique vertices per triangle) plus validity
count; vertex welding is unnecessary downstream (warping, rasterization and
normals all operate per-face or per-soup-vertex).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Table generation (runs once at import, pure numpy)
# ---------------------------------------------------------------------------

# Corner offsets of a unit cube, index = bit code (x + 2y + 4z order NOT used;
# plain binary: bit0->x, bit1->y, bit2->z)
_CUBE_CORNERS = np.array(
    [[(i >> 0) & 1, (i >> 1) & 1, (i >> 2) & 1] for i in range(8)], np.float32
)

# 6-tetrahedra decomposition of the cube around the main diagonal 0-7.
# Every tet contains corners 0 and 7; consecutive pairs share faces.
_TETS = np.array(
    [
        [0, 1, 3, 7],
        [0, 3, 2, 7],
        [0, 2, 6, 7],
        [0, 6, 4, 7],
        [0, 4, 5, 7],
        [0, 5, 1, 7],
    ],
    np.int32,
)

# tet edges as pairs of local tet-corner indices (0..3)
_TET_EDGES = np.array(
    [[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]], np.int32
)


def _build_case_table() -> np.ndarray:
    """For each of 16 sign cases of a tet, up to 2 triangles of tet-edge ids.

    Entry [case, tri, corner] = tet-edge index (0..5) or -1 (unused).
    A corner is "inside" (negative TSDF) when its case bit is set. Triangle
    winding is fixed numerically so the cross-product normal points from the
    inside (negative) region toward the outside — the outward surface normal
    convention marching cubes uses.
    """
    # canonical embedding: tet corners of the first tet of a unit cube
    pos = _CUBE_CORNERS[_TETS[0]]
    table = -np.ones((16, 2, 3), np.int64)
    for case in range(1, 15):
        inside = [(case >> c) & 1 == 1 for c in range(4)]
        crossing = [
            e
            for e, (a, b) in enumerate(_TET_EDGES)
            if inside[a] != inside[b]
        ]
        # midpoints as stand-in vertices for orientation checks
        mid = {
            e: 0.5 * (pos[_TET_EDGES[e][0]] + pos[_TET_EDGES[e][1]])
            for e in crossing
        }
        inside_centroid = np.mean(
            [pos[c] for c in range(4) if inside[c]], axis=0
        )
        outside_centroid = np.mean(
            [pos[c] for c in range(4) if not inside[c]], axis=0
        )
        out_dir = outside_centroid - inside_centroid

        def orient(tri):
            a, b, c = (mid[e] for e in tri)
            n = np.cross(b - a, c - a)
            return tri if np.dot(n, out_dir) > 0 else (tri[0], tri[2], tri[1])

        if len(crossing) == 3:
            table[case, 0] = orient(tuple(crossing))
        elif len(crossing) == 4:
            # order the quad so consecutive vertices share a tet face: sort
            # by angle around the quad centroid in its plane
            center = np.mean([mid[e] for e in crossing], axis=0)
            normal = out_dir / (np.linalg.norm(out_dir) + 1e-12)
            ref = mid[crossing[0]] - center
            ref -= normal * np.dot(ref, normal)
            ref /= np.linalg.norm(ref) + 1e-12
            ref2 = np.cross(normal, ref)

            def angle(e):
                d = mid[e] - center
                return np.arctan2(np.dot(d, ref2), np.dot(d, ref))

            ring = sorted(crossing, key=angle)
            table[case, 0] = orient((ring[0], ring[1], ring[2]))
            table[case, 1] = orient((ring[0], ring[2], ring[3]))
        else:  # pragma: no cover - cases 0/15 have no crossings
            raise AssertionError
    return table


_CASE_TABLE = _build_case_table()  # [16, 2, 3]
_CASE_TRI_COUNT = np.array(
    [int((row[0] >= 0).all()) + int((row[1] >= 0).all()) for row in _CASE_TABLE],
    np.int32,
)


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("max_triangles",))
def marching_tetrahedra(
    tsdf: jnp.ndarray,
    valid: jnp.ndarray,
    origins: jnp.ndarray,
    scale: float | jnp.ndarray,
    max_triangles: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Extract the zero isosurface of batched padded TSDF volumes.

    Args:
      tsdf: f32[B, R+1, R+1, R+1] per-block TSDF with +1 halo stitched in.
      valid: bool[B, R+1, R+1, R+1] voxel validity (weight > 0).
      origins: f32[B, 3] world-space position of each block's (0,0,0) voxel.
      scale: voxel size in meters.
      max_triangles: static output capacity.

    Returns:
      triangles f32[max_triangles, 3, 3] vertex positions (padded with 0),
      count int32 (number of real triangles; may be clamped at capacity).
    """
    b, rp = tsdf.shape[0], tsdf.shape[1]
    r = rp - 1

    corners = jnp.asarray(_CUBE_CORNERS.astype(np.int32))  # [8, 3]
    tets = jnp.asarray(_TETS)  # [6, 4]
    tet_edges = jnp.asarray(_TET_EDGES)  # [6, 2]
    case_table = jnp.asarray(_CASE_TABLE.astype(np.int32))  # [16, 2, 3]

    # cell corner values: [B, R, R, R, 8]
    corner_vals = jnp.stack(
        [tsdf[:, cx : cx + r, cy : cy + r, cz : cz + r] for cx, cy, cz in _CUBE_CORNERS.astype(int)],
        axis=-1,
    )
    corner_valid = jnp.stack(
        [valid[:, cx : cx + r, cy : cy + r, cz : cz + r] for cx, cy, cz in _CUBE_CORNERS.astype(int)],
        axis=-1,
    )
    cell_ok = jnp.all(corner_valid, axis=-1)  # [B, R, R, R]

    # per-tet sign case: [B, R, R, R, 6]
    tet_vals = corner_vals[..., tets]  # [B, R, R, R, 6, 4]
    inside = tet_vals < 0.0
    case = (
        inside[..., 0].astype(jnp.int32)
        + 2 * inside[..., 1].astype(jnp.int32)
        + 4 * inside[..., 2].astype(jnp.int32)
        + 8 * inside[..., 3].astype(jnp.int32)
    )
    tri_count = jnp.asarray(_CASE_TRI_COUNT)[case] * cell_ok[..., None]

    # flatten tet slots to 2 potential triangles each
    flat_case = case.reshape(-1)  # [B*R^3*6]
    flat_count = tri_count.reshape(-1)
    occ0 = flat_count >= 1
    occ1 = flat_count >= 2
    occupancy = jnp.stack([occ0, occ1], axis=-1).reshape(-1)  # [B*R^3*6*2]

    (tri_ids,) = jnp.nonzero(
        occupancy, size=max_triangles, fill_value=occupancy.shape[0]
    )
    count = jnp.minimum(jnp.sum(occupancy), max_triangles)
    in_range = tri_ids < occupancy.shape[0]
    safe_ids = jnp.where(in_range, tri_ids, 0)

    tet_slot = safe_ids // 2  # index into [B*R^3*6]
    tri_in_tet = (safe_ids % 2).astype(jnp.int32)

    # decode tet slot -> (block, cell xyz, tet index)
    tet_idx = tet_slot % 6
    cell = tet_slot // 6
    cz = cell % r
    cy = (cell // r) % r
    cx = (cell // (r * r)) % r
    blk = cell // (r * r * r)

    sel_case = flat_case[safe_ids // 2]
    edges = case_table[sel_case, tri_in_tet]  # [T, 3] tet-edge ids

    # edge endpoints as local tet corners -> cube corners -> voxel coords
    end_pair = tet_edges[edges]  # [T, 3, 2] local tet corner ids
    corner_a = jnp.take_along_axis(
        jnp.broadcast_to(tets[tet_idx][:, None], (safe_ids.shape[0], 3, 4)),
        end_pair[..., 0:1],
        axis=-1,
    )[..., 0]
    corner_b = jnp.take_along_axis(
        jnp.broadcast_to(tets[tet_idx][:, None], (safe_ids.shape[0], 3, 4)),
        end_pair[..., 1:2],
        axis=-1,
    )[..., 0]

    base = jnp.stack([cx, cy, cz], axis=-1)[:, None, :]  # [T, 1, 3]
    pos_a = base + corners[corner_a]  # [T, 3, 3] voxel coords
    pos_b = base + corners[corner_b]

    def sample(blk_ids, pos):
        return tsdf[blk_ids[:, None], pos[..., 0], pos[..., 1], pos[..., 2]]

    val_a = sample(blk, pos_a)  # [T, 3]
    val_b = sample(blk, pos_b)
    t = val_a / jnp.where(
        jnp.abs(val_a - val_b) > 1e-12, val_a - val_b, 1e-12
    )
    t = jnp.clip(t, 0.0, 1.0)[..., None]
    verts_local = pos_a.astype(jnp.float32) * (1 - t) + pos_b.astype(jnp.float32) * t
    verts = origins[blk][:, None, :] + verts_local * scale

    verts = jnp.where(in_range[:, None, None], verts, 0.0)
    return verts, count
