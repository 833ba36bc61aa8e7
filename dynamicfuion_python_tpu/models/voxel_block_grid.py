"""Sparse voxel-block TSDF volume with rigid and non-rigid integration.

Capability parity with the reference's
``cpp/geometry/VoxelBlockGrid.{h:48-285,cpp}`` (Open3D-derived hash TSDF:
named attributes tsdf/weight/color, 16^3 blocks, unique-block discovery,
rigid integrate, mesh extraction, save/load) and
``cpp/geometry/NonRigidSurfaceVoxelBlockGrid.{h:28-64}`` +
``kernel/NonRigidSurfaceVoxelBlockGridImpl.h:50-652``:
``IntegrateNonRigid`` (per-voxel: camera-space anchors -> warp -> project ->
PSDF -> weighted tsdf/color update), ``FindBlocksIntersectingTruncationRegion``
(warp block corners, AABB-vs-depth conservative test) and
``ActivateSleeveBlocks`` (1-ring neighbor allocation).

TPU-native design notes:
  - the pointer-based GPU hash map becomes a static-capacity SoA block table
    + sorted-key index (see ``ops/voxel_block_hash.py``); activation is
    sort/compact, not atomics;
  - per-frame kernels are dense over a *padded active-block list* with
    masking — no data-dependent shapes under jit;
  - the reference kernel forgets to increment the integration weight
    (``NonRigidSurfaceVoxelBlockGridImpl.h:200-205`` reads the weight but
    never stores weight+1 — mid-refactor bug); we implement the documented
    running-average intent: w' = w + 1.
  - mesh extraction uses marching cubes (``ops/marching_cubes``, matching
    the reference's Open3D MC; programmatically generated case table) over
    blocks with +1 halos stitched from neighbor blocks; a marching-
    tetrahedra kernel (``ops/marching_tetrahedra``) is kept as the denser
    alternative.
"""

from __future__ import annotations

import functools

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from dynamicfuion_python_tpu.ops import voxel_block_hash as vbh
from dynamicfuion_python_tpu.ops.anchors import compute_anchors_euclidean
from dynamicfuion_python_tpu.ops.camera import project_points, transform_points
from dynamicfuion_python_tpu.ops.marching_cubes import marching_cubes
from dynamicfuion_python_tpu.ops.marching_tetrahedra import marching_tetrahedra
from dynamicfuion_python_tpu.ops.warp import blend_warp


@flax.struct.dataclass
class VoxelBlockGrid:
    """Static-capacity sparse TSDF volume (canonical/reference frame)."""

    slot_keys: jnp.ndarray  # int32[Cap] packed block coords; EMPTY_KEY = free
    sorted_keys: jnp.ndarray  # int32[Cap]
    slot_of_sorted: jnp.ndarray  # int32[Cap]
    tsdf: jnp.ndarray  # f32[Cap, R, R, R]
    weight: jnp.ndarray  # f32[Cap, R, R, R]
    color: jnp.ndarray  # f32[Cap, R, R, R, 3]
    voxel_size: float = flax.struct.field(pytree_node=False, default=0.004)
    block_resolution: int = flax.struct.field(pytree_node=False, default=8)
    sdf_truncation_distance: float = flax.struct.field(
        pytree_node=False, default=0.02
    )
    depth_scale: float = flax.struct.field(pytree_node=False, default=1000.0)
    depth_max: float = flax.struct.field(pytree_node=False, default=3.0)

    # -- construction ---------------------------------------------------------

    @classmethod
    def create(
        cls,
        capacity: int = 2048,
        voxel_size: float = 0.004,
        block_resolution: int = 8,
        sdf_truncation_distance: float = 0.02,
        depth_scale: float = 1000.0,
        depth_max: float = 3.0,
    ) -> "VoxelBlockGrid":
        r = block_resolution
        keys = jnp.full((capacity,), vbh.EMPTY_KEY, jnp.int32)
        return cls(
            slot_keys=keys,
            sorted_keys=keys,
            slot_of_sorted=jnp.arange(capacity, dtype=jnp.int32),
            tsdf=jnp.zeros((capacity, r, r, r), jnp.float32),
            weight=jnp.zeros((capacity, r, r, r), jnp.float32),
            color=jnp.zeros((capacity, r, r, r, 3), jnp.float32),
            voxel_size=float(voxel_size),
            block_resolution=int(block_resolution),
            sdf_truncation_distance=float(sdf_truncation_distance),
            depth_scale=float(depth_scale),
            depth_max=float(depth_max),
        )

    @property
    def capacity(self) -> int:
        return self.slot_keys.shape[0]

    def occupied_mask(self) -> jnp.ndarray:
        return self.slot_keys != vbh.EMPTY_KEY

    def occupied_count(self) -> jnp.ndarray:
        return jnp.sum(self.occupied_mask())

    def block_side(self) -> float:
        return self.block_resolution * self.voxel_size

    # -- block discovery & activation ----------------------------------------

    def compute_unique_block_coordinates(
        self,
        depth: jnp.ndarray,
        intrinsics: jnp.ndarray,
        extrinsics: jnp.ndarray | None = None,
        stride: int = 4,
    ) -> jnp.ndarray:
        """Packed keys of blocks touched by the depth frame's truncation band.

        For strided valid pixels, the 27 blocks around the surface point (a
        cube of half-size = truncation distance) are marked — the same
        conservative band Open3D's ``compute_unique_block_coordinates`` uses.
        Returns padded unique keys (EMPTY_KEY tail).
        """
        from dynamicfuion_python_tpu.ops.camera import unproject_depth_image

        points, mask = unproject_depth_image(
            depth, intrinsics, self.depth_scale, self.depth_max
        )
        points = points[::stride, ::stride].reshape(-1, 3)
        mask = mask[::stride, ::stride].reshape(-1)
        if extrinsics is not None:
            # camera -> world: invert extrinsics
            inv = jnp.linalg.inv(extrinsics)
            points = transform_points(points, inv)
        trunc = self.sdf_truncation_distance
        offsets = jnp.asarray(
            [
                [dx, dy, dz]
                for dx in (-trunc, 0.0, trunc)
                for dy in (-trunc, 0.0, trunc)
                for dz in (-trunc, 0.0, trunc)
            ],
            jnp.float32,
        )
        cand = points[:, None, :] + offsets[None, :, :]
        blocks = jnp.floor(cand / self.block_side()).astype(jnp.int32)
        keys = vbh.pack_block_keys(blocks).reshape(-1)
        keys = jnp.where(jnp.repeat(mask, 27), keys, vbh.EMPTY_KEY)
        unique, _ = vbh.unique_keys_padded(keys)
        return unique

    def activate(self, candidate_keys: jnp.ndarray) -> "VoxelBlockGrid":
        """Insert novel blocks (padded EMPTY_KEY entries ignored); in-place
        slots are stable, new blocks land in free slots in deterministic
        order. Silently drops candidates beyond capacity (check
        ``occupied_count`` against capacity at the call site)."""
        unique, _ = vbh.unique_keys_padded(candidate_keys)
        _, found = vbh.lookup(self.sorted_keys, self.slot_of_sorted, unique)
        novel = jnp.where(
            (unique != vbh.EMPTY_KEY) & ~found, unique, vbh.EMPTY_KEY
        )
        # compact novel keys to the front
        novel_sorted = jnp.sort(novel)
        n_novel = jnp.sum(novel_sorted != vbh.EMPTY_KEY)
        # free slots in ascending slot order
        free = self.slot_keys == vbh.EMPTY_KEY
        free_rank = jnp.cumsum(free) - 1  # rank of each free slot
        take = free & (free_rank < n_novel)
        # for slot i taken: assign novel_sorted[free_rank[i]]
        assigned = novel_sorted[jnp.clip(free_rank, 0, self.capacity - 1)]
        new_slot_keys = jnp.where(take, assigned, self.slot_keys)
        sorted_keys, slot_of_sorted = vbh.build_sorted_index(new_slot_keys)
        return self.replace(
            slot_keys=new_slot_keys,
            sorted_keys=sorted_keys,
            slot_of_sorted=slot_of_sorted,
        )

    def find_block_slots(self, keys: jnp.ndarray):
        return vbh.lookup(self.sorted_keys, self.slot_of_sorted, keys)

    def block_coordinates(self) -> jnp.ndarray:
        """int32[Cap, 3] block coords (garbage where unoccupied — mask!)."""
        return vbh.unpack_block_keys(self.slot_keys)

    # -- voxel coordinate helpers --------------------------------------------

    def _voxel_world_positions(self, slots: jnp.ndarray) -> jnp.ndarray:
        """f32[S, R, R, R, 3] world positions of voxel centers for slots."""
        r = self.block_resolution
        coords = vbh.unpack_block_keys(self.slot_keys[slots])  # [S, 3]
        ii = jax.lax.broadcasted_iota(jnp.int32, (r, r, r), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (r, r, r), 1)
        kk = jax.lax.broadcasted_iota(jnp.int32, (r, r, r), 2)
        local = jnp.stack([ii, jj, kk], axis=-1)  # [R, R, R, 3]
        global_voxels = (
            coords[:, None, None, None, :] * r + local[None]
        ).astype(jnp.float32)
        return global_voxels * self.voxel_size

    # -- rigid integration ----------------------------------------------------

    def integrate(
        self,
        depth: jnp.ndarray,
        intrinsics: jnp.ndarray,
        extrinsics: jnp.ndarray | None = None,
        color: jnp.ndarray | None = None,
    ) -> "VoxelBlockGrid":
        """Rigid TSDF fusion over all occupied blocks (Open3D ``integrate``
        semantics: psdf = depth - z, normalized by truncation, running
        weighted average)."""
        slots = jnp.arange(self.capacity)
        occupied = self.occupied_mask()
        return self._integrate_impl(
            slots, occupied, depth, intrinsics, extrinsics, color,
            warp=None,
        )

    # -- non-rigid integration -----------------------------------------------

    def integrate_non_rigid(
        self,
        block_slots: jnp.ndarray,
        block_slots_valid: jnp.ndarray,
        warp_field,
        depth: jnp.ndarray,
        intrinsics: jnp.ndarray,
        extrinsics: jnp.ndarray | None = None,
        color: jnp.ndarray | None = None,
        normals: jnp.ndarray | None = None,
        post_warp_extrinsics: jnp.ndarray | None = None,
    ) -> "VoxelBlockGrid":
        """Non-rigid fusion through the warp field over the given block list
        (mirrors ``IntegrateNonRigid``; ``block_slots`` comes from
        ``find_blocks_intersecting_truncation_region``).

        ``normals``: f32[H, W, 3] target normal map for the oblique-angle
        rejection test (``cosine > 0.5`` discard, Impl.h:190-196).
        ``extrinsics`` applies BEFORE warping (reference semantics: the warp
        field lives in the current camera frame); ``post_warp_extrinsics``
        applies AFTER warping (our pipeline keeps the field in the canonical
        frame and moves the camera separately).
        """
        return self._integrate_impl(
            block_slots,
            block_slots_valid,
            depth,
            intrinsics,
            extrinsics,
            color,
            warp=warp_field,
            normals=normals,
            post_warp_extrinsics=post_warp_extrinsics,
        )

    def _integrate_impl(
        self,
        slots,
        slots_valid,
        depth,
        intrinsics,
        extrinsics,
        color,
        warp,
        normals=None,
        post_warp_extrinsics=None,
    ) -> "VoxelBlockGrid":
        r = self.block_resolution
        h, w = depth.shape
        trunc = self.sdf_truncation_distance

        world = self._voxel_world_positions(slots)  # [S, R,R,R, 3]
        flat = world.reshape(-1, 3)
        if extrinsics is not None:
            cam = transform_points(flat, extrinsics)
        else:
            cam = flat

        if warp is not None:
            anchors, weights, anchor_valid = warp.compute_anchors(cam)
            warped = blend_warp(
                cam,
                warp.node_positions,
                warp.node_rotations,
                warp.node_translations,
                anchors,
                weights,
            )
        else:
            anchor_valid = jnp.ones(cam.shape[:1], bool)
            warped = cam

        if post_warp_extrinsics is not None:
            warped = transform_points(warped, post_warp_extrinsics)

        uv, in_front = project_points(warped, intrinsics)
        u = jnp.round(uv[..., 0]).astype(jnp.int32)
        v = jnp.round(uv[..., 1]).astype(jnp.int32)
        in_bounds = (u >= 0) & (u < w) & (v >= 0) & (v < h)
        u_safe = jnp.clip(u, 0, w - 1)
        v_safe = jnp.clip(v, 0, h - 1)

        # ONE packed 8-wide pixel-table row gather per voxel instead of
        # separate depth/normal/color gathers (TPU gathers are per-op
        # latency-bound; narrow rows waste the 128-lane tile anyway)
        pixel_cols = [depth.astype(jnp.float32).reshape(-1, 1)]
        if normals is not None and warp is not None:
            pixel_cols.append(normals.reshape(-1, 3))
        else:
            pixel_cols.append(jnp.zeros((h * w, 3), jnp.float32))
        if color is not None:
            pixel_cols.append(color.reshape(-1, 3))
        else:
            pixel_cols.append(jnp.zeros((h * w, 3), jnp.float32))
        pixel_cols.append(jnp.zeros((h * w, 1), jnp.float32))
        pixel_tbl = jnp.concatenate(pixel_cols, axis=1)  # [H*W, 8]
        row = pixel_tbl[v_safe * w + u_safe]  # [P, 8]

        d = row[:, 0] / self.depth_scale
        depth_ok = (d > 0.0) & (d <= self.depth_max)

        psdf = d - warped[..., 2]

        update = (
            anchor_valid
            & in_front
            & in_bounds
            & depth_ok
            & (psdf > -trunc)
        )
        if normals is not None and warp is not None:
            view_dir = -warped / jnp.maximum(
                jnp.linalg.norm(warped, axis=-1, keepdims=True), 1e-12
            )
            nrm = row[:, 1:4]
            cosine = jnp.sum(view_dir * nrm, axis=-1)
            # Reject OBLIQUE readings (cosine small). The reference's own
            # comment states this intent, but its code keeps `cosine <= 0.5`
            # (``NonRigidSurfaceVoxelBlockGridImpl.h:191``) which — with its
            # camera-facing normal convention (``preprocessing.py:30-38``,
            # n_z <= 0, so head-on cosine = +1) — rejects exactly the
            # reliable head-on voxels. Third genuine reference bug fixed here
            # (see the module docstring for the other two).
            update = update & (cosine > 0.5)

        tsdf_new = jnp.minimum(psdf, trunc) / trunc

        # gather -> update -> scatter per slot
        shape_blocks = (slots.shape[0], r, r, r)
        update = (update.reshape(shape_blocks)) & slots_valid[:, None, None, None]
        tsdf_new = tsdf_new.reshape(shape_blocks)

        old_tsdf = self.tsdf[slots]
        old_weight = self.weight[slots]
        inv_w = 1.0 / (old_weight + 1.0)
        merged_tsdf = jnp.where(
            update, (old_weight * old_tsdf + tsdf_new) * inv_w, old_tsdf
        )
        merged_weight = jnp.where(update, old_weight + 1.0, old_weight)

        new_tsdf = self.tsdf.at[slots].set(merged_tsdf)
        new_weight = self.weight.at[slots].set(merged_weight)

        new_color = self.color
        if color is not None:
            sampled = row[:, 4:7].reshape(*shape_blocks, 3)
            old_color = self.color[slots]
            merged_color = jnp.where(
                update[..., None],
                (old_weight[..., None] * old_color + sampled)
                * inv_w[..., None],
                old_color,
            )
            new_color = self.color.at[slots].set(merged_color)

        return self.replace(tsdf=new_tsdf, weight=new_weight, color=new_color)

    # -- block-frustum / truncation-region tests -------------------------------

    def find_blocks_intersecting_truncation_region(
        self,
        depth: jnp.ndarray,
        warp_field,
        intrinsics: jnp.ndarray,
        extrinsics: jnp.ndarray | None = None,
        downsample: int = 16,
        post_warp_extrinsics: jnp.ndarray | None = None,
    ) -> jnp.ndarray:
        """bool[Cap]: occupied blocks whose *warped* extent may intersect the
        depth frame's truncation band (conservative; mirrors
        ``FindBlocksIntersectingTruncationRegion``: warp the 8 block corners,
        take the AABB, compare against the depth range behind its pixel
        footprint +- truncation)."""
        r = self.block_resolution
        side = self.block_side()
        coords = self.block_coordinates().astype(jnp.float32)  # [Cap, 3]
        corner_offsets = jnp.asarray(
            [[i, j, k] for i in (0, 1) for j in (0, 1) for k in (0, 1)],
            jnp.float32,
        )
        corners = (coords[:, None, :] + corner_offsets[None]) * side  # [Cap,8,3]
        flat = corners.reshape(-1, 3)
        if extrinsics is not None:
            flat = transform_points(flat, extrinsics)
        anchors, weights, _ = warp_field.compute_anchors(flat)
        warped = blend_warp(
            flat,
            warp_field.node_positions,
            warp_field.node_rotations,
            warp_field.node_translations,
            anchors,
            weights,
        )
        if post_warp_extrinsics is not None:
            warped = transform_points(warped, post_warp_extrinsics)
        warped = warped.reshape(-1, 8, 3)

        uv, in_front = project_points(warped.reshape(-1, 3), intrinsics)
        uv = uv.reshape(-1, 8, 2)
        in_front = in_front.reshape(-1, 8)
        zmin = jnp.min(warped[..., 2], axis=1)
        zmax = jnp.max(warped[..., 2], axis=1)

        h, w = depth.shape
        # min/max depth mip at `downsample`
        d = depth.astype(jnp.float32) / self.depth_scale
        valid = (d > 0) & (d <= self.depth_max)
        hp = (h + downsample - 1) // downsample * downsample
        wp = (w + downsample - 1) // downsample * downsample
        dmin_full = jnp.full((hp, wp), jnp.inf).at[:h, :w].set(
            jnp.where(valid, d, jnp.inf)
        )
        dmax_full = jnp.zeros((hp, wp)).at[:h, :w].set(jnp.where(valid, d, 0.0))
        ch, cw = hp // downsample, wp // downsample
        dmin = dmin_full.reshape(ch, downsample, cw, downsample).min(axis=(1, 3))
        dmax = dmax_full.reshape(ch, downsample, cw, downsample).max(axis=(1, 3))

        # pixel AABB -> coarse-cell AABB, sampled on a static 4x4 grid
        u0 = jnp.clip(jnp.min(uv[..., 0], axis=1) / downsample, 0, cw - 1)
        u1 = jnp.clip(jnp.max(uv[..., 0], axis=1) / downsample, 0, cw - 1)
        v0 = jnp.clip(jnp.min(uv[..., 1], axis=1) / downsample, 0, ch - 1)
        v1 = jnp.clip(jnp.max(uv[..., 1], axis=1) / downsample, 0, ch - 1)
        ts = jnp.linspace(0.0, 1.0, 4)
        gu = (u0[:, None] + (u1 - u0)[:, None] * ts[None]).astype(jnp.int32)
        gv = (v0[:, None] + (v1 - v0)[:, None] * ts[None]).astype(jnp.int32)
        cell_min = dmin[gv[:, :, None], gu[:, None, :]].min(axis=(1, 2))
        cell_max = dmax[gv[:, :, None], gu[:, None, :]].max(axis=(1, 2))

        trunc = self.sdf_truncation_distance
        overlap = (zmin - trunc <= cell_max) & (zmax + trunc >= cell_min)
        on_screen = jnp.any(in_front, axis=1) & (cell_max > 0)
        return self.occupied_mask() & overlap & on_screen

    def activate_sleeve_blocks(
        self, intersecting_mask: jnp.ndarray
    ) -> "VoxelBlockGrid":
        """Allocate the 1-ring (26-neighborhood) of flagged blocks
        (``ActivateSleeveBlocks`` semantics)."""
        coords = self.block_coordinates()
        neighbor_offsets = jnp.asarray(
            [
                [dx, dy, dz]
                for dx in (-1, 0, 1)
                for dy in (-1, 0, 1)
                for dz in (-1, 0, 1)
            ],
            jnp.int32,
        )
        cand = coords[:, None, :] + neighbor_offsets[None]
        keys = vbh.pack_block_keys(cand).reshape(-1)
        keys = jnp.where(
            jnp.repeat(intersecting_mask, 27), keys, vbh.EMPTY_KEY
        )
        return self.activate(keys)

    # -- extraction ------------------------------------------------------------

    def _stitched_volumes(self, weight_threshold: float = 0.0):
        """Per-block [R+1]^3 tsdf + validity with +1 halos gathered from the
        7 positive-direction neighbor blocks.

        ``weight_threshold`` > 0 excludes voxels with integration weight
        below it (the reference's mesh-extraction weight thresholding,
        ``VoxelBlockGrid::ExtractTriangleMesh(weight_threshold, ...)``)."""
        r = self.block_resolution
        cap = self.capacity
        coords = self.block_coordinates()
        # traceable under jit: the threshold may be a traced scalar (the
        # fused extraction program passes the per-frame ramp value in)
        thr = jnp.maximum(jnp.asarray(weight_threshold, jnp.float32), 0.0)

        def weight_ok(wgt):
            return jnp.where(thr > 0, wgt >= thr, wgt > 0)

        tsdf_p = jnp.zeros((cap, r + 1, r + 1, r + 1), jnp.float32)
        valid_p = jnp.zeros((cap, r + 1, r + 1, r + 1), bool)
        tsdf_p = tsdf_p.at[:, :r, :r, :r].set(self.tsdf)
        valid_p = valid_p.at[:, :r, :r, :r].set(weight_ok(self.weight))

        def neighbor_data(offset):
            keys = vbh.pack_block_keys(coords + jnp.asarray(offset, jnp.int32))
            slots, found = self.find_block_slots(keys)
            nb_tsdf = self.tsdf[slots]
            nb_valid = weight_ok(self.weight[slots]) & found[:, None, None, None]
            return nb_tsdf, nb_valid

        # face neighbors
        for axis, offset in enumerate(([1, 0, 0], [0, 1, 0], [0, 0, 1])):
            nt, nv = neighbor_data(offset)
            if axis == 0:
                tsdf_p = tsdf_p.at[:, r, :r, :r].set(nt[:, 0])
                valid_p = valid_p.at[:, r, :r, :r].set(nv[:, 0])
            elif axis == 1:
                tsdf_p = tsdf_p.at[:, :r, r, :r].set(nt[:, :, 0])
                valid_p = valid_p.at[:, :r, r, :r].set(nv[:, :, 0])
            else:
                tsdf_p = tsdf_p.at[:, :r, :r, r].set(nt[:, :, :, 0])
                valid_p = valid_p.at[:, :r, :r, r].set(nv[:, :, :, 0])
        # edge neighbors
        for offset, take, put in (
            ([1, 1, 0], (0, 0, slice(None, r)), (r, r, slice(None, r))),
            ([1, 0, 1], (0, slice(None, r), 0), (r, slice(None, r), r)),
            ([0, 1, 1], (slice(None, r), 0, 0), (slice(None, r), r, r)),
        ):
            nt, nv = neighbor_data(offset)
            tsdf_p = tsdf_p.at[(slice(None),) + put].set(
                nt[(slice(None),) + take]
            )
            valid_p = valid_p.at[(slice(None),) + put].set(
                nv[(slice(None),) + take]
            )
        # corner neighbor
        nt, nv = neighbor_data([1, 1, 1])
        tsdf_p = tsdf_p.at[:, r, r, r].set(nt[:, 0, 0, 0])
        valid_p = valid_p.at[:, r, r, r].set(nv[:, 0, 0, 0])

        valid_p = valid_p & self.occupied_mask()[:, None, None, None]
        return tsdf_p, valid_p

    def extract_triangle_soup(
        self,
        max_triangles: int = 200_000,
        weight_threshold: float = 0.0,
        method: str = "cubes",
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Zero-isosurface triangle soup f32[max_triangles, 3, 3] + count.

        ``method="cubes"`` (default) is the reference-parity marching-cubes
        path (``VoxelBlockGrid::ExtractTriangleMesh`` is Open3D MC) and
        emits ~4x fewer triangles; ``"tetrahedra"`` keeps the
        marching-tetrahedra kernel (same isosurface, denser soup)."""
        tsdf_p, valid_p = self._stitched_volumes(weight_threshold)
        origins = (
            self.block_coordinates().astype(jnp.float32)
            * self.block_side()
        )
        kernel = marching_cubes if method == "cubes" else marching_tetrahedra
        return kernel(
            tsdf_p, valid_p, origins, self.voxel_size, max_triangles
        )

    def extract_triangle_mesh(
        self,
        max_triangles: int = 200_000,
        max_vertices: int | None = None,
        weight_threshold: float = 0.0,
    ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Welded zero-isosurface mesh (shared vertices), mirroring the
        reference's ``VoxelBlockGrid::ExtractTriangleMesh``
        (``cpp/geometry/VoxelBlockGrid.h:48``, Open3D marching cubes with
        vertex sharing).

        The triangle soup from marching tetrahedra is welded by quantizing
        vertex coordinates to a 1e-6 m grid (isosurface vertices on shared
        tet edges are bit-identical up to block-origin rounding, so this is
        exact welding, not simplification) and deduplicating with a fixed
        capacity ``jnp.unique``.

        Returns:
          vertices f32[max_vertices, 3] (padded with 0),
          faces int32[max_triangles, 3] vertex indices (garbage past count),
          vertex_count int32, triangle_count int32.
        """
        if max_vertices is None:
            # Euler bound: a closed triangle mesh has ~T/2 vertices; soup
            # welding never produces more than 3T/2 + 2 for open surfaces.
            max_vertices = max_triangles * 3 // 2 + 2
        soup, tri_count = self.extract_triangle_soup(max_triangles, weight_threshold)
        verts = soup.reshape(-1, 3)
        tri_valid = jnp.arange(max_triangles) < tri_count
        # 1e-6 m quantization grid; int32 range covers +-2147 m of scene
        weld_eps = 1e-6
        q = jnp.round(verts / weld_eps).astype(jnp.int32)
        sentinel = jnp.int32(2**31 - 1)
        q = jnp.where(
            jnp.repeat(tri_valid, 3)[:, None], q, sentinel
        )
        uq, inv = jnp.unique(
            q,
            axis=0,
            size=max_vertices + 1,
            return_inverse=True,
            fill_value=sentinel,
        )
        vertices = jnp.zeros((max_vertices + 1, 3), jnp.float32).at[inv].set(
            verts
        )
        faces = inv.reshape(max_triangles, 3).astype(jnp.int32)
        vertex_count = jnp.sum(jnp.any(uq != sentinel, axis=1))
        return vertices[:max_vertices], faces, vertex_count, tri_count

    # -- TSDF sampling & ray casting -------------------------------------------

    def sample_tsdf(
        self, points: jnp.ndarray
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Trilinear TSDF sample at world points f32[N, 3] -> (value f32[N],
        valid bool[N]); valid requires all 8 surrounding voxels observed
        (weight > 0). Voxel centers sit at ``index * voxel_size`` (matching
        ``_voxel_world_positions``)."""
        r = self.block_resolution
        vc = points / self.voxel_size
        base = jnp.floor(vc).astype(jnp.int32)  # [N, 3]
        frac = vc - base
        corner_offsets = jnp.asarray(
            [[i, j, k] for i in (0, 1) for j in (0, 1) for k in (0, 1)],
            jnp.int32,
        )  # [8, 3]
        idx = base[:, None, :] + corner_offsets[None]  # [N, 8, 3]
        block = jnp.floor_divide(idx, r)
        local = idx - block * r
        slots, found = self.find_block_slots(
            vbh.pack_block_keys(block.reshape(-1, 3))
        )
        flat_local = local.reshape(-1, 3)
        t = self.tsdf[slots, flat_local[:, 0], flat_local[:, 1], flat_local[:, 2]]
        w = self.weight[slots, flat_local[:, 0], flat_local[:, 1], flat_local[:, 2]]
        t = t.reshape(-1, 8)
        observed = (found & (w > 0)).reshape(-1, 8)
        # trilinear weights per corner
        f = frac[:, None, :]
        o = corner_offsets[None].astype(jnp.float32)
        wt = jnp.prod(o * f + (1.0 - o) * (1.0 - f), axis=-1)  # [N, 8]
        value = jnp.sum(wt * t, axis=-1)
        valid = jnp.all(observed, axis=-1)
        return value, valid

    def sample_color(self, points: jnp.ndarray) -> jnp.ndarray:
        """Trilinear color sample at world points f32[N, 3] -> f32[N, 3]."""
        r = self.block_resolution
        vc = points / self.voxel_size
        base = jnp.floor(vc).astype(jnp.int32)
        frac = vc - base
        corner_offsets = jnp.asarray(
            [[i, j, k] for i in (0, 1) for j in (0, 1) for k in (0, 1)],
            jnp.int32,
        )
        idx = base[:, None, :] + corner_offsets[None]
        block = jnp.floor_divide(idx, r)
        local = idx - block * r
        slots, found = self.find_block_slots(
            vbh.pack_block_keys(block.reshape(-1, 3))
        )
        flat_local = local.reshape(-1, 3)
        c = self.color[
            slots, flat_local[:, 0], flat_local[:, 1], flat_local[:, 2]
        ].reshape(-1, 8, 3)
        c = jnp.where(found.reshape(-1, 8, 1), c, 0.0)
        f = frac[:, None, :]
        o = corner_offsets[None].astype(jnp.float32)
        wt = jnp.prod(o * f + (1.0 - o) * (1.0 - f), axis=-1)
        return jnp.sum(wt[..., None] * c, axis=1)

    def ray_cast(
        self,
        intrinsics: jnp.ndarray,
        extrinsics: jnp.ndarray | None,
        width: int,
        height: int,
        depth_min: float = 0.1,
        with_normals: bool = False,
        with_color: bool = False,
    ) -> dict:
        """TSDF raymarching (mirrors ``VoxelBlockGrid::RayCast``,
        ``cpp/geometry/VoxelBlockGrid.h:48`` / Open3D ray_cast semantics).

        Two-phase, TPU-friendly march with static trip counts: a coarse pass
        strides at half the truncation distance until the first
        positive->nonpositive TSDF zero crossing, then one linear-interpolation
        refinement between the bracketing samples (TSDF is linear near the
        surface by construction, so a single secant step is exact to
        truncation curvature).

        Returns a dict with ``depth`` f32[H, W] (0 = miss), ``points``
        f32[H, W, 3] world hits, ``mask`` bool[H, W]; plus ``normals``
        (TSDF gradient, normalized) and ``colors`` when requested.
        """
        fx, fy = intrinsics[0, 0], intrinsics[1, 1]
        cx, cy = intrinsics[0, 2], intrinsics[1, 2]
        v, u = jnp.mgrid[0:height, 0:width]
        dirs_cam = jnp.stack(
            [
                (u.astype(jnp.float32) - cx) / fx,
                (v.astype(jnp.float32) - cy) / fy,
                jnp.ones((height, width), jnp.float32),
            ],
            axis=-1,
        ).reshape(-1, 3)  # z-normalized: t == camera-space depth
        if extrinsics is not None:
            cam_to_world = jnp.linalg.inv(extrinsics)
            origin = cam_to_world[:3, 3]
            dirs = dirs_cam @ cam_to_world[:3, :3].T
        else:
            origin = jnp.zeros(3, jnp.float32)
            dirs = dirs_cam

        step = 0.5 * self.sdf_truncation_distance
        n_steps = int(np.ceil((self.depth_max - depth_min) / step)) + 1

        def march(carry, i):
            prev_val, prev_valid, hit_t, found = carry
            t = depth_min + i * step
            pts = origin[None] + t * dirs
            val, valid = self.sample_tsdf(pts)
            crossing = (
                prev_valid & valid & (prev_val > 0.0) & (val <= 0.0) & ~found
            )
            # secant refinement between (t - step, prev_val) and (t, val)
            denom = jnp.where(
                jnp.abs(prev_val - val) > 1e-12, prev_val - val, 1.0
            )
            t_hit = (t - step) + step * prev_val / denom
            hit_t = jnp.where(crossing, t_hit, hit_t)
            found = found | crossing
            return (val, valid, hit_t, found), None

        n_rays = dirs.shape[0]
        init = (
            jnp.zeros(n_rays, jnp.float32),
            jnp.zeros(n_rays, bool),
            jnp.zeros(n_rays, jnp.float32),
            jnp.zeros(n_rays, bool),
        )
        (_, _, hit_t, found), _ = jax.lax.scan(
            march, init, jnp.arange(n_steps)
        )
        points = origin[None] + hit_t[:, None] * dirs
        result = {
            "depth": jnp.where(found, hit_t, 0.0).reshape(height, width),
            "points": points.reshape(height, width, 3),
            "mask": found.reshape(height, width),
        }
        if with_normals:
            eps = self.voxel_size
            grads = []
            for axis in range(3):
                off = jnp.zeros(3, jnp.float32).at[axis].set(eps)
                vp, _ = self.sample_tsdf(points + off[None])
                vm, _ = self.sample_tsdf(points - off[None])
                grads.append(vp - vm)
            g = jnp.stack(grads, axis=-1)
            n = g / jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-12)
            result["normals"] = jnp.where(
                found[:, None], n, 0.0
            ).reshape(height, width, 3)
        if with_color:
            c = self.sample_color(points)
            result["colors"] = jnp.where(found[:, None], c, 0.0).reshape(
                height, width, 3
            )
        return result

    def extract_voxel_values_at(
        self, voxel_coords: jnp.ndarray
    ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Probe tsdf/weight at global integer voxel coords int32[N, 3]
        (mirrors ``ExtractVoxelValuesAt`` used by the reference's tests)."""
        r = self.block_resolution
        block = jnp.floor_divide(voxel_coords, r)
        local = voxel_coords - block * r
        slots, found = self.find_block_slots(vbh.pack_block_keys(block))
        t = self.tsdf[slots, local[:, 0], local[:, 1], local[:, 2]]
        w = self.weight[slots, local[:, 0], local[:, 1], local[:, 2]]
        return jnp.where(found, t, 0.0), jnp.where(found, w, 0.0), found


@functools.partial(jax.jit, static_argnames=("v_cap", "t_cap"))
def extract_mesh_fitter_arrays(
    volume: VoxelBlockGrid,
    v_cap: int,
    t_cap: int,
    weight_threshold: jnp.ndarray | float,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Welded canonical mesh padded into the fitter's STATIC-capacity
    arrays as ONE XLA program — no host round trip (the per-op dispatch +
    device->host->device copy of the old numpy padding path cost ~800 ms
    per frame over the remote-TPU tunnel).

    Returns (vertices f32[v_cap, 3], faces i32[t_cap, 3], vertex_count,
    triangle_count). Slot ``v_cap - 1`` is the reserved padding vertex at
    the origin (z=0 -> culled by the rasterizer's near-plane test); padded
    and weld-overflow faces are redirected to it.
    """
    verts, faces, v_count, t_count = volume.extract_triangle_mesh(
        max_triangles=t_cap,
        max_vertices=v_cap - 1,
        weight_threshold=weight_threshold,
    )
    vr = jnp.arange(v_cap - 1, dtype=jnp.int32)
    verts = jnp.where((vr < v_count)[:, None], verts, 0.0)
    vertices = jnp.concatenate(
        [verts, jnp.zeros((1, 3), verts.dtype)], axis=0
    )
    tri_valid = jnp.arange(t_cap, dtype=jnp.int32) < t_count
    faces = jnp.clip(faces, 0, v_cap - 1)
    # padded rows and any weld-overflow index past the real vertex count
    # both point at the reserved vertex
    overflow = faces >= jnp.minimum(v_count, v_cap - 1)
    faces = jnp.where(
        tri_valid[:, None] & ~overflow, faces, v_cap - 1
    ).astype(jnp.int32)
    # marching tetrahedra emit ~4x sliver triangles whose edge crossings
    # weld to the same vertex (measured 75% of faces on a TSDF plane);
    # drop every face with a repeated welded index and compact the rest to
    # the front — the fitter/rasterizer then see only real surface area
    degenerate = (
        (faces[:, 0] == faces[:, 1])
        | (faces[:, 1] == faces[:, 2])
        | (faces[:, 0] == faces[:, 2])
    )
    from dynamicfuion_python_tpu.ops.compaction import compact_mask_indices

    keep = tri_valid & ~degenerate
    keep_ids, kept_count = compact_mask_indices(keep, t_cap, fill_value=t_cap)
    faces = jnp.where(
        (jnp.arange(t_cap) < kept_count)[:, None],
        faces[jnp.minimum(keep_ids, t_cap - 1)],
        v_cap - 1,
    )
    return vertices, faces, v_count, kept_count
