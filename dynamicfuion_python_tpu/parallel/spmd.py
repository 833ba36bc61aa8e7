"""SPMD sharding of the fusion workload over a device mesh.

The reference is strictly single-GPU (SURVEY.md §2.5); this module is the
greenfield scaling layer (§5.8): the "long context" axis of this workload is
*scene/image space*, so parallelism is spatial —

  - pixel rows of the observed frame shard over the mesh ("space" axis):
    each device rasterizes + assembles normal-equation contributions for its
    rows; the 6x6-block Hessian/gradient reduction becomes an XLA all-reduce
    over ICI (the GSPMD partitioner inserts it from the shardings — the
    collective-based GN reduction of BASELINE.json's north star);
  - TSDF voxel blocks shard over the same axis by table slot for
    integration;
  - warp-field state (small: N nodes x 12 floats) stays replicated, exactly
    like the reference keeps it resident on the single GPU.

Everything rides `jax.sharding.NamedSharding` + jit sharding propagation —
no hand-written collectives; XLA emits psum/reduce-scatter on ICI.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SPACE_AXIS = "space"


def fusion_mesh(n_devices: int | None = None) -> Mesh:
    """1D device mesh over the spatial-parallel axis."""
    devices = jax.devices()
    n = n_devices or len(devices)
    if len(devices) < n:
        raise ValueError(
            f"requested {n} devices but only {len(devices)} available"
        )
    return Mesh(devices[:n], (SPACE_AXIS,))


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_pixel_rows(tree, mesh: Mesh):
    """Shard [H, ...] image arrays along rows."""
    sharding = NamedSharding(mesh, P(SPACE_AXIS))
    return jax.device_put(tree, sharding)


def shard_blocks(volume, mesh: Mesh):
    """Shard the voxel block table along the slot axis; the key index stays
    replicated (it is small and read-heavy)."""
    slot = NamedSharding(mesh, P(SPACE_AXIS))
    rep = NamedSharding(mesh, P())
    return volume.replace(
        tsdf=jax.device_put(volume.tsdf, slot),
        weight=jax.device_put(volume.weight, slot),
        color=jax.device_put(volume.color, slot),
        slot_keys=jax.device_put(volume.slot_keys, rep),
        sorted_keys=jax.device_put(volume.sorted_keys, rep),
        slot_of_sorted=jax.device_put(volume.slot_of_sorted, rep),
    )


def distributed_fit_step(
    field,
    canonical_vertices,
    canonical_triangles,
    reference_points,
    reference_mask,
    intrinsics,
    config,
    mode,
    mesh: Mesh,
):
    """One Gauss-Newton step with pixel rows sharded over the mesh.

    The per-pixel jacobian work partitions across devices; the
    segment-summed H/g assembly and the arrowhead solve replicate via the
    collectives GSPMD inserts.
    """
    from dynamicfuion_python_tpu.models.fitter import (
        _gauss_newton_step,
        precompute_face_associations,
    )
    from dynamicfuion_python_tpu.ops.normals import mesh_vertex_normals

    pre = precompute_face_associations(field, canonical_vertices, canonical_triangles)
    normals = mesh_vertex_normals(canonical_vertices, canonical_triangles)

    max_deg = max(
        1,
        min(
            4,
            field.layer_node_counts[1]
            if len(field.layer_node_counts) > 1
            else 1,
        ),
    )

    field_r = replicate(field, mesh)
    args_r = replicate(
        (canonical_vertices, canonical_triangles, normals, pre, intrinsics), mesh
    )
    ref_pts = shard_pixel_rows(reference_points, mesh)
    ref_mask = shard_pixel_rows(reference_mask, mesh)

    new_field, data_loss, arap_loss, valid_solve, _max_update, _cap_kept = _gauss_newton_step(
        field_r,
        args_r[0],
        args_r[1],
        args_r[2],
        args_r[3],
        ref_pts,
        ref_mask,
        args_r[4],
        config,
        mode,
        max_deg,
    )
    return new_field, data_loss, arap_loss, valid_solve
