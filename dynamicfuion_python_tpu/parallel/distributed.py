"""Multi-host (multi-process) scaling entry points.

The reference is strictly single-GPU (SURVEY.md §2.5); this is the
greenfield multi-host half of the scaling layer (§5.8, BASELINE.md north
star: "scaling efficiency reported at 1 chip, 1 host, and N >= 2 hosts").

Design (the standard JAX multi-controller recipe):
  - every host runs the SAME program; ``initialize()`` wires the processes
    into one runtime via ``jax.distributed.initialize`` (coordinator
    address + process count + process id, or automatic detection under TPU
    pod metadata);
  - a single global ``Mesh`` spans all processes' devices
    (``jax.devices()`` is global after initialization); shardings are
    expressed exactly as in the single-host SPMD layer
    (``parallel/spmd.py``) — GSPMD inserts ICI collectives within a host
    slice and DCN collectives across hosts;
  - per-host input frames become global arrays with
    ``jax.make_array_from_process_local_data`` — each host feeds only the
    pixel rows it owns, so frame IO scales with host count;
  - the mesh axis order puts the across-host ("dcn") axis OUTERMOST so the
    heavy per-pixel reduction rides ICI inside each host and only the small
    6x6-block H/g partials cross DCN (scaling-book layout rule).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dynamicfuion_python_tpu.parallel.spmd import SPACE_AXIS

DCN_AXIS = "hosts"


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Join this process into the multi-host runtime.

    With no arguments, relies on cluster auto-detection (TPU pod metadata /
    SLURM); on explicit args, wires a manual cluster (used by the 2-process
    CPU test). Safe to call once per process, before any backend use.
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_fusion_mesh() -> Mesh:
    """2D global mesh [hosts, space]: across-host axis outermost (DCN),
    per-host devices innermost (ICI)."""
    n_proc = jax.process_count()
    devices = np.asarray(jax.devices())
    per_host = len(devices) // n_proc
    return Mesh(
        devices.reshape(n_proc, per_host), (DCN_AXIS, SPACE_AXIS)
    )


def row_sharding(mesh: Mesh) -> NamedSharding:
    """Pixel rows sharded over BOTH axes (hosts x per-host devices)."""
    return NamedSharding(mesh, P((DCN_AXIS, SPACE_AXIS)))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def global_rows_from_local(local_rows: np.ndarray, mesh: Mesh):
    """Assemble a global row-sharded array from this process's row slab.

    ``local_rows`` is the [H / process_count, ...] slab this host observed
    (e.g. its share of a depth frame); the result is a global [H, ...] array
    sharded row-wise over the whole mesh.
    """
    return jax.make_array_from_process_local_data(
        row_sharding(mesh), np.asarray(local_rows)
    )


def replicate_from_host(tree, mesh: Mesh):
    """Replicate host-0-identical data (warp field, mesh, intrinsics) onto
    every device of the global mesh."""
    sharding = replicated(mesh)

    def put(x):
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(x)
        )

    return jax.tree.map(put, tree)


def distributed_fit_step_global(
    field,
    canonical_vertices,
    canonical_triangles,
    local_reference_points: np.ndarray,
    local_reference_mask: np.ndarray,
    intrinsics,
    config,
    mode,
    mesh: Mesh,
):
    """One GN step over the global mesh, fed with per-host row slabs.

    Mirrors ``parallel.spmd.distributed_fit_step`` but every input becomes a
    global array: the observed frame rows arrive pre-split per host, the
    field/mesh replicate. Works unchanged on 1 process (then it is exactly
    the single-host SPMD path).
    """
    from dynamicfuion_python_tpu.models.fitter import (
        _gauss_newton_step,
        _max_wing_degree,
        precompute_face_associations,
    )
    from dynamicfuion_python_tpu.ops.normals import mesh_vertex_normals

    pre = precompute_face_associations(
        field, canonical_vertices, canonical_triangles
    )
    normals = mesh_vertex_normals(canonical_vertices, canonical_triangles)

    field_r = replicate_from_host(field, mesh)
    verts_r, tris_r, normals_r, pre_r, intr_r = replicate_from_host(
        (canonical_vertices, canonical_triangles, normals, pre, intrinsics),
        mesh,
    )
    ref_pts = global_rows_from_local(local_reference_points, mesh)
    ref_mask = global_rows_from_local(local_reference_mask, mesh)

    return _gauss_newton_step(
        field_r,
        verts_r,
        tris_r,
        normals_r,
        pre_r,
        ref_pts,
        ref_mask,
        intr_r,
        config,
        mode,
        _max_wing_degree(field),
    )
