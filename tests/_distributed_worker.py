"""Worker process for the 2-process multi-host CPU test.

Each process owns 2 virtual CPU devices; the two processes form one global
4-device mesh [hosts=2, space=2]. Every process feeds only its own half of
the observed frame rows (the multi-host ingestion contract of
``parallel/distributed.py``), runs one global sharded GN step, and process 0
writes the (replicated) outputs for the parent test to compare against the
single-process oracle.

Usage: python tests/_distributed_worker.py <coordinator> <pid> <out_npz>
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)

import numpy as np


def main():
    coordinator, pid, out_path = sys.argv[1], int(sys.argv[2]), sys.argv[3]

    from dynamicfuion_python_tpu.parallel import distributed

    distributed.initialize(
        coordinator_address=coordinator, num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, len(jax.devices())

    from __graft_entry__ import _tiny_problem
    from dynamicfuion_python_tpu.models.fitter import (
        FitterConfig,
        IterationMode,
    )

    field, verts, tris, ref_pts, ref_mask, intr = _tiny_problem(
        image_size=(64, 32)
    )
    config = FitterConfig(max_iterations=1, use_regularization=True)

    mesh = distributed.global_fusion_mesh()
    h = ref_pts.shape[0]
    lo, hi = pid * h // 2, (pid + 1) * h // 2
    local_pts = np.asarray(ref_pts)[lo:hi]
    local_mask = np.asarray(ref_mask)[lo:hi]

    new_field, data_loss, arap_loss, _valid, _max_upd, _cap_kept = distributed.distributed_fit_step_global(
        field,
        verts,
        tris,
        local_pts,
        local_mask,
        intr,
        config,
        IterationMode.ALL,
        mesh,
    )

    from jax.experimental import multihost_utils

    translations = multihost_utils.process_allgather(
        new_field.node_translations, tiled=True
    )
    d = float(multihost_utils.process_allgather(data_loss, tiled=True))
    if pid == 0:
        np.savez(
            out_path,
            node_translations=np.asarray(translations),
            data_loss=d,
        )
    multihost_utils.sync_global_devices("done")


if __name__ == "__main__":
    main()
