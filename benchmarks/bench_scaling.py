"""Scaling report for the spatially-sharded GN fit step (BASELINE.md north
star: "scaling efficiency reported at 1 chip, 1 host, and N >= 2 hosts").

Measures the sharded Gauss-Newton step (pixel rows over the mesh's "space"
axis; H/g assembly reduced with XLA-inserted collectives) at 1/2/4/8 devices
on a virtual CPU mesh, checks every device count against the 1-device
oracle, and writes ``SCALING.md``.

Honest caveat, stated in the report: only ONE real TPU chip is reachable in
this environment, so multi-device rows run on `--xla_force_host_platform_
device_count` virtual CPU devices that SHARE host cores — wall-clock there
validates the sharding/collective structure, not ICI speedup. Real-chip
single-device numbers come from BENCH.md. The >= 2-host path is exercised by
``tests/test_parallel.py::TestMultiHost`` (two OS processes, one global
mesh, bit-equal with the single-process oracle).

Usage: python benchmarks/bench_scaling.py [--sizes 1 2 4 8] [--out SCALING.md]
Each device count runs in a subprocess (device count must be fixed before
the JAX backend initializes).
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
from pathlib import Path

WORKER = r"""
import json, sys, time
import jax

n = int(sys.argv[1])
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", n)

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, sys.argv[2])
from __graft_entry__ import _tiny_problem
from dynamicfuion_python_tpu.models.fitter import FitterConfig, IterationMode
from dynamicfuion_python_tpu.parallel.spmd import distributed_fit_step, fusion_mesh

# a production-scale frame: 480x640 observation, 33x33 surface grid
field, verts, tris, ref_pts, ref_mask, intr = _tiny_problem(
    image_size=(480, 640), mesh_n=33
)
config = FitterConfig(max_iterations=1, use_regularization=True)
mesh = fusion_mesh(n)

def step():
    return distributed_fit_step(
        field, verts, tris, ref_pts, ref_mask, intr, config,
        IterationMode.ALL, mesh,
    )

out = step()
jax.block_until_ready(out)
iters = 5
t0 = time.perf_counter()
for _ in range(iters):
    out = step()
jax.block_until_ready(out)
dt_ms = (time.perf_counter() - t0) / iters * 1e3
new_field, data_loss, arap_loss = out
print(json.dumps({
    "n": n,
    "step_ms": round(dt_ms, 2),
    "rows_per_device": ref_pts.shape[0] // n,
    "data_loss": float(data_loss),
    "translation_sum": float(jnp.abs(new_field.node_translations).sum()),
}))
"""


def run_size(n: int, repo: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", WORKER, str(n), repo],
        capture_output=True, text=True, timeout=1200,
    )
    if out.returncode != 0:
        raise RuntimeError(f"n={n} failed:\n{out.stderr[-3000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--sizes", type=int, nargs="+", default=[1, 2, 4, 8])
    parser.add_argument("--out", default="SCALING.md")
    args = parser.parse_args()
    repo = str(Path(__file__).resolve().parent.parent)

    rows = []
    for n in args.sizes:
        r = run_size(n, repo)
        rows.append(r)
        print(r, file=sys.stderr)

    oracle = rows[0]
    for r in rows[1:]:
        # every device count must solve the same system (parity gate)
        rel = abs(r["translation_sum"] - oracle["translation_sum"]) / max(
            oracle["translation_sum"], 1e-12
        )
        assert rel < 1e-3, (r, oracle)

    lines = [
        "# SCALING report (sharded GN fit step)",
        "",
        "One real TPU chip is reachable here; rows below are an"
        " `xla_force_host_platform_device_count` virtual CPU mesh whose"
        " devices SHARE host cores — they validate the sharding +"
        " collective structure and per-device work partitioning (rows/"
        "device), not ICI wall-clock speedup. Real-chip single-device"
        " numbers live in BENCH.md; the >= 2-host (multi-process) path is"
        " validated bit-exact by tests/test_parallel.py::TestMultiHost.",
        "",
        "Problem: 480x640 observed frame, 33x33-vertex surface, "
        "hierarchical warp field; one GN step (AD Jacobians + segment-sum"
        " H/g assembly + arrowhead solve). Pixel rows shard over the mesh;"
        " the assembly reduction is an XLA-inserted collective.",
        "",
        "| devices | rows/device | step ms (virtual CPU mesh) | parity vs 1-dev |",
        "|---|---|---|---|",
    ]
    for r in rows:
        rel = abs(r["translation_sum"] - oracle["translation_sum"]) / max(
            oracle["translation_sum"], 1e-12
        )
        lines.append(
            f"| {r['n']} | {r['rows_per_device']} | {r['step_ms']} | "
            f"{rel:.2e} |"
        )
    Path(args.out).write_text("\n".join(lines) + "\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
