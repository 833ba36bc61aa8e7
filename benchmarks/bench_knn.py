"""KNN benchmark: 1M queries / 10k references / k=8.

Mirrors the reference's KD-tree benchmark harness
(``cpp/bench/kdtree_benchmark.cpp:21-45``: 1M queries, 10k reference points,
k=8, averaged over 10 runs — brute-force vs KD-tree). Our TPU design replaces
the pointer-chasing KD-tree with a tiled brute-force distance-matrix top-k on
the MXU (``ops/knn.py``), so there is one production path to time.

Run: python benchmarks/bench_knn.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    from dynamicfuion_python_tpu.ops.knn import knn

    rng = np.random.default_rng(0)
    n_query, n_ref, k, runs = 1_000_000, 10_000, 8, 10
    queries = jnp.asarray(rng.uniform(-1, 1, (n_query, 3)).astype(np.float32))
    refs = jnp.asarray(rng.uniform(-1, 1, (n_ref, 3)).astype(np.float32))

    jknn = jax.jit(lambda q, r: knn(q, r, k=k))
    dist, idx = jax.block_until_ready(jknn(queries, refs))

    # correctness spot-check against numpy on a slice
    q_np, r_np = np.asarray(queries[:64]), np.asarray(refs)
    d2 = ((q_np[:, None] - r_np[None]) ** 2).sum(-1)
    want = np.sort(d2, 1)[:, :k]
    got = np.sort(np.asarray(dist[:64]), 1)  # knn returns squared distances
    assert np.allclose(got, want, atol=1e-4), "knn mismatch vs numpy oracle"

    t0 = time.perf_counter()
    for _ in range(runs):
        out = jknn(queries, refs)
    jax.block_until_ready(out)
    dt_ms = (time.perf_counter() - t0) / runs * 1e3
    rate = n_query / (dt_ms * 1e-3)
    print(
        f"knn {n_query / 1e6:.0f}M queries x {n_ref / 1e3:.0f}k refs, k={k}: "
        f"{dt_ms:.2f} ms/run ({rate / 1e9:.2f} B queries/s)",
        file=sys.stderr,
    )
    print(f"{dt_ms:.4f}")


if __name__ == "__main__":
    main()
