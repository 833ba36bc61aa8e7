"""Brute-force K-nearest-neighbor search, tiled for TPU.

Replaces the reference's KD-tree + device-heap KNN stack
(``cpp/core/KdTree.h:27``, ``cpp/core/kernel/SearchKdTreeImpl.h``,
``cpp/core/heap/DeviceHeap.h``): for the node counts this pipeline uses
(10^2..10^4 nodes), a tiled distance-matrix + top-k on the MXU beats a
pointer-chasing tree traversal on TPU by orders of magnitude, and is exact.

Queries are processed in static-size chunks via ``lax.map`` so the peak
memory is O(chunk * N) instead of O(M * N).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def squared_distance_matrix(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """[M,3] x [N,3] -> [M,N] squared Euclidean distances.

    Mirrors ``cpp/geometry/functional/ComputeDistanceMatrix.h`` (which returns
    non-squared distances; take sqrt at the caller when needed). Uses the
    |a|^2 + |b|^2 - 2ab expansion so the bulk lands on the MXU.
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    aa = jnp.sum(a * a, axis=-1, keepdims=True)
    bb = jnp.sum(b * b, axis=-1, keepdims=True)
    cross = jnp.matmul(a, b.T, precision=jax.lax.Precision.HIGHEST)
    return jnp.maximum(aa + bb.T - 2.0 * cross, 0.0)


@functools.partial(jax.jit, static_argnames=("k", "chunk_size"))
def knn(
    queries: jnp.ndarray,
    references: jnp.ndarray,
    k: int,
    chunk_size: int = 4096,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact K nearest references for each query point.

    Args:
      queries: f32[M, 3] (any leading shape is flattened and restored).
      references: f32[N, 3].
      k: number of neighbors.
      chunk_size: query tile size (static). Peak memory ~ chunk_size * N.

    Returns:
      (squared_distances f32[M, k], indices int32[M, k]) sorted ascending.
    """
    lead_shape = queries.shape[:-1]
    flat = queries.reshape(-1, queries.shape[-1])
    m = flat.shape[0]
    n = references.shape[0]
    k = min(k, n)

    # small reference set (warp-field nodes): one dense [M, N] distance
    # matrix + k argmin/mask passes. Avoids both the sequential
    # ``lax.map`` over query chunks and ``lax.top_k``'s sort lowering —
    # ~10x faster on TPU for the volume-integration anchor workload
    # (131k queries x ~64 nodes). Gated on the MATERIALIZED matrix budget
    # (M*N*(k+1) f32 live at the peak — the working copy plus the k
    # stacked min passes), not on N alone: 131k queries x 2048 refs would
    # otherwise burn ~1 GB per masked-argmin pass (ADVICE r4 #5)
    dense_budget_elems = 64 << 20  # 256 MB of f32
    if n <= 2048 and m * n * (k + 1) <= dense_budget_elems:
        d2 = squared_distance_matrix(flat, references)
        cols = jnp.arange(n, dtype=jnp.int32)
        vals, idxs = [], []
        work = d2
        for _ in range(k):
            i = jnp.argmin(work, axis=1).astype(jnp.int32)
            hit = cols[None, :] == i[:, None]
            v = jnp.min(work, axis=1)
            vals.append(v)
            idxs.append(i)
            work = jnp.where(hit, jnp.inf, work)
        dists = jnp.stack(vals, axis=-1)
        indices = jnp.stack(idxs, axis=-1)
        return (
            dists.reshape(*lead_shape, k),
            indices.reshape(*lead_shape, k),
        )

    pad = (-m) % chunk_size
    padded = jnp.concatenate(
        [flat, jnp.full((pad, flat.shape[-1]), 1e30, flat.dtype)], axis=0
    )
    chunks = padded.reshape(-1, chunk_size, flat.shape[-1])

    def one_chunk(chunk):
        d2 = squared_distance_matrix(chunk, references)
        neg, idx = jax.lax.top_k(-d2, k)
        return -neg, idx.astype(jnp.int32)

    dists, indices = jax.lax.map(one_chunk, chunks)
    dists = dists.reshape(-1, k)[:m].reshape(*lead_shape, k)
    indices = indices.reshape(-1, k)[:m].reshape(*lead_shape, k)
    return dists, indices
