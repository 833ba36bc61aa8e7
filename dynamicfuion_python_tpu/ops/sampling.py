"""Grid-based point downsampling with static-shape compaction.

Capability parity with the reference's
``cpp/geometry/functional/GeometrySampling.h:32-54``: mean-grid downsampling
(average of points per occupied grid cell) and "median"-grid subsampling
(index of the point closest to its cell's mean — used to pick hierarchy-layer
nodes, ``HierarchicalGraphWarpField.cpp:90-94``).

TPU-native design: the CUDA version uses hash maps + atomics; here occupied
cells are discovered by sort + head-flag compaction with **static output
capacity** (= input size), returning padded arrays plus a valid count — the
standard XLA replacement for dynamic allocation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

#: padding value for unused output slots (plain Python float — a module-level
#: jnp scalar would initialize the device backend at import time)
PAD_VALUE = float("nan")


def _cell_ids(points: jnp.ndarray, cell_size: float) -> jnp.ndarray:
    """Quantize points to flat grid-cell ids (collision-free within extent)."""
    mins = jnp.min(points, axis=0)
    cells = jnp.floor((points - mins) / cell_size).astype(jnp.int32)
    extent = jnp.max(cells, axis=0) + 1
    return (cells[:, 0] * extent[1] + cells[:, 1]) * extent[2] + cells[:, 2]


def _segment_layout(ids: jnp.ndarray):
    """Sort ids; return (order, segment index per sorted element, #segments)."""
    order = jnp.argsort(ids)
    sorted_ids = ids[order]
    heads = jnp.concatenate(
        [jnp.ones((1,), jnp.int32), (sorted_ids[1:] != sorted_ids[:-1]).astype(jnp.int32)]
    )
    seg = jnp.cumsum(heads) - 1
    return order, seg, seg[-1] + 1


@functools.partial(jax.jit, static_argnames=("cell_size",))
def mean_grid_downsample(
    points: jnp.ndarray, cell_size: float
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Average points per occupied cell.

    Returns (f32[N, 3] padded with NaN beyond ``count``, count int32).
    Occupied-cell order follows ascending cell id (deterministic).
    """
    n = points.shape[0]
    order, seg, count = _segment_layout(_cell_ids(points, cell_size))
    sorted_points = points[order]
    sums = jax.ops.segment_sum(sorted_points, seg, num_segments=n)
    nums = jax.ops.segment_sum(jnp.ones((n,), points.dtype), seg, num_segments=n)
    means = sums / jnp.maximum(nums, 1.0)[:, None]
    valid = jnp.arange(n) < count
    return jnp.where(valid[:, None], means, PAD_VALUE), count


@functools.partial(jax.jit, static_argnames=("cell_size",))
def median_grid_subsample(
    points: jnp.ndarray, cell_size: float
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pick, per occupied cell, the index of the input point closest to the
    cell mean ("closest-to-mean grid subsample", the reference's hierarchy
    decimation primitive). Returns (int32[N] padded with -1, count).
    """
    n = points.shape[0]
    order, seg, count = _segment_layout(_cell_ids(points, cell_size))
    sorted_points = points[order]
    sums = jax.ops.segment_sum(sorted_points, seg, num_segments=n)
    nums = jax.ops.segment_sum(jnp.ones((n,), points.dtype), seg, num_segments=n)
    means = sums / jnp.maximum(nums, 1.0)[:, None]
    d2 = jnp.sum((sorted_points - means[seg]) ** 2, axis=-1)
    best = jax.ops.segment_min(d2, seg, num_segments=n)
    # first sorted element matching its segment's min distance wins
    is_best = d2 <= best[seg] + 0.0
    pos = jnp.arange(n)
    first_best = jax.ops.segment_min(
        jnp.where(is_best, pos, n), seg, num_segments=n
    )
    indices = jnp.where(
        jnp.arange(n) < count, order[jnp.minimum(first_best, n - 1)], -1
    ).astype(jnp.int32)
    return indices, count
