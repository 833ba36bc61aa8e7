"""Warp-anchor computation: K nearest nodes + Gaussian coverage weights.

Capability parity with the reference's
``cpp/geometry/functional/WarpAnchorComputation.h`` /
``kernel/WarpAnchorComputationImpl.h`` and the per-point device routines in
``kernel/WarpUtilities.h:33-190``:

  - Euclidean K-NN anchor selection over warp-field nodes;
  - weight w_k = exp(-d_k^2 / (2 * coverage^2)), where coverage is either the
    global ``node_coverage`` (FIXED) or a per-node value (VARIABLE, typically
    distance to the k-th nearest other node);
  - optional distance threshold: anchors with d > 2 * coverage are dropped
    (index -1), and a point with fewer than ``minimum_valid_anchor_count``
    surviving anchors is marked invalid (``WarpUtilities.h:117``);
  - normalization by the weight sum (uniform fallback when the sum
    underflows, ``NormalizeAnchorWeights``, ``WarpUtilities.h:33-45``).

The shortest-path (geodesic) variant lives with graph construction
(host-side; see ``ops/graph_construction.py``) since it is only used at
graph build.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from dynamicfuion_python_tpu.ops.knn import knn


@functools.partial(
    jax.jit,
    static_argnames=("anchor_count", "minimum_valid_anchor_count", "use_threshold"),
)
def compute_anchors_euclidean(
    points: jnp.ndarray,
    nodes: jnp.ndarray,
    anchor_count: int,
    node_coverage: jnp.ndarray | float | None = None,
    node_coverage_squared: jnp.ndarray | None = None,
    minimum_valid_anchor_count: int = 0,
    use_threshold: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Compute K-NN anchors and normalized Gaussian weights for each point.

    Args:
      points: f32[..., 3].
      nodes: f32[N, 3] warp-field node positions.
      anchor_count: K (reference default 4).
      node_coverage: scalar sigma for FIXED coverage weighting. Exactly one of
        ``node_coverage`` / ``node_coverage_squared`` must be given.
      node_coverage_squared: f32[N] per-node sigma^2 for VARIABLE coverage.
      minimum_valid_anchor_count: with ``use_threshold``, points with fewer
        valid anchors are flagged invalid (all anchors -1, weights 0).
      use_threshold: drop anchors farther than 2 * coverage.

    Returns:
      anchors int32[..., K] (-1 = invalid slot),
      weights f32[..., K] (normalized; 0 on invalid slots),
      valid bool[...] (False only when thresholding invalidates the point).
    """
    if (node_coverage is None) == (node_coverage_squared is None):
        raise ValueError("pass exactly one of node_coverage / node_coverage_squared")

    d2, idx = knn(points, nodes, anchor_count)

    if node_coverage_squared is None:
        cov_sq = jnp.broadcast_to(
            jnp.asarray(node_coverage, jnp.float32) ** 2, d2.shape
        )
    else:
        cov_sq = node_coverage_squared[idx]

    weights = jnp.exp(-d2 / (2.0 * cov_sq))

    if use_threshold:
        # reference: square_distance > 4 * coverage^2  =>  drop anchor
        keep = d2 <= 4.0 * cov_sq
        idx = jnp.where(keep, idx, -1)
        weights = jnp.where(keep, weights, 0.0)
        valid = jnp.sum(keep, axis=-1) >= minimum_valid_anchor_count
        idx = jnp.where(valid[..., None], idx, -1)
        weights = jnp.where(valid[..., None], weights, 0.0)
    else:
        valid = jnp.ones(d2.shape[:-1], bool)

    weight_sum = jnp.sum(weights, axis=-1, keepdims=True)
    valid_slots = idx >= 0
    valid_counts = jnp.sum(valid_slots, axis=-1, keepdims=True)
    uniform = jnp.where(valid_slots, 1.0 / jnp.maximum(valid_counts, 1), 0.0)
    weights = jnp.where(weight_sum > 0.0, weights / jnp.maximum(weight_sum, 1e-30), uniform)
    return idx, weights, valid
