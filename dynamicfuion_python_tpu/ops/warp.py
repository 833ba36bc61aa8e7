"""Point / normal warping by an embedded-deformation (graph) warp field.

Capability parity with the reference's blend kernels
(``cpp/geometry/functional/kernel/WarpUtilities.h:429-467`` ``BlendWarp``;
``Warping.cpp``, ``kernel/Warp3dPointsAndNormalsImpl.h``):

  warped_point  = sum_k w_k * (p_k + R_k (x - p_k) + t_k)
  warped_normal = sum_k w_k * (R_k n)

with anchor slots of index -1 contributing nothing. Everything is batched
jnp — the per-point loop over <=4 anchors becomes one gather + einsum, which
XLA fuses into a single pass over HBM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_P = jax.lax.Precision.HIGHEST


def blend_warp(
    points: jnp.ndarray,
    nodes: jnp.ndarray,
    node_rotations: jnp.ndarray,
    node_translations: jnp.ndarray,
    anchors: jnp.ndarray,
    weights: jnp.ndarray,
    normals: jnp.ndarray | None = None,
) -> jnp.ndarray | tuple[jnp.ndarray, jnp.ndarray]:
    """Warp points (and optionally normals) by blended node transforms.

    Args:
      points: f32[..., 3].
      nodes: f32[N, 3]; node_rotations: f32[N, 3, 3]; node_translations: f32[N, 3].
      anchors: int32[..., K] node indices (-1 = skip).
      weights: f32[..., K] normalized anchor weights.
      normals: optional f32[..., 3].

    Returns warped points (and warped normals when given). Points whose
    anchors are all invalid come back as zeros (weights are all zero), which
    matches the reference's accumulate-from-zero semantics.
    """
    safe = jnp.maximum(anchors, 0)
    w = jnp.where(anchors >= 0, weights, 0.0)  # [..., K]
    anchor_nodes = nodes[safe]  # [..., K, 3]
    rot = node_rotations[safe]  # [..., K, 3, 3]
    trans = node_translations[safe]  # [..., K, 3]
    offset = points[..., None, :] - anchor_nodes  # [..., K, 3]
    rotated = jnp.einsum("...kab,...kb->...ka", rot, offset, precision=_P)
    contrib = anchor_nodes + rotated + trans
    warped = jnp.einsum("...k,...ka->...a", w, contrib, precision=_P)
    if normals is None:
        return warped
    rotated_n = jnp.einsum(
        "...kab,...b->...ka", rot, normals, precision=_P
    )
    warped_n = jnp.einsum("...k,...ka->...a", w, rotated_n, precision=_P)
    return warped, warped_n
