"""Barycentric interpolation of face-vertex attributes over fragments.

Capability parity with ``cpp/rendering/functional/InterpolateVertexAttributes.h``
(``kernel/InterpolateFaceAttributesImpl.h``): per-pixel, per-fragment
barycentric-weighted blend of per-face-vertex attributes (normals at
``DeformableMeshToImageFitter.cpp:354-357``, colors for debug shading).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def interpolate_face_attributes(
    face_indices: jnp.ndarray,
    barycentrics: jnp.ndarray,
    face_attributes: jnp.ndarray,
) -> jnp.ndarray:
    """Blend per-face-vertex attributes with fragment barycentrics.

    Args:
      face_indices: int32[H, W, K] fragment face ids (-1 = empty).
      barycentrics: f32[H, W, K, 3].
      face_attributes: f32[F, 3, C] attribute per face vertex.

    Returns f32[H, W, K, C]; zeros on empty fragments.
    """
    safe = jnp.maximum(face_indices, 0)
    attrs = face_attributes[safe]  # [H, W, K, 3, C]
    out = jnp.einsum(
        "...kv,...kvc->...kc",
        barycentrics,
        attrs,
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.where((face_indices >= 0)[..., None], out, 0.0)


def vertex_attributes_to_face(
    attributes: jnp.ndarray, triangles: jnp.ndarray
) -> jnp.ndarray:
    """f32[V, C] per-vertex attributes -> f32[F, 3, C] per-face-vertex."""
    return attributes[triangles]
