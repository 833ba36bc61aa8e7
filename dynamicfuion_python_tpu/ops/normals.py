"""Normal computation for point images and triangle meshes.

Capability parity with the reference's
``image_processing/numba_cuda/preprocessing.py:9-48`` (`cuda_compute_normal`:
central-difference cross-product normals on a vertex map, flipped toward the
camera) and ``cpp/geometry/functional/NormalsOperations.h``
(mesh vertex/triangle normals).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _normalize(v: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    norm = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v / jnp.maximum(norm, eps)


def point_image_normals(vertex_map: jnp.ndarray) -> jnp.ndarray:
    """Central-difference normals of a camera-space point image.

    n = normalize(cross(right - left, up - down)), flipped so n_z <= 0
    (facing the camera); zero at the border and wherever any of the four
    neighbors has z == 0 (missing depth). Matches the reference kernel
    exactly (``preprocessing.py:9-38``).
    """
    h, w = vertex_map.shape[:2]
    padded = jnp.zeros((h + 2, w + 2, 3), vertex_map.dtype)
    padded = padded.at[1:-1, 1:-1].set(vertex_map)
    left = padded[1:-1, :-2]
    right = padded[1:-1, 2:]
    up = padded[:-2, 1:-1]
    down = padded[2:, 1:-1]
    hor = right - left
    ver = up - down
    n = _normalize(jnp.cross(hor, ver))
    n = jnp.where(n[..., 2:3] > 0, -n, n)
    invalid = (
        (left[..., 2] == 0)
        | (right[..., 2] == 0)
        | (up[..., 2] == 0)
        | (down[..., 2] == 0)
    )
    # border pixels read zero-padding -> neighbor z == 0 -> already invalid
    return jnp.where(invalid[..., None], 0.0, n)


def triangle_normals(
    vertices: jnp.ndarray, triangles: jnp.ndarray, normalized: bool = True
) -> jnp.ndarray:
    """Per-face normals; un-normalized value is the area-weighted face normal."""
    v0 = vertices[triangles[:, 0]]
    v1 = vertices[triangles[:, 1]]
    v2 = vertices[triangles[:, 2]]
    n = jnp.cross(v1 - v0, v2 - v0)
    return _normalize(n) if normalized else n


def mesh_vertex_normals(vertices: jnp.ndarray, triangles: jnp.ndarray) -> jnp.ndarray:
    """Area-weighted vertex normals (reference ``ComputeVertexNormals``)."""
    face_n = triangle_normals(vertices, triangles, normalized=False)
    n = jnp.zeros_like(vertices)
    for corner in range(3):
        n = n.at[triangles[:, corner]].add(face_n)
    return _normalize(n)
