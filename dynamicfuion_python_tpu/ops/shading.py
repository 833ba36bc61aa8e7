"""Debug shaders over rasterizer fragments.

Capability parity with ``cpp/rendering/{FlatEdgeShader,VertexColorShader}``
(used by the reference's tests and visual debugging): render Fragments to
RGB via per-pixel barycentric attribute interpolation, optionally
highlighting triangle edges, plus a simple Lambertian normal shader for
telemetry images.
"""

from __future__ import annotations

import jax.numpy as jnp

from dynamicfuion_python_tpu.ops.interpolate import (
    interpolate_face_attributes,
    vertex_attributes_to_face,
)
from dynamicfuion_python_tpu.ops.rasterize import Fragments


def vertex_color_shader(
    fragments: Fragments,
    vertex_colors: jnp.ndarray,
    triangles: jnp.ndarray,
    background=(1.0, 1.0, 1.0),
) -> jnp.ndarray:
    """Barycentric-interpolated vertex colors of the nearest fragment."""
    face_attrs = vertex_attributes_to_face(vertex_colors, triangles)
    colors = interpolate_face_attributes(
        fragments.face_indices[..., :1],
        fragments.barycentrics[..., :1, :],
        face_attrs,
    )[..., 0, :]
    hit = fragments.face_indices[..., 0] >= 0
    bg = jnp.asarray(background, jnp.float32)
    return jnp.where(hit[..., None], colors, bg)


def flat_edge_shader(
    fragments: Fragments,
    face_color=(0.8, 0.8, 0.8),
    edge_color=(0.0, 0.0, 0.0),
    edge_width_barycentric: float = 0.05,
    background=(1.0, 1.0, 1.0),
) -> jnp.ndarray:
    """Flat fill with dark triangle edges (min barycentric < threshold)."""
    hit = fragments.face_indices[..., 0] >= 0
    min_bary = jnp.min(fragments.barycentrics[..., 0, :], axis=-1)
    on_edge = min_bary < edge_width_barycentric
    fc = jnp.asarray(face_color, jnp.float32)
    ec = jnp.asarray(edge_color, jnp.float32)
    bg = jnp.asarray(background, jnp.float32)
    color = jnp.where(on_edge[..., None], ec, fc)
    return jnp.where(hit[..., None], color, bg)


def normal_shader(
    fragments: Fragments,
    vertex_normals: jnp.ndarray,
    triangles: jnp.ndarray,
    light_direction=(0.3, -0.3, -0.9),
    albedo=(0.7, 0.7, 0.75),
    background=(1.0, 1.0, 1.0),
) -> jnp.ndarray:
    """Lambertian shading from interpolated normals (telemetry renders)."""
    face_attrs = vertex_attributes_to_face(vertex_normals, triangles)
    normals = interpolate_face_attributes(
        fragments.face_indices[..., :1],
        fragments.barycentrics[..., :1, :],
        face_attrs,
    )[..., 0, :]
    n = normals / jnp.maximum(
        jnp.linalg.norm(normals, axis=-1, keepdims=True), 1e-9
    )
    light = jnp.asarray(light_direction, jnp.float32)
    light = light / jnp.linalg.norm(light)
    intensity = jnp.clip(jnp.abs(jnp.sum(n * -light, axis=-1)), 0.1, 1.0)
    hit = fragments.face_indices[..., 0] >= 0
    color = intensity[..., None] * jnp.asarray(albedo, jnp.float32)
    return jnp.where(hit[..., None], color, jnp.asarray(background, jnp.float32))
