"""Forward mesh renderer (RGB-D) over the tiled rasterizer.

Capability parity with the reference's ``rendering/pytorch3d_renderer.py:23-144``
(``PyTorch3DRenderer``: renders the warped mesh to a color+depth estimate
used for the RENDERED source-image mode and telemetry) and the Open3D<->
PyTorch3D converters (``rendering/converters.py``) — obsolete here since
everything is one tensor ecosystem.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from dynamicfuion_python_tpu.ops.normals import mesh_vertex_normals
from dynamicfuion_python_tpu.ops.rasterize import (
    extract_face_vertices,
    rasterize_binned,
)
from dynamicfuion_python_tpu.ops.shading import normal_shader, vertex_color_shader


class MeshRenderer:
    """Renders camera-space triangle meshes to color + depth images."""

    def __init__(
        self,
        image_size: tuple[int, int],
        intrinsics: jnp.ndarray,
        tile_size: int = 16,
        max_faces_per_bin: int = 1024,
    ):
        self.image_size = image_size
        self.intrinsics = intrinsics
        self.tile_size = tile_size
        self.max_faces_per_bin = max_faces_per_bin
        self._render = jax.jit(self._render_impl)

    def _render_impl(self, vertices, triangles, vertex_colors):
        fv, valid = extract_face_vertices(
            vertices, triangles, self.intrinsics, self.image_size
        )
        frag = rasterize_binned(
            fv,
            valid,
            self.image_size,
            faces_per_pixel=1,
            cull_back_faces=False,
            tile_size=self.tile_size,
            max_faces_per_bin=self.max_faces_per_bin,
        )
        depth = jnp.where(
            frag.face_indices[..., 0] >= 0, frag.depths[..., 0], 0.0
        )
        if vertex_colors is None:
            normals = mesh_vertex_normals(vertices, triangles)
            color = normal_shader(frag, normals, triangles)
        else:
            color = vertex_color_shader(frag, vertex_colors, triangles)
        return color, depth

    def render_mesh(self, vertices, triangles, vertex_colors=None):
        """-> (color f32[H, W, 3], depth f32[H, W] in meters, 0 = miss)."""
        return self._render(vertices, triangles, vertex_colors)
