"""Pinhole camera projection / unprojection.

Capability parity with the reference's
``cpp/geometry/functional/PerspectiveProjection.h`` /
``kernel/PerspectiveProjectionImpl.h:1-245``
(``UnprojectDepthImageWithoutFiltering``) and the legacy
``cpp/cpu/image_proc.h`` ``backproject_depth_*``: depth image -> camera-space
point image + validity mask, and the forward projection used by the TSDF
integrator and rasterizer setup.

All ops are dense over the image grid (static shapes) and mask invalid
pixels instead of compacting, as XLA prefers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def unproject_depth_image(
    depth: jnp.ndarray,
    intrinsics: jnp.ndarray,
    depth_scale: float = 1000.0,
    depth_max: float = 3.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Depth image -> camera-space point image + mask.

    Args:
      depth: u16/f32[H, W] raw depth (in 1/depth_scale meters; 0 = missing).
      intrinsics: f32[3, 3] pinhole matrix.
      depth_scale: divisor converting raw depth to meters.
      depth_max: far clip in meters (beyond -> invalid).

    Returns:
      points f32[H, W, 3] (zeros where invalid), mask bool[H, W].
    """
    h, w = depth.shape
    z = depth.astype(jnp.float32) / depth_scale
    mask = (z > 0.0) & (z <= depth_max)
    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]
    v = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    u = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    x = (u - cx) / fx * z
    y = (v - cy) / fy * z
    points = jnp.stack([x, y, z], axis=-1)
    return jnp.where(mask[..., None], points, 0.0), mask


def project_points(
    points: jnp.ndarray, intrinsics: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Camera-space points [..., 3] -> pixel coordinates [..., 2] (u, v) + in-front mask."""
    z = points[..., 2]
    valid = z > 1e-6
    safe_z = jnp.where(valid, z, 1.0)
    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]
    u = points[..., 0] / safe_z * fx + cx
    v = points[..., 1] / safe_z * fy + cy
    return jnp.stack([u, v], axis=-1), valid


def intrinsics_to_ndc(
    intrinsics: jnp.ndarray, image_size: tuple[int, int]
) -> jnp.ndarray:
    """Image-space intrinsics -> NDC-space intrinsics (reference
    ``ImageSpaceIntrinsicsToNdc``, ``DeformableMeshToImageFitter.cpp:102``).

    NDC convention (PyTorch3D-style, matching the reference rasterizer):
    the *shorter* image side spans [-1, 1]; the longer side spans
    [-s, s] with s = long/short. x_ndc = -(x f_x / z + c_x') etc. handled by
    the rasterizer's face-extraction stage; here we only rescale focal/center.
    """
    h, w = image_size
    short = jnp.float32(min(h, w))
    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]
    # scale: pixels -> ndc units (2 / short side)
    s = 2.0 / short
    ndc = jnp.array(
        [
            [fx * s, 0.0, cx * s - w / short],
            [0.0, fy * s, cy * s - h / short],
            [0.0, 0.0, 1.0],
        ],
        dtype=jnp.float32,
    )
    return ndc


def transform_points(points: jnp.ndarray, matrix4: jnp.ndarray) -> jnp.ndarray:
    """Apply a 4x4 rigid transform to [..., 3] points."""
    rotated = jnp.einsum(
        "ij,...j->...i",
        matrix4[:3, :3],
        points,
        precision=jax.lax.Precision.HIGHEST,
    )
    return rotated + matrix4[:3, 3]
