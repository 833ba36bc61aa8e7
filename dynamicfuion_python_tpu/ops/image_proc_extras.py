"""Remaining legacy image-processing ops.

Capability parity with ``cpp/cpu/image_proc.h:13-59`` pieces not covered
elsewhere: ``filter_depth`` (median of valid depths in a window),
``warp_3d`` (trilinear scene-flow warp of a point image), boundary masks
(``image_processing.compute_boundary_mask``), and
``compute_augmented_flow_from_rotation`` (composition of rotation-augmented
flow fields used by training-time augmentation).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from dynamicfuion_python_tpu.ops.image_warp import bilinear_sample


@functools.partial(jax.jit, static_argnames=("radius",))
def filter_depth(depth: jnp.ndarray, radius: int = 1) -> jnp.ndarray:
    """Median of the *valid* (non-zero) depths in each (2r+1)^2 window;
    zero where the window holds no valid depth (``image_proc.cpp:837``)."""
    h, w = depth.shape
    k = 2 * radius + 1
    d = depth.astype(jnp.float32)
    pad = jnp.pad(d, radius, constant_values=0.0)
    stack = jnp.stack(
        [
            pad[dy : dy + h, dx : dx + w]
            for dy in range(k)
            for dx in range(k)
        ],
        axis=-1,
    )  # [H, W, k*k]
    valid = stack > 0
    count = jnp.sum(valid, axis=-1)
    big = jnp.where(valid, stack, jnp.inf)
    ordered = jnp.sort(big, axis=-1)
    # median index among the `count` valid entries (lower median)
    idx = jnp.maximum((count - 1) // 2, 0)
    med = jnp.take_along_axis(ordered, idx[..., None], axis=-1)[..., 0]
    out = jnp.where(count > 0, med, 0.0)
    return out.astype(depth.dtype)


def warp_3d(
    point_image: jnp.ndarray,
    scene_flow: jnp.ndarray,
    mask: jnp.ndarray,
) -> jnp.ndarray:
    """Displace a point image by dense scene flow (``image_proc.warp_3d``
    semantics: masked addition; invalid pixels untouched)."""
    return jnp.where(mask[..., None], point_image + scene_flow, point_image)


def compute_boundary_mask(
    depth: jnp.ndarray, max_distance_mm: float = 100.0
) -> jnp.ndarray:
    """True where a pixel's depth differs from any 4-neighbor by more than
    the threshold (``image_processing.compute_boundary_mask``)."""
    d = depth.astype(jnp.float32)
    pad = jnp.pad(d, 1, constant_values=0.0)
    h, w = depth.shape
    diffs = [
        jnp.abs(d - pad[0:h, 1 : w + 1]),
        jnp.abs(d - pad[2 : h + 2, 1 : w + 1]),
        jnp.abs(d - pad[1 : h + 1, 0:w]),
        jnp.abs(d - pad[1 : h + 1, 2 : w + 2]),
    ]
    return jnp.stack(diffs).max(0) > max_distance_mm


def compute_boundary_mask_points(
    point_image: jnp.ndarray, max_distance: float = 0.1
) -> jnp.ndarray:
    """Boundary mask over a 3D point image [H, W, 3] (reference
    ``image_processing.compute_boundary_mask``, image_processing:347-380):
    True where the Euclidean distance between a pixel's left & right
    neighbor POINTS, or its above & below neighbor points, exceeds
    ``max_distance`` meters — i.e. the surface jumps across the pixel."""
    p = point_image.astype(jnp.float32)
    h, w = p.shape[:2]
    pad = jnp.pad(p, ((1, 1), (1, 1), (0, 0)))
    left = pad[1 : h + 1, 0:w]
    right = pad[1 : h + 1, 2 : w + 2]
    up = pad[0:h, 1 : w + 1]
    down = pad[2 : h + 2, 1 : w + 1]
    d_lr = jnp.linalg.norm(right - left, axis=-1)
    d_ud = jnp.linalg.norm(down - up, axis=-1)
    return (d_lr > max_distance) | (d_ud > max_distance)


def compute_augmented_flow_from_rotation(
    flow_rot_sa2so: jnp.ndarray,
    flow_so2to: jnp.ndarray,
    flow_rot_to2ta: jnp.ndarray,
) -> jnp.ndarray:
    """Compose three flow fields sa->so->to->ta by chained bilinear lookup
    (``image_proc.compute_augmented_flow_from_rotation``): for each pixel p
    in the rotation-augmented source, follow its flow into the original
    source, sample the source->target flow there, then the target->augmented
    rotation flow, accumulating the total displacement. All flows [H, W, 2]
    in pixels."""
    h, w = flow_rot_sa2so.shape[:2]
    vg, ug = jnp.mgrid[0:h, 0:w].astype(jnp.float32)
    # position in original source
    u1 = ug + flow_rot_sa2so[..., 0]
    v1 = vg + flow_rot_sa2so[..., 1]
    f12 = bilinear_sample(flow_so2to, u1, v1)
    u2 = u1 + f12[..., 0]
    v2 = v1 + f12[..., 1]
    f23 = bilinear_sample(flow_rot_to2ta, u2, v2)
    u3 = u2 + f23[..., 0]
    v3 = v2 + f23[..., 1]
    return jnp.stack([u3 - ug, v3 - vg], axis=-1)
