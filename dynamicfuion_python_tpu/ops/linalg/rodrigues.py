"""Batched axis-angle <-> rotation-matrix conversions (Rodrigues formula).

Capability parity with the reference's ``cpp/core/linalg/Rodrigues.h:24`` /
``RodriguesImpl.h`` (``AxisAngleVectorsToMatricesRodrigues``), used there to apply
Gauss-Newton rotation increments (``cpp/alignment/DeformableMeshToImageFitter.cpp:261``).

Implemented as branch-free batched jnp with a Taylor fallback near theta=0 so the
op is jit/vmap/grad-safe (no data-dependent control flow).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_SMALL_ANGLE = 1e-6


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] -> [..., 3, 3] cross-product (skew-symmetric) matrices."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def axis_angle_to_matrix(axis_angle: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: [..., 3] axis-angle vectors -> [..., 3, 3] rotation matrices.

    R = I + sin(t)/t K + (1-cos(t))/t^2 K^2 with K = skew(v), t = |v|.
    The sin(t)/t and (1-cos(t))/t^2 coefficients switch to 2nd-order Taylor
    expansions below ``_SMALL_ANGLE`` to stay exact and differentiable at t=0.
    """
    theta_sq = jnp.sum(axis_angle * axis_angle, axis=-1)
    small = theta_sq < _SMALL_ANGLE**2
    # Clamp the denominators so the untaken `where` branch never divides by
    # zero (which would poison gradients with NaNs).
    safe_sq = jnp.maximum(theta_sq, _SMALL_ANGLE**2)
    theta = jnp.sqrt(safe_sq)
    # sin(t)/t ~ 1 - t^2/6 ;  (1-cos t)/t^2 ~ 1/2 - t^2/24
    a = jnp.where(small, 1.0 - theta_sq / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(theta)) / safe_sq)
    k = skew(axis_angle)
    # HIGHEST precision: TPU's default bf16-pass matmul loses ~1e-4 on
    # rotation matrices, which compounds over per-frame accumulation.
    k2 = jnp.matmul(k, k, precision=jax.lax.Precision.HIGHEST)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=axis_angle.dtype), k.shape)
    return eye + a[..., None, None] * k + b[..., None, None] * k2


def matrix_to_axis_angle(rotation: jnp.ndarray) -> jnp.ndarray:
    """Inverse Rodrigues: [..., 3, 3] rotations -> [..., 3] axis-angle vectors."""
    trace = rotation[..., 0, 0] + rotation[..., 1, 1] + rotation[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    # off-diagonal antisymmetric part = sin(theta) * axis
    w = jnp.stack(
        [
            rotation[..., 2, 1] - rotation[..., 1, 2],
            rotation[..., 0, 2] - rotation[..., 2, 0],
            rotation[..., 1, 0] - rotation[..., 0, 1],
        ],
        axis=-1,
    )
    sin_theta = jnp.sin(theta)
    # theta / (2 sin theta) with Taylor fallback 1/2 + theta^2/12 near 0.
    small = jnp.abs(sin_theta) < _SMALL_ANGLE
    scale = jnp.where(
        small,
        0.5 + theta * theta / 12.0,
        theta / jnp.maximum(2.0 * sin_theta, _SMALL_ANGLE),
    )
    return w * scale[..., None]
