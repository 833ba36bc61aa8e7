"""Multi-scale projective point-to-plane ICP (rigid RGB-D odometry).

Capability parity with the reference's rigid alignment stage
(``apps/fusion/pipeline.py:343-354``: Open3D ``rgbd_odometry_multi_scale``
with 3-level point-to-plane): estimates the rigid camera transform between
two depth frames by coarse-to-fine Gauss-Newton over projective
associations.

Per iteration at each level: transform source points by the current
estimate, project into the target frame, sample target points + normals,
residual r = dot(n_t, T p_s - p_t) with jacobian [n x (T p_s), n] per pixel,
solve the 6x6 normal equations, update T on the left via the exp map.
Fully jit-compiled; pyramid levels are built by strided min-pooling.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from dynamicfuion_python_tpu.ops.camera import unproject_depth_image
from dynamicfuion_python_tpu.ops.linalg.rodrigues import axis_angle_to_matrix, skew
from dynamicfuion_python_tpu.ops.normals import point_image_normals

_P = jax.lax.Precision.HIGHEST


def _downsample_depth(depth: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Min-pool (ignoring zeros) depth downsampling."""
    h, w = depth.shape
    hp, wp = h // factor * factor, w // factor * factor
    d = depth[:hp, :wp].reshape(hp // factor, factor, wp // factor, factor)
    d = d.astype(jnp.float32)
    big = jnp.where(d > 0, d, jnp.inf)
    pooled = jnp.min(big, axis=(1, 3))
    return jnp.where(jnp.isfinite(pooled), pooled, 0.0)


def _icp_level(
    source_points,
    source_mask,
    target_points,
    target_normals,
    target_mask,
    intrinsics,
    transform,
    iterations: int,
    distance_threshold: float,
    update_threshold: float = 1e-7,
):
    h, w = source_mask.shape
    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]
    src = source_points.reshape(-1, 3)
    src_ok = source_mask.reshape(-1)
    # pack target point/normal/mask into ONE 8-wide row table: projective
    # association then costs a single row gather per iteration instead of
    # three narrow ones (TPU gathers are per-op latency-bound)
    t_valid = target_mask & (
        jnp.linalg.norm(target_normals, axis=-1) > 0.1
    )
    target_tbl = jnp.concatenate(
        [
            target_points.reshape(-1, 3),
            target_normals.reshape(-1, 3),
            t_valid.reshape(-1, 1).astype(jnp.float32),
            jnp.zeros((h * w, 1), jnp.float32),
        ],
        axis=1,
    )

    def body(carry):
        t_mat, _, i, _ = carry
        rot = t_mat[:3, :3]
        tr = t_mat[:3, 3]
        moved = src @ rot.T + tr
        z = jnp.maximum(moved[:, 2], 1e-6)
        u = jnp.round(moved[:, 0] / z * fx + cx).astype(jnp.int32)
        v = jnp.round(moved[:, 1] / z * fy + cy).astype(jnp.int32)
        inb = (u >= 0) & (u < w) & (v >= 0) & (v < h) & (moved[:, 2] > 0)
        flat = jnp.clip(v, 0, h - 1) * w + jnp.clip(u, 0, w - 1)
        row = target_tbl[flat]  # [P, 8]
        q = row[:, 0:3]
        n = row[:, 3:6]
        t_ok = row[:, 6] > 0.5
        diff = moved - q
        r = jnp.sum(n * diff, axis=-1)
        ok = (
            src_ok
            & inb
            & t_ok
            & (jnp.abs(r) < distance_threshold)
        )
        wgt = ok.astype(jnp.float32)
        # jacobian rows: [ (T p) x n  |  n ]  (for r = n . (R p + t - q),
        # with left-multiplied increment exp([w]x) T)
        jrot = jnp.cross(moved, n)
        jac = jnp.concatenate([jrot, n], axis=-1)  # [P, 6]
        a = jnp.einsum("pa,pb->ab", jac * wgt[:, None], jac, precision=_P)
        b = -jnp.einsum("pa,p->a", jac * wgt[:, None], r, precision=_P)
        a = a + 1e-6 * jnp.eye(6)
        delta = jnp.linalg.solve(a, b)
        d_rot = axis_angle_to_matrix(delta[:3])
        new_rot = d_rot @ rot
        new_tr = d_rot @ tr + delta[3:]
        new_t = jnp.eye(4).at[:3, :3].set(new_rot).at[:3, 3].set(new_tr)
        rmse = jnp.sqrt(jnp.sum(wgt * r * r) / jnp.maximum(jnp.sum(wgt), 1.0))
        return new_t, rmse, i + 1, jnp.max(jnp.abs(delta))

    def cond(carry):
        _, _, i, max_upd = carry
        return (i < iterations) & (max_upd > update_threshold)

    transform, rmse, _, _ = jax.lax.while_loop(
        cond,
        body,
        (transform, jnp.float32(0.0), jnp.int32(0), jnp.float32(jnp.inf)),
    )
    return transform, rmse


@functools.partial(
    jax.jit,
    static_argnames=("levels", "iterations_per_level", "depth_scale", "depth_max"),
)
def rigid_odometry_multi_scale(
    source_depth: jnp.ndarray,
    target_depth: jnp.ndarray,
    intrinsics: jnp.ndarray,
    initial_transform: jnp.ndarray | None = None,
    levels: tuple = (4, 2, 1),
    iterations_per_level: int = 10,
    depth_scale: float = 1000.0,
    depth_max: float = 3.0,
    distance_threshold: float = 0.07,
):
    """Estimate T such that T * source ~= target. Returns (T, final rmse)."""
    transform = (
        initial_transform if initial_transform is not None else jnp.eye(4)
    )
    rmse = jnp.float32(0.0)
    for factor in levels:
        sd = _downsample_depth(source_depth, factor) if factor > 1 else source_depth.astype(jnp.float32)
        td = _downsample_depth(target_depth, factor) if factor > 1 else target_depth.astype(jnp.float32)
        intr = intrinsics / factor
        intr = intr.at[2, 2].set(1.0)
        sp, sm = unproject_depth_image(sd, intr, depth_scale, depth_max)
        tp, tm = unproject_depth_image(td, intr, depth_scale, depth_max)
        tn = point_image_normals(tp)
        transform, rmse = _icp_level(
            sp, sm, tp, tn, tm, intr, transform,
            iterations_per_level, distance_threshold,
        )
    return transform, rmse
