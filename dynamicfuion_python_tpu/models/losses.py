"""DeformNet training losses and evaluation metrics.

Capability parity with the reference ``alignment/loss.py:8-305`` +
``alignment/batch_graph_L2.py``:

  total = lambda_flow * RobustL1/L2(multi-scale flows vs downscaled gt)
        + lambda_graph * BatchGraphL2 (masked L2 over node translations)
        + lambda_warp  * L2 over densely warped points
        + lambda_mask  * weighted BCE on MaskNet output

metrics: EPE_2D (flow), EPE_3D / "Graph Error 3D" (node translations),
EPE_Warp (dense deformed points), EPE_3D_eval (``loss.py:305``), valid-solve
ratio. Also the gt helpers from ``alignment/nn_utilities.py``
(``downscale_gt_flow``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class LossWeights(NamedTuple):
    lambda_flow: float = 5.0
    lambda_graph: float = 2.0
    lambda_warp: float = 2.0
    lambda_mask: float = 1000.0
    use_flow_loss: bool = True
    use_graph_loss: bool = True
    use_warp_loss: bool = True
    use_mask_loss: bool = False
    flow_loss_type: str = "RobustL1"  # or "L2"


def robust_l1(diff: jnp.ndarray, eps: float = 0.01) -> jnp.ndarray:
    return jnp.sqrt(jnp.sum(diff**2, axis=-1) + eps**2)


def downscale_gt_flow(
    flow_gt: jnp.ndarray, flow_mask: jnp.ndarray, height: int, width: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """gt flow [B, H, W, 2] + mask -> given pyramid level size, rescaled in
    both resolution and magnitude (``nn_utilities.downscale_gt_flow``)."""
    b, h, w, _ = flow_gt.shape
    scale_u = width / w
    scale_v = height / h
    flow = jax.image.resize(flow_gt, (b, height, width, 2), "bilinear")
    flow = flow * jnp.asarray([scale_u, scale_v], jnp.float32)
    mask = (
        jax.image.resize(
            flow_mask.astype(jnp.float32), (b, height, width), "nearest"
        )
        > 0.5
    )
    return flow, mask


def flow_loss(
    flows: tuple,
    flow_gt: jnp.ndarray,
    flow_mask: jnp.ndarray,
    weights: LossWeights,
) -> jnp.ndarray:
    """Multi-scale flow loss. ``flows`` = (flow2..flow6) NHWC at 1/4..1/64
    res; the reference compares flow2 and flow4 by default
    (RobustL1, masked mean), with flowN in *downscaled pixel* units where
    gt must be divided by 20 (``apply_flow_net`` multiplies by 20)."""
    total = jnp.float32(0.0)
    for level_flow in (flows[0], flows[2]):  # flow2 and flow4
        b, h, w, _ = level_flow.shape
        gt, mask = downscale_gt_flow(flow_gt, flow_mask, h, w)
        diff = level_flow * 20.0 - gt
        if weights.flow_loss_type == "RobustL1":
            per_px = robust_l1(diff)
        else:
            per_px = jnp.sum(diff**2, axis=-1)
        denom = jnp.maximum(jnp.sum(mask), 1.0)
        total = total + jnp.sum(jnp.where(mask, per_px, 0.0)) / denom
    return total


def graph_loss(
    node_translations: jnp.ndarray,
    node_translations_gt: jnp.ndarray,
    deformations_validity: jnp.ndarray,
) -> jnp.ndarray:
    """BatchGraphL2: masked mean squared error over node translations."""
    mask = deformations_validity > 0
    diff2 = jnp.sum((node_translations - node_translations_gt) ** 2, axis=-1)
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(jnp.where(mask, diff2, 0.0)) / denom


def warp_loss(
    deformed_points: jnp.ndarray,
    deformed_points_gt: jnp.ndarray,
    deformed_points_mask: jnp.ndarray,
) -> jnp.ndarray:
    diff2 = jnp.sum((deformed_points - deformed_points_gt) ** 2, axis=-1)
    denom = jnp.maximum(jnp.sum(deformed_points_mask), 1.0)
    return jnp.sum(jnp.where(deformed_points_mask, diff2, 0.0)) / denom


def mask_bce_loss(
    mask_prediction: jnp.ndarray,
    mask_gt: jnp.ndarray,
    valid: jnp.ndarray,
    neg_wrt_pos_weight: float | None = 0.05,
) -> jnp.ndarray:
    """Weighted binary cross-entropy (reference ``loss.py:88-123``): BCE per
    valid pixel, positives weighted by ``neg_wrt_pos_weight`` (fixed mode,
    reference default 0.05) or by the negatives/positives count ratio when
    ``neg_wrt_pos_weight`` is None; negatives weighted 1."""
    p = jnp.clip(mask_prediction[..., 0], 1e-6, 1 - 1e-6)
    valid_f = valid.astype(jnp.float32)
    bce = -(mask_gt * jnp.log(p) + (1 - mask_gt) * jnp.log(1 - p)) * valid_f
    positives = valid_f * mask_gt
    negatives = valid_f * (1.0 - mask_gt)
    if neg_wrt_pos_weight is None:
        ratio = jnp.sum(negatives) / jnp.maximum(jnp.sum(positives), 1.0)
        pixel_weights = ratio * positives + negatives
    else:
        pixel_weights = neg_wrt_pos_weight * positives + negatives
    denom = jnp.maximum(jnp.sum(valid_f), 1.0)
    return jnp.sum(pixel_weights * bce) / denom


def compute_baseline_mask_gt(
    flow: jnp.ndarray,  # [B, H, W, 2] predicted dense pixel flow
    source_points: jnp.ndarray,  # [B, H, W, 3]
    target_points: jnp.ndarray,  # [B, H, W, 3]
    scene_flow_gt: jnp.ndarray,  # [B, H, W, 3]
    scene_flow_mask: jnp.ndarray,  # bool[B, H, W]
    target_boundary_mask: jnp.ndarray,  # bool[B, H, W]
    depth_max: float = 6.0,
    max_pos_flowed_source_to_target_dist: float = 0.1,
    min_neg_flowed_source_to_target_dist: float = 0.3,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Oracle correspondence-mask ground truth (reference
    ``alignment/nn_utilities.py:151-199`` ``compute_baseline_mask_gt``):
    a correspondence is a POSITIVE when the flow-sampled target match lands
    within ``max_pos`` of the scene-flow-displaced source point (with valid
    source/target and off-boundary target), a NEGATIVE when it lands beyond
    ``min_neg`` or on the boundary; everything else is left out of the loss.

    Returns (mask_gt f32[B, H, W], valid_mask_pixels bool[B, H, W]).
    """
    from dynamicfuion_python_tpu.ops.image_warp import grid_sample_normalized

    b, h, w = scene_flow_mask.shape
    vg, ug = jnp.mgrid[0:h, 0:w].astype(jnp.float32)
    nx = 2.0 * (ug[None] + flow[..., 0]) / (w - 1) - 1.0
    ny = 2.0 * (vg[None] + flow[..., 1]) / (h - 1) - 1.0
    coords = jnp.stack([nx, ny], axis=-1)

    target_matches = jax.vmap(grid_sample_normalized)(target_points, coords)
    valid_source = (source_points[..., 2] > 0) & (
        source_points[..., 2] <= depth_max
    )
    valid_target = (target_matches[..., 2] > 0) & (
        target_matches[..., 2] <= depth_max
    )
    # nearest-sampled non-boundary mask >= 0.999 rule (reference uses
    # 'nearest' grid_sample; a bilinear sample against the 0.999 threshold
    # rejects the same any-of-4-boundary-pixels cases)
    nonboundary = (~target_boundary_mask).astype(jnp.float32)[..., None]
    sampled_nonboundary = jax.vmap(grid_sample_normalized)(
        nonboundary, coords
    )[..., 0]
    matches_nonboundary = sampled_nonboundary >= 0.999

    flowed = source_points + scene_flow_gt
    dist = jnp.linalg.norm(flowed - target_matches, axis=-1)
    base = scene_flow_mask & valid_source & valid_target
    mask_pos = (
        (dist <= max_pos_flowed_source_to_target_dist)
        & base
        & matches_nonboundary
    )
    mask_neg = ((dist > min_neg_flowed_source_to_target_dist) & base) | (
        (~matches_nonboundary) & base
    )
    valid_mask_pixels = mask_pos | mask_neg
    return mask_pos.astype(jnp.float32), valid_mask_pixels


def total_loss(
    output,
    flow_gt,
    flow_mask,
    node_translations_gt,
    deformed_points_gt,
    deformed_points_mask,
    mask_gt=None,
    mask_valid=None,
    weights: LossWeights = LossWeights(),
):
    losses = {}
    total = jnp.float32(0.0)
    if weights.use_flow_loss:
        losses["flow"] = flow_loss(output.flows, flow_gt, flow_mask, weights)
        total = total + weights.lambda_flow * losses["flow"]
    if weights.use_graph_loss:
        losses["graph"] = graph_loss(
            output.node_translations,
            node_translations_gt,
            output.deformations_validity,
        )
        total = total + weights.lambda_graph * losses["graph"]
    if weights.use_warp_loss:
        losses["warp"] = warp_loss(
            output.deformed_points, deformed_points_gt, deformed_points_mask
        )
        total = total + weights.lambda_warp * losses["warp"]
    if weights.use_mask_loss and mask_gt is not None and output.mask_prediction is not None:
        losses["mask"] = mask_bce_loss(
            output.mask_prediction,
            mask_gt,
            flow_mask if mask_valid is None else mask_valid,
        )
        total = total + weights.lambda_mask * losses["mask"]
    losses["total"] = total
    return total, losses


# ---------------------------------------------------------------------------
# metrics (evaluation; reference loss.py:243-305)
# ---------------------------------------------------------------------------


def epe_2d(flow: jnp.ndarray, flow_gt: jnp.ndarray, mask: jnp.ndarray):
    """Mean endpoint error of (full-scale) flow over valid pixels."""
    err = jnp.linalg.norm(flow - flow_gt, axis=-1)
    return jnp.sum(jnp.where(mask, err, 0.0)) / jnp.maximum(jnp.sum(mask), 1.0)


def epe_3d(pred: jnp.ndarray, gt: jnp.ndarray, mask: jnp.ndarray):
    """Mean 3D endpoint error (node translations -> "Graph Error 3D";
    dense deformed points -> "EPE 3D")."""
    err = jnp.linalg.norm(pred - gt, axis=-1)
    return jnp.sum(jnp.where(mask, err, 0.0)) / jnp.maximum(jnp.sum(mask), 1.0)


def valid_ratio(valid_solve: jnp.ndarray):
    return jnp.mean(valid_solve.astype(jnp.float32))
