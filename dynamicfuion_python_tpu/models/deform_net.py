"""DeformNet: end-to-end neural non-rigid tracker.

Capability parity with the reference ``alignment/deform_net.py:74-719``:
PWC-Net dense flow -> flow-warped correspondence targets (grid-sampled
target points + validity masks) -> optional MaskNet correspondence weights
-> per-batch differentiable Gauss-Newton over graph node transforms ->
dense warp of source points for the training loss. Returns the same output
families (flow pyramid, node transforms, deformed points, validity flags,
mask prediction).

TPU-native notes:
  - all per-batch dynamic filtering (invalid-match removal, subsampling to
    ``gn_max_matches``) becomes static-shape masking: padded matches carry
    zero correspondence weight, so they contribute nothing to the normal
    equations (the reference instead compacts + renumbers, which cannot
    jit);
  - cluster-based node filtering (``deform_net.py:366-449``) is applied as
    a post-solve validity mask over nodes of under-weighted clusters
    (``deformations_validity``) rather than renumbering the graph;
  - the whole forward (including 3 GN iterations) is one jit program,
    vmapped over the batch.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from dynamicfuion_python_tpu.models.gn_point_cloud_optimizer import (
    GnConfig,
    optimize_point_cloud_alignment,
)
from dynamicfuion_python_tpu.models.mask_net import MaskNet
from dynamicfuion_python_tpu.models.pwcnet import PWCNet, upsample_flow_to_full
from dynamicfuion_python_tpu.ops.image_warp import grid_sample_normalized


class DeformNetOutput(NamedTuple):
    flows: tuple  # (flow2..flow6) NHWC
    node_rotations: jnp.ndarray  # [B, N, 3, 3]
    node_translations: jnp.ndarray  # [B, N, 3]
    deformations_validity: jnp.ndarray  # [B, N]
    deformed_points: jnp.ndarray  # [B, M, 3]
    valid_solve: jnp.ndarray  # [B]
    mask_prediction: jnp.ndarray | None  # [B, H, W, 1]
    correspondence_weights: jnp.ndarray  # [B, H, W]
    target_matches: jnp.ndarray  # [B, H, W, 3]
    valid_correspondence_mask: jnp.ndarray  # [B, H, W]
    gn_losses: jnp.ndarray  # [B, iterations]


class DeformNet(nn.Module):
    """Flax module bundling PWC-Net + MaskNet + the GN solver."""

    use_mask: bool = True
    gn_config: GnConfig = GnConfig()
    num_nodes: int = 0  # static node capacity (graphs are padded to this)
    depth_max: float = 6.0
    mask_threshold: float = 0.35  # eval-time hard threshold (reference
    # ``threshold_mask_predictions`` path, settings/deform_net.py:118)
    threshold_mask_predictions: bool = False

    @nn.compact
    def __call__(
        self,
        source: jnp.ndarray,  # [B, H, W, 6] rgbxyz
        target: jnp.ndarray,  # [B, H, W, 6] rgbxyz
        graph_nodes: jnp.ndarray,  # [B, N, 3]
        graph_edges: jnp.ndarray,  # int32[B, N, Ke]
        graph_edges_weights: jnp.ndarray,  # [B, N, Ke]
        graph_clusters: jnp.ndarray,  # int32[B, N]
        pixel_anchors: jnp.ndarray,  # int32[B, H, W, 4]
        pixel_weights: jnp.ndarray,  # [B, H, W, 4]
        intrinsics: jnp.ndarray,  # [B, 3, 3] or [3, 3]
        evaluate: bool = False,
    ) -> DeformNetOutput:
        b, h, w, _ = source.shape
        if h % 64 or w % 64:
            raise ValueError(
                f"DeformNet needs image dims divisible by 64 (6-level conv "
                f"pyramid with exact x2 upsampling); got {h}x{w} — resize the "
                "input (the reference resizes to 448x640 for the same reason)"
            )
        if intrinsics.ndim == 2:
            intrinsics = jnp.broadcast_to(intrinsics, (b, 3, 3))

        source_color = source[..., :3]
        target_color = target[..., :3]
        source_points = source[..., 3:]
        target_points = target[..., 3:]

        flow2, flow3, flow4, flow5, flow6, features2 = PWCNet(name="flow_net")(
            source_color, target_color
        )
        flow = upsample_flow_to_full(flow2, (h, w))  # [B, H, W, 2] pixels

        # flow-warped target pixel coordinates
        vg, ug = jnp.mgrid[0:h, 0:w].astype(jnp.float32)
        warped_u = ug[None] + flow[..., 0]
        warped_v = vg[None] + flow[..., 1]
        # normalized coords for grid sampling ([-1, 1], corner-aligned)
        nx = 2.0 * warped_u / (w - 1) - 1.0
        ny = 2.0 * warped_v / (h - 1) - 1.0
        coords = jnp.stack([nx, ny], axis=-1)

        target_matches = jax.vmap(grid_sample_normalized)(target_points, coords)

        valid_source = source_points[..., 2] > 0
        valid_target = (target_matches[..., 2] > 0) & (
            target_matches[..., 2] <= self.depth_max
        )
        anchors_valid = jnp.all(pixel_anchors >= 0, axis=-1) | (
            pixel_anchors[..., 0] >= 0
        )
        in_bounds = (jnp.abs(nx) <= 0.999) & (jnp.abs(ny) <= 0.999)
        correspondence_mask = (
            valid_source & valid_target & anchors_valid & in_bounds
        )

        mask_prediction = None
        correspondence_weights = correspondence_mask.astype(jnp.float32)
        if self.use_mask:
            warped_target_rgb = jax.vmap(grid_sample_normalized)(
                target_color, coords
            )
            mask_input = jnp.concatenate(
                [source, warped_target_rgb, target_matches], axis=-1
            )
            mask_prediction = MaskNet(name="mask_net")(features2, mask_input)
            weights = mask_prediction[..., 0]
            if evaluate and self.threshold_mask_predictions:
                weights = jnp.where(weights >= self.mask_threshold, weights, 0.0)
            correspondence_weights = correspondence_weights * weights

        # ---- per-batch GN solve (static match capacity = H*W) -------------
        def solve_one(nodes, edges, edge_w, anchors, anchor_w, pts, cw, uvs, zs, intr):
            rot, trans, losses = optimize_point_cloud_alignment(
                nodes,
                edges,
                edge_w,
                pts.reshape(-1, 3),
                anchors.reshape(-1, 4),
                anchor_w.reshape(-1, 4),
                cw.reshape(-1),
                uvs.reshape(-1, 2),
                zs.reshape(-1),
                intr,
                num_nodes=self.num_nodes or graph_nodes.shape[1],
                config=self.gn_config,
            )
            return rot, trans, losses

        uv_targets = jnp.stack([warped_u, warped_v], axis=-1)
        cw_solver = correspondence_weights * correspondence_mask
        rot, trans, gn_losses = jax.vmap(solve_one)(
            graph_nodes,
            graph_edges,
            graph_edges_weights,
            pixel_anchors,
            pixel_weights,
            source_points,
            cw_solver,
            uv_targets,
            target_matches[..., 2],
            intrinsics,
        )

        # ---- cluster validity (post-solve masking; the reference removes
        # nodes of clusters with total correspondence weight below
        # ``gn_min_num_correspondences_per_cluster`` before solving,
        # deform_net.py:366-449 — we keep the graph static and mask after) --
        n = graph_nodes.shape[1]

        def node_weights_one(anchors, cw):
            flat_a = jnp.maximum(anchors, 0).reshape(-1)
            flat_w = jnp.repeat(cw.reshape(-1), 4) * (
                anchors.reshape(-1) >= 0
            )
            return jax.ops.segment_sum(flat_w, flat_a, num_segments=n)

        per_node_weight = jax.vmap(node_weights_one)(
            pixel_anchors, cw_solver
        )  # [B, N]

        def cluster_weights_one(clusters, node_w):
            safe = jnp.maximum(clusters, 0)
            csum = jax.ops.segment_sum(node_w, safe, num_segments=n)
            return csum[safe]

        cluster_weight_of_node = jax.vmap(cluster_weights_one)(
            graph_clusters, per_node_weight
        )
        min_cluster_weight = 10.0  # reference gn_min_num_correspondences_per_cluster=2000 raw pixels; weights here are [0,1]-valued
        deformations_validity = (
            (per_node_weight > 0.0) & (cluster_weight_of_node >= min_cluster_weight)
        )
        valid_solve = jnp.any(deformations_validity, axis=-1).astype(jnp.uint8)

        # ---- dense warp of source points (training target) ----------------
        def warp_points_one(nodes, rot_i, trans_i, anchors, weights, pts):
            from dynamicfuion_python_tpu.ops.warp import blend_warp

            return blend_warp(
                pts.reshape(-1, 3),
                nodes,
                rot_i,
                trans_i,
                anchors.reshape(-1, 4),
                weights.reshape(-1, 4),
            )

        deformed_points = jax.vmap(warp_points_one)(
            graph_nodes, rot, trans, pixel_anchors, pixel_weights, source_points
        )

        return DeformNetOutput(
            flows=(flow2, flow3, flow4, flow5, flow6),
            node_rotations=rot,
            node_translations=trans,
            deformations_validity=deformations_validity.astype(jnp.float32),
            deformed_points=deformed_points,
            valid_solve=valid_solve,
            mask_prediction=mask_prediction,
            correspondence_weights=correspondence_weights,
            target_matches=target_matches,
            valid_correspondence_mask=correspondence_mask,
            gn_losses=gn_losses,
        )
