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
    # bidirectional flow consistency (reference deform_net.py:192-201,
    # settings/deform_net.py:122-128)
    enforce_bidirectional_consistency: bool = False
    bidirectional_consistency_threshold: float = 0.20
    # node-count guards (reference deform_net.py:271-281; settings gn_min_nodes
    # =4 / gn_max_nodes=300)
    gn_min_nodes: int = 4
    gn_max_nodes: int = 300
    # cluster filter (reference gn_min_num_correspondences_per_cluster=2000:
    # sum of anchor weights over valid matches per cluster — each match
    # contributes ~1 across its 4 normalized anchor weights)
    remove_clusters_with_few_matches: bool = True
    min_num_correspondences_per_cluster: float = 2000.0

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

        flow_net = PWCNet(name="flow_net")
        flow2, flow3, flow4, flow5, flow6, features2 = flow_net(
            source_color, target_color
        )
        flow = upsample_flow_to_full(flow2, (h, w))  # [B, H, W, 2] pixels

        # flow-warped target pixel coordinates; normalized with the
        # reference's exact convention (deform_net.py:52-71: divide by
        # (dim - 1), *2-1) and sampled with align_corners=False semantics
        # (grid_sample_normalized)
        vg, ug = jnp.mgrid[0:h, 0:w].astype(jnp.float32)
        warped_u = ug[None] + flow[..., 0]
        warped_v = vg[None] + flow[..., 1]
        nx = 2.0 * warped_u / (w - 1) - 1.0
        ny = 2.0 * warped_v / (h - 1) - 1.0
        coords = jnp.stack([nx, ny], axis=-1)

        target_matches = jax.vmap(grid_sample_normalized)(target_points, coords)

        # validity masks (reference construct_point_to_point_correspondences,
        # deform_net.py:635-684): source depth in (0, max]; ALL 4 anchors
        # valid; target-match depth in (0, max]; and the sampled-validity
        # >= 0.999 rule — a float validity image is bilinearly sampled at the
        # same warped coords (zeros padding), so any correspondence touching
        # an invalid or out-of-bounds target pixel is rejected.
        anchors_valid = jnp.all(pixel_anchors >= 0, axis=-1)
        valid_source = (
            (source_points[..., 2] > 0)
            & (source_points[..., 2] <= self.depth_max)
            & anchors_valid
        )
        target_validity_image = (
            (target_points[..., 2] > 0) & (target_points[..., 2] <= self.depth_max)
        ).astype(jnp.float32)[..., None]
        sampled_validity = jax.vmap(grid_sample_normalized)(
            target_validity_image, coords
        )[..., 0]
        valid_target = (
            (target_matches[..., 2] > 0)
            & (target_matches[..., 2] <= self.depth_max)
            & (sampled_validity >= 0.999)
        )
        correspondence_mask = valid_source & valid_target

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

        # bidirectional flow consistency (reference deform_net.py:192-201):
        # run the flow net backwards, project the round-trip flow into camera
        # space via source depth, and reject correspondences that do not
        # return near their origin.
        if self.enforce_bidirectional_consistency:
            flow2_back = flow_net(target_color, source_color)[0]
            flow_back = upsample_flow_to_full(flow2_back, (h, w))
            f_xy = jnp.stack(
                [intrinsics[:, 0, 0], intrinsics[:, 1, 1]], axis=-1
            )  # [B, 2]
            round_trip = flow + flow_back  # [B, H, W, 2] pixels
            flow_camera = (
                round_trip
                * source_points[..., 2:3]
                / f_xy[:, None, None, :]
            )
            projection_error = jnp.linalg.norm(flow_camera, axis=-1)
            bidir_ok = projection_error < self.bidirectional_consistency_threshold
            correspondence_mask = correspondence_mask & bidir_ok
            correspondence_weights = jnp.where(
                bidir_ok, correspondence_weights, 0.0
            )

        # ---- per-batch GN solve (static match capacity = H*W) -------------
        def solve_one(nodes, edges, edge_w, anchors, anchor_w, pts, cw, uvs, zs, intr):
            result = optimize_point_cloud_alignment(
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
            return (
                result.rotations,
                result.translations,
                result.losses,
                result.valid_solve,
            )

        uv_targets = jnp.stack([warped_u, warped_v], axis=-1)
        cw_solver = correspondence_weights * correspondence_mask
        rot, trans, gn_losses, gn_valid = jax.vmap(solve_one)(
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
        # nodes of clusters with total anchor-weight sum below
        # ``gn_min_num_correspondences_per_cluster`` before solving,
        # deform_net.py:366-449 — we keep the graph static and mask after).
        # Per reference :372-378, a node's match weight is the sum of its
        # pixel ANCHOR weights over valid correspondences (each valid match
        # distributes ~1 across its 4 normalized anchor weights), so the
        # reference default threshold of 2000 transfers directly.
        n = graph_nodes.shape[1]

        def node_weights_one(anchors, anchor_w, valid):
            flat_a = jnp.maximum(anchors, 0).reshape(-1)
            flat_w = (
                anchor_w.reshape(-1)
                * (anchors.reshape(-1) >= 0)
                * jnp.repeat(valid.reshape(-1).astype(jnp.float32), 4)
            )
            return jax.ops.segment_sum(flat_w, flat_a, num_segments=n)

        per_node_weight = jax.vmap(node_weights_one)(
            pixel_anchors, pixel_weights, correspondence_mask
        )  # [B, N]

        def cluster_weights_one(clusters, node_w):
            safe = jnp.maximum(clusters, 0)
            csum = jax.ops.segment_sum(node_w, safe, num_segments=n)
            return jnp.where(clusters >= 0, csum[safe], 0.0)

        if self.remove_clusters_with_few_matches:
            cluster_weight_of_node = jax.vmap(cluster_weights_one)(
                graph_clusters, per_node_weight
            )
            deformations_validity = (per_node_weight > 0.0) & (
                cluster_weight_of_node >= self.min_num_correspondences_per_cluster
            )
        else:
            deformations_validity = per_node_weight > 0.0

        # node-count guard (reference deform_net.py:271-281: solver is skipped
        # outright when the graph has too few/too many real nodes) + the
        # GN failure flags + at-least-one-valid-correspondence guard
        real_node_count = jnp.sum(graph_clusters >= 0, axis=-1)  # [B]
        node_count_ok = (real_node_count >= self.gn_min_nodes) & (
            real_node_count <= self.gn_max_nodes
        )
        correspondences_exist = jnp.any(correspondence_mask, axis=(1, 2))
        valid_solve = (
            gn_valid
            & node_count_ok
            & correspondences_exist
            & jnp.any(deformations_validity, axis=-1)
        ).astype(jnp.uint8)
        deformations_validity = (
            deformations_validity & (valid_solve[:, None] > 0)
        )
        # freeze transforms at identity for invalid solves, like the
        # reference which never writes them (deform_net.py:515-522)
        eye = jnp.broadcast_to(jnp.eye(3, dtype=rot.dtype), rot.shape)
        rot = jnp.where(valid_solve[:, None, None, None] > 0, rot, eye)
        trans = jnp.where(valid_solve[:, None, None] > 0, trans, 0.0)

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
