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


class TrackingGuards(NamedTuple):
    """Failure-guard / filtering knobs shared by DeformNet and the fusion
    pipeline's neural tracking prior (reference settings/deform_net.py)."""

    depth_max: float = 6.0
    gn_min_nodes: int = 4
    gn_max_nodes: int = 300
    remove_clusters_with_few_matches: bool = True
    min_num_correspondences_per_cluster: float = 2000.0


def track_from_flow(
    flow: jnp.ndarray,  # [B, H, W, 2] dense pixel flow source->target
    source: jnp.ndarray,  # [B, H, W, 6] rgbxyz
    target: jnp.ndarray,  # [B, H, W, 6]
    graph_nodes: jnp.ndarray,  # [B, N, 3]
    graph_edges: jnp.ndarray,  # int32[B, N, Ke]
    graph_edges_weights: jnp.ndarray,  # [B, N, Ke]
    graph_clusters: jnp.ndarray,  # int32[B, N]
    pixel_anchors: jnp.ndarray,  # int32[B, H, W, 4]
    pixel_weights: jnp.ndarray,  # [B, H, W, 4]
    intrinsics: jnp.ndarray,  # [B, 3, 3]
    gn_config: GnConfig,
    guards: TrackingGuards = TrackingGuards(),
    mask_weights: jnp.ndarray | None = None,  # [B, H, W] correspondence wts
    flow_back: jnp.ndarray | None = None,  # [B, H, W, 2] target->source
    bidirectional_consistency_threshold: float = 0.20,
    initial_rotations: jnp.ndarray | None = None,  # [B, N, 3, 3]
    initial_translations: jnp.ndarray | None = None,  # [B, N, 3]
    num_nodes: int = 0,
    max_matches: int = 0,
    match_subsample_uniforms: jnp.ndarray | None = None,  # [B, H, W] U(0,1)
) -> dict:
    """Everything in the neural tracker downstream of the networks: flow ->
    grid-sampled correspondences + validity masks -> (optional bidirectional
    consistency) -> per-batch differentiable GN solve -> cluster filtering +
    valid_solve guards -> dense warp. Reference
    ``alignment/deform_net.py:124-616`` minus PWC-Net/MaskNet, factored out
    so the fusion pipeline's tracking prior can inject flow from any source
    (the trained flow net, a precomputed flow file, or a test oracle).
    """
    b, h, w, _ = source.shape
    source_points = source[..., 3:]
    target_points = target[..., 3:]
    depth_max = guards.depth_max

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
        & (source_points[..., 2] <= depth_max)
        & anchors_valid
    )
    target_validity_image = (
        (target_points[..., 2] > 0) & (target_points[..., 2] <= depth_max)
    ).astype(jnp.float32)[..., None]
    sampled_validity = jax.vmap(grid_sample_normalized)(
        target_validity_image, coords
    )[..., 0]
    valid_target = (
        (target_matches[..., 2] > 0)
        & (target_matches[..., 2] <= depth_max)
        & (sampled_validity >= 0.999)
    )
    correspondence_mask = valid_source & valid_target

    correspondence_weights = correspondence_mask.astype(jnp.float32)
    if mask_weights is not None:
        correspondence_weights = correspondence_weights * mask_weights

    # bidirectional flow consistency (reference deform_net.py:192-201):
    # project the round-trip flow into camera space via source depth and
    # reject correspondences that do not return near their origin.
    if flow_back is not None:
        f_xy = jnp.stack(
            [intrinsics[:, 0, 0], intrinsics[:, 1, 1]], axis=-1
        )  # [B, 2]
        round_trip = flow + flow_back  # [B, H, W, 2] pixels
        flow_camera = (
            round_trip * source_points[..., 2:3] / f_xy[:, None, None, :]
        )
        projection_error = jnp.linalg.norm(flow_camera, axis=-1)
        bidir_ok = projection_error < bidirectional_consistency_threshold
        correspondence_mask = correspondence_mask & bidir_ok
        correspondence_weights = jnp.where(
            bidir_ok, correspondence_weights, 0.0
        )

    # random match subsampling to the ``gn_max_matches_*`` budget (the
    # reference randomly permutes and keeps exactly max_matches,
    # deform_net.py:338-357; with static shapes we keep each valid match
    # with probability max_matches / count — same expected budget)
    if max_matches > 0 and match_subsample_uniforms is not None:
        count = jnp.sum(
            correspondence_mask, axis=(1, 2), keepdims=True
        ).astype(jnp.float32)
        keep_prob = jnp.minimum(
            1.0, max_matches / jnp.maximum(count, 1.0)
        )
        keep = match_subsample_uniforms < keep_prob
        correspondence_mask = correspondence_mask & keep
        correspondence_weights = jnp.where(keep, correspondence_weights, 0.0)

    # ---- per-batch GN solve (static match capacity = H*W) -------------
    n_static = num_nodes or graph_nodes.shape[1]

    def solve_one(nodes, edges, edge_w, anchors, anchor_w, pts, cw, uvs, zs,
                  intr, rot0, trans0):
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
            num_nodes=n_static,
            config=gn_config,
            initial_rotations=rot0,
            initial_translations=trans0,
        )
        return (
            result.rotations,
            result.translations,
            result.losses,
            result.valid_solve,
        )

    uv_targets = jnp.stack([warped_u, warped_v], axis=-1)
    cw_solver = correspondence_weights * correspondence_mask
    if initial_rotations is None:
        initial_rotations = jnp.broadcast_to(
            jnp.eye(3, dtype=jnp.float32), (b, n_static, 3, 3)
        )
    if initial_translations is None:
        initial_translations = jnp.zeros((b, n_static, 3), jnp.float32)
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
        initial_rotations,
        initial_translations,
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

    if guards.remove_clusters_with_few_matches:
        cluster_weight_of_node = jax.vmap(cluster_weights_one)(
            graph_clusters, per_node_weight
        )
        deformations_validity = (per_node_weight > 0.0) & (
            cluster_weight_of_node
            >= guards.min_num_correspondences_per_cluster
        )
    else:
        deformations_validity = per_node_weight > 0.0

    # node-count guard (reference deform_net.py:271-281: solver is skipped
    # outright when the graph has too few/too many real nodes) + the
    # GN failure flags + at-least-one-valid-correspondence guard
    real_node_count = jnp.sum(graph_clusters >= 0, axis=-1)  # [B]
    node_count_ok = (real_node_count >= guards.gn_min_nodes) & (
        real_node_count <= guards.gn_max_nodes
    )
    correspondences_exist = jnp.any(correspondence_mask, axis=(1, 2))
    valid_solve = (
        gn_valid
        & node_count_ok
        & correspondences_exist
        & jnp.any(deformations_validity, axis=-1)
    ).astype(jnp.uint8)
    deformations_validity = deformations_validity & (valid_solve[:, None] > 0)
    # freeze transforms at the provided estimates for invalid solves, like
    # the reference which never writes them (deform_net.py:515-522)
    rot = jnp.where(
        valid_solve[:, None, None, None] > 0, rot, initial_rotations
    )
    trans = jnp.where(
        valid_solve[:, None, None] > 0, trans, initial_translations
    )

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

    return {
        "node_rotations": rot,
        "node_translations": trans,
        "deformations_validity": deformations_validity.astype(jnp.float32),
        "deformed_points": deformed_points,
        "valid_solve": valid_solve,
        "correspondence_weights": correspondence_weights,
        "target_matches": target_matches,
        "valid_correspondence_mask": correspondence_mask,
        "gn_losses": gn_losses,
    }


def patchwise_threshold(mask_weights: jnp.ndarray, patch_size: int):
    """Keep only each ``patch_size``-square's maximum weight, zeroing the
    rest (reference ``patchwise_threshold_mask_predictions``,
    ``alignment/deform_net.py:707-717``: max_pool -> nearest-upsample ->
    ``|x - pooled| <= 1e-8`` selector). ``mask_weights``: f32[B, H, W].
    Remainder rows/cols of non-divisible images are zeroed (our alignment
    sizes are multiples of 64 so this never triggers in practice)."""
    ps = patch_size
    bsz, mh, mw = mask_weights.shape
    hp = mh // ps * ps
    wp = mw // ps * ps
    pooled = (
        mask_weights[:, :hp, :wp]
        .reshape(bsz, hp // ps, ps, wp // ps, ps)
        .max(axis=(2, 4))
    )
    up = jnp.repeat(jnp.repeat(pooled, ps, axis=1), ps, axis=2)
    up = jnp.pad(
        up,
        ((0, 0), (0, mh - hp), (0, mw - wp)),
        constant_values=jnp.inf,
    )
    selected = jnp.abs(mask_weights - up) <= 1e-8
    return jnp.where(selected, mask_weights, 0.0)


class DeformNet(nn.Module):
    """Flax module bundling PWC-Net + MaskNet + the GN solver."""

    use_mask: bool = True
    gn_config: GnConfig = GnConfig()
    num_nodes: int = 0  # static node capacity (graphs are padded to this)
    depth_max: float = 6.0
    mask_threshold: float = 0.35  # eval-time hard threshold (reference
    # ``threshold_mask_predictions`` path, settings/deform_net.py:118)
    threshold_mask_predictions: bool = False
    # patch-wise variant (reference ``patchwise_threshold_mask_predictions``,
    # alignment/deform_net.py:707-717): max-pool the mask per patch and keep
    # only each patch's maxima (weights elsewhere zeroed) — a sparsifying
    # winner-take-all instead of a global cutoff
    patchwise_threshold_mask_predictions: bool = False
    patch_size: int = 16
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
    # random match-count budget (reference gn_max_matches_train/eval);
    # active only when the caller supplies match_subsample_uniforms
    gn_max_matches: int = 0

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
        node_rotations_estimate: jnp.ndarray | None = None,  # [B, N, 3, 3]
        node_translations_estimate: jnp.ndarray | None = None,  # [B, N, 3]
        match_subsample_uniforms: jnp.ndarray | None = None,  # [B, H, W]
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

        mask_prediction = None
        mask_weights = None
        if self.use_mask:
            # grid-sample inputs for MaskNet (duplicated inside
            # track_from_flow; XLA CSE merges the identical subgraphs)
            vg, ug = jnp.mgrid[0:h, 0:w].astype(jnp.float32)
            nx = 2.0 * (ug[None] + flow[..., 0]) / (w - 1) - 1.0
            ny = 2.0 * (vg[None] + flow[..., 1]) / (h - 1) - 1.0
            coords = jnp.stack([nx, ny], axis=-1)
            warped_target_rgb = jax.vmap(grid_sample_normalized)(
                target_color, coords
            )
            target_matches_in = jax.vmap(grid_sample_normalized)(
                target[..., 3:], coords
            )
            mask_input = jnp.concatenate(
                [source, warped_target_rgb, target_matches_in], axis=-1
            )
            mask_prediction = MaskNet(name="mask_net")(features2, mask_input)
            mask_weights = mask_prediction[..., 0]
            if evaluate and self.threshold_mask_predictions:
                mask_weights = jnp.where(
                    mask_weights >= self.mask_threshold, mask_weights, 0.0
                )
            elif evaluate and self.patchwise_threshold_mask_predictions:
                mask_weights = patchwise_threshold(
                    mask_weights, self.patch_size
                )

        flow_back = None
        if self.enforce_bidirectional_consistency:
            flow2_back = flow_net(target_color, source_color)[0]
            flow_back = upsample_flow_to_full(flow2_back, (h, w))

        tracked = track_from_flow(
            flow,
            source,
            target,
            graph_nodes,
            graph_edges,
            graph_edges_weights,
            graph_clusters,
            pixel_anchors,
            pixel_weights,
            intrinsics,
            gn_config=self.gn_config,
            guards=TrackingGuards(
                depth_max=self.depth_max,
                gn_min_nodes=self.gn_min_nodes,
                gn_max_nodes=self.gn_max_nodes,
                remove_clusters_with_few_matches=(
                    self.remove_clusters_with_few_matches
                ),
                min_num_correspondences_per_cluster=(
                    self.min_num_correspondences_per_cluster
                ),
            ),
            mask_weights=mask_weights,
            flow_back=flow_back,
            bidirectional_consistency_threshold=(
                self.bidirectional_consistency_threshold
            ),
            initial_rotations=node_rotations_estimate,
            initial_translations=node_translations_estimate,
            num_nodes=self.num_nodes or graph_nodes.shape[1],
            max_matches=self.gn_max_matches,
            match_subsample_uniforms=match_subsample_uniforms,
        )

        return DeformNetOutput(
            flows=(flow2, flow3, flow4, flow5, flow6),
            node_rotations=tracked["node_rotations"],
            node_translations=tracked["node_translations"],
            deformations_validity=tracked["deformations_validity"],
            deformed_points=tracked["deformed_points"],
            valid_solve=tracked["valid_solve"],
            mask_prediction=mask_prediction,
            correspondence_weights=tracked["correspondence_weights"],
            target_matches=tracked["target_matches"],
            valid_correspondence_mask=tracked["valid_correspondence_mask"],
            gn_losses=tracked["gn_losses"],
        )
