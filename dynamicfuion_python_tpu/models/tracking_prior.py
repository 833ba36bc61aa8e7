"""Neural tracking prior for the fusion pipeline.

The reference's flagship loop calls ``run_non_rigid_alignment``
(``alignment/interface.py:12-63``) inside ``apps/fusion/pipeline.py:238-431``
and uses the DeformNet result AS the tracking. Our architecture (SURVEY §0
caveat) keeps the dense-depth fitter as the PRIMARY tracker and uses neural
tracking as the prior/bootstrap: this module produces per-node transform
predictions that initialize the warp field before ``fit_to_image``, which
lets the fitter survive large inter-frame motion its local linearization
would otherwise stall on.

Flow can come from three sources, in priority order:
  1. an injected dense flow field (``flow_override``) — tests use the
     synthetic sequence's analytic flow; deployments can feed precomputed
     optical flow;
  2. the PWC-Net inside a converted DeformNet checkpoint;
  3. nothing — the prior is disabled and the fitter runs alone.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from dynamicfuion_python_tpu.models.deform_net import (
    TrackingGuards,
    track_from_flow,
)
from dynamicfuion_python_tpu.models.gn_point_cloud_optimizer import GnConfig


class PriorResult(NamedTuple):
    rotations: jnp.ndarray  # [N, 3, 3]
    translations: jnp.ndarray  # [N, 3]
    valid_solve: bool
    correspondence_mask: jnp.ndarray  # bool[H, W]


class NeuralTrackingPrior:
    """Per-frame node-transform prediction from dense flow.

    Mirrors ``run_non_rigid_alignment`` (``alignment/interface.py:12-63``):
    given a source RGBD estimate (previous frame or rendered model, per
    ``SourceImageMode``), the target frame, and pixel anchors/weights versus
    the graph nodes, solve the neural tracker's Gauss-Newton system for node
    rotations/translations.
    """

    def __init__(
        self,
        gn_config: GnConfig = GnConfig(),
        guards: TrackingGuards = TrackingGuards(),
        deform_net=None,
        deform_net_params=None,
    ):
        self.gn_config = gn_config
        self.guards = guards
        self.deform_net = deform_net
        self.deform_net_params = deform_net_params

    def predict(
        self,
        source_rgbxyz: jnp.ndarray,  # [H, W, 6]
        target_rgbxyz: jnp.ndarray,  # [H, W, 6]
        graph_nodes: jnp.ndarray,  # [N, 3] (warped or canonical, caller picks)
        graph_edges: jnp.ndarray,  # int32[N, Ke]
        graph_edges_weights: jnp.ndarray,  # [N, Ke]
        graph_clusters: jnp.ndarray,  # int32[N]
        pixel_anchors: jnp.ndarray,  # int32[H, W, 4]
        pixel_weights: jnp.ndarray,  # [H, W, 4]
        intrinsics: jnp.ndarray,  # [3, 3]
        flow_override: jnp.ndarray | None = None,  # [H, W, 2]
        initial_rotations: jnp.ndarray | None = None,  # [N, 3, 3]
        initial_translations: jnp.ndarray | None = None,  # [N, 3]
    ) -> PriorResult:
        if flow_override is not None:
            flow = jnp.asarray(flow_override, jnp.float32)
        elif self.deform_net is not None and self.deform_net_params is not None:
            out = self.deform_net.apply(
                self.deform_net_params,
                source_rgbxyz[None],
                target_rgbxyz[None],
                graph_nodes[None],
                graph_edges[None],
                graph_edges_weights[None],
                graph_clusters[None],
                pixel_anchors[None],
                pixel_weights[None],
                intrinsics,
                evaluate=True,
                node_rotations_estimate=(
                    None
                    if initial_rotations is None
                    else initial_rotations[None]
                ),
                node_translations_estimate=(
                    None
                    if initial_translations is None
                    else initial_translations[None]
                ),
            )
            return PriorResult(
                rotations=out.node_rotations[0],
                translations=out.node_translations[0],
                valid_solve=bool(out.valid_solve[0]),
                correspondence_mask=out.valid_correspondence_mask[0],
            )
        else:
            raise ValueError(
                "NeuralTrackingPrior needs either a flow_override or a "
                "DeformNet + params"
            )

        tracked = _track_jit(
            flow[None],
            source_rgbxyz[None],
            target_rgbxyz[None],
            graph_nodes[None],
            graph_edges[None],
            graph_edges_weights[None],
            graph_clusters[None],
            pixel_anchors[None],
            pixel_weights[None],
            jnp.broadcast_to(jnp.asarray(intrinsics, jnp.float32), (1, 3, 3)),
            self.gn_config,
            self.guards,
            None if initial_rotations is None else initial_rotations[None],
            None
            if initial_translations is None
            else initial_translations[None],
        )
        return PriorResult(
            rotations=tracked["node_rotations"][0],
            translations=tracked["node_translations"][0],
            valid_solve=bool(tracked["valid_solve"][0]),
            correspondence_mask=tracked["valid_correspondence_mask"][0],
        )


def _track_impl(
    flow,
    source,
    target,
    nodes,
    edges,
    edge_weights,
    clusters,
    anchors,
    weights,
    intrinsics,
    gn_config,
    guards,
    initial_rotations,
    initial_translations,
):
    return track_from_flow(
        flow,
        source,
        target,
        nodes,
        edges,
        edge_weights,
        clusters,
        anchors,
        weights,
        intrinsics,
        gn_config=gn_config,
        guards=guards,
        initial_rotations=initial_rotations,
        initial_translations=initial_translations,
    )


_track_jit = jax.jit(_track_impl, static_argnums=(10, 11))


def rgbxyz_from_depth(
    depth: np.ndarray,
    color: np.ndarray | None,
    intrinsics,
    depth_scale: float,
    depth_max: float,
) -> jnp.ndarray:
    """[H, W, 6] rgbxyz stack (the ``DeformDataset.prepare_pytorch_input``
    role, NHWC)."""
    from dynamicfuion_python_tpu.ops.camera import unproject_depth_image

    points, mask = unproject_depth_image(
        jnp.asarray(depth), jnp.asarray(intrinsics, jnp.float32),
        depth_scale, depth_max,
    )
    points = jnp.where(mask[..., None], points, 0.0)
    h, w = points.shape[:2]
    if color is None:
        rgb = jnp.zeros((h, w, 3), jnp.float32)
    else:
        rgb = jnp.asarray(color, jnp.float32) / 255.0
    return jnp.concatenate([rgb, points], axis=-1)
