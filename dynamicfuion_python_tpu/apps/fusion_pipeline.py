"""DynamicFusion pipeline: dense non-rigid RGB-D fusion over a sequence.

Capability parity with the reference flagship entry point
(``run_fusion.py`` -> ``apps/fusion/pipeline.py:45-601`` ``FusionPipeline``),
re-architected around the dense-depth fitter as primary tracker (the
reference's intended July-2023 design, README.md:9-15, which its Python app
never wired up):

  frame 0:  discover + activate blocks -> rigid TSDF integrate -> build the
            deformation graph from the depth image (erode -> sample nodes ->
            hierarchy layers)
  frame t:  unproject depth (+normals) -> fit warp field via
            Gauss-Newton/LM mesh-to-image alignment (arrowhead solve) ->
            find blocks intersecting the warped truncation region -> sleeve
            activation -> non-rigid integrate -> extract canonical mesh ->
            forward-warp for telemetry

Per-frame device work is jit-compiled; graph construction runs host-side
once (SURVEY.md §7.2 item 7).

Run:  python -m dynamicfuion_python_tpu.apps.fusion_pipeline \
          --sequence <dir>|synthetic [key=value overrides...]
"""

from __future__ import annotations

import sys
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from dynamicfuion_python_tpu.data.frame_sequence import (
    FrameSequenceDataset,
    SyntheticBendingPlaneSequence,
)
from dynamicfuion_python_tpu.models.fitter import (
    FitterConfig,
    IterationMode,
    fit_to_image,
)
from dynamicfuion_python_tpu.models.voxel_block_grid import VoxelBlockGrid
from dynamicfuion_python_tpu.models.warp_field import (
    HierarchicalGraphWarpField,
    NodeCoverageMethod,
)
from dynamicfuion_python_tpu.ops.camera import unproject_depth_image
from dynamicfuion_python_tpu.ops.graph_construction import (
    mesh_from_depth_image,
    sample_nodes,
    vertex_erosion_mask,
)
from dynamicfuion_python_tpu.ops.normals import point_image_normals
from dynamicfuion_python_tpu.settings import Parameters
from dynamicfuion_python_tpu.utils.telemetry import TelemetryRecorder


@dataclass
class FusionResult:
    warp_field: HierarchicalGraphWarpField
    volume: VoxelBlockGrid
    canonical_mesh: np.ndarray  # triangle soup f32[T, 3, 3]
    summary: dict


class FusionPipeline:
    """Orchestrates the per-frame fusion loop."""

    def __init__(self, params: Parameters, intrinsics: np.ndarray):
        self.params = params
        self.intrinsics = jnp.asarray(intrinsics, jnp.float32)
        t = params.tsdf
        self.volume = VoxelBlockGrid.create(
            capacity=t.initial_block_count,
            voxel_size=t.voxel_size,
            block_resolution=t.block_resolution,
            sdf_truncation_distance=t.sdf_truncation_distance,
            depth_scale=params.fusion.depth_scale,
            depth_max=params.fusion.far_clip_distance,
        )
        self.warp_field: HierarchicalGraphWarpField | None = None
        self.canonical_vertices: jnp.ndarray | None = None
        self.canonical_triangles: jnp.ndarray | None = None
        # cumulative camera pose: maps canonical(frame-0) camera space ->
        # current camera space; updated by rigid odometry each frame
        self.extrinsics = jnp.eye(4)
        self.previous_depth: jnp.ndarray | None = None
        a = params.alignment
        self.fitter_config = FitterConfig(
            max_iterations=a.max_iteration_count,
            iteration_modes=(IterationMode.ALL,),
            arap_term_weight=a.arap_term_weight,
            use_tukey_penalty=a.use_tukey_penalty,
            tukey_cutoff=a.tukey_penalty_cutoff,
            use_huber_penalty=a.use_huber_penalty,
            huber_constant=a.huber_penalty_constant,
            levenberg_marquardt_factor=a.levenberg_marquardt_factor,
            max_depth=a.max_depth,
            use_regularization=a.use_regularization,
        )

    # -- first frame ---------------------------------------------------------

    def initialize(self, depth: np.ndarray, color: np.ndarray | None):
        p = self.params
        depth_j = jnp.asarray(depth)
        keys = self.volume.compute_unique_block_coordinates(
            depth_j, self.intrinsics, stride=2
        )
        self.volume = self.volume.activate(keys)
        color_j = (
            jnp.asarray(color, jnp.float32) / 255.0 if color is not None else None
        )
        self.volume = self.volume.integrate(depth_j, self.intrinsics, color=color_j)

        # graph from the depth image (GraphGenerationMode.FIRST_FRAME_DEPTH_IMAGE)
        points, mask = unproject_depth_image(
            depth_j,
            self.intrinsics,
            p.fusion.depth_scale,
            p.fusion.far_clip_distance,
        )
        verts, vert_pixels, faces = mesh_from_depth_image(
            np.asarray(points), max_triangle_edge_distance=2 * p.graph.node_coverage
        )
        erosion = vertex_erosion_mask(
            verts,
            faces,
            p.graph.erosion_num_iterations,
            p.graph.erosion_min_neighbors,
        )
        nodes, node_vertex_idx = sample_nodes(
            verts, erosion, p.graph.node_coverage, use_only_non_eroded=True
        )
        if len(nodes) < p.graph.anchor_count:
            # tiny scene fallback: sample without erosion
            nodes, node_vertex_idx = sample_nodes(
                verts, None, p.graph.node_coverage, use_only_non_eroded=False
            )
        self.warp_field = HierarchicalGraphWarpField.build(
            nodes,
            node_coverage=p.graph.node_coverage,
            layer_count=min(
                p.graph.layer_count, _max_feasible_layers(len(nodes))
            ),
            max_vertex_degree=p.graph.max_vertex_degree,
            anchor_count=p.graph.anchor_count,
            minimum_valid_anchor_count=p.graph.minimum_valid_anchor_count,
            threshold_nodes_by_distance=p.graph.minimum_valid_anchor_count > 0,
            coverage_method=NodeCoverageMethod.FIXED,
        )
        self._refresh_canonical_mesh()

    def _refresh_canonical_mesh(self):
        tris, count = self.volume.extract_triangle_soup(
            max_triangles=self.params.fusion.extraction_max_triangles
        )
        self.canonical_mesh_soup = np.asarray(tris)[: int(count)]
        # keep FULL static-capacity arrays for the fitter so per-frame shapes
        # never change (padding triangles sit at the origin, z=0, and are
        # culled by the rasterizer's near-plane test)
        self.canonical_vertices = tris.reshape(-1, 3)
        self.canonical_triangles = jnp.arange(
            tris.shape[0] * 3, dtype=jnp.int32
        ).reshape(-1, 3)

    # -- subsequent frames ---------------------------------------------------

    def process_frame(self, depth: np.ndarray, color: np.ndarray | None) -> dict:
        p = self.params
        depth_j = jnp.asarray(depth)

        # RIGID stage: frame-to-frame point-to-plane ICP accumulates the
        # camera pose; observations are expressed in the canonical camera
        # frame before the non-rigid fit.
        rigid_rmse = 0.0
        if p.alignment.use_rigid_alignment and self.previous_depth is not None:
            from dynamicfuion_python_tpu.ops.rigid_odometry import (
                rigid_odometry_multi_scale,
            )

            delta, rmse = rigid_odometry_multi_scale(
                self.previous_depth,
                depth_j,
                self.intrinsics,
                depth_scale=p.fusion.depth_scale,
                depth_max=p.fusion.far_clip_distance,
            )
            self.extrinsics = delta @ self.extrinsics
            rigid_rmse = float(rmse)
        self.previous_depth = depth_j

        points, mask = unproject_depth_image(
            depth_j,
            self.intrinsics,
            p.fusion.depth_scale,
            p.fusion.far_clip_distance,
        )
        if p.alignment.use_rigid_alignment:
            from dynamicfuion_python_tpu.ops.camera import transform_points

            inv = jnp.linalg.inv(self.extrinsics)
            points = jnp.where(
                mask[..., None],
                transform_points(points.reshape(-1, 3), inv).reshape(points.shape),
                0.0,
            )

        self.warp_field, diagnostics = fit_to_image(
            self.warp_field,
            self.canonical_vertices,
            self.canonical_triangles,
            points,
            mask,
            self.intrinsics,
            self.fitter_config,
        )

        ext = (
            self.extrinsics if p.alignment.use_rigid_alignment else None
        )
        intersecting = self.volume.find_blocks_intersecting_truncation_region(
            depth_j, self.warp_field, self.intrinsics,
            post_warp_extrinsics=ext,
        )
        self.volume = self.volume.activate_sleeve_blocks(intersecting)
        intersecting = self.volume.find_blocks_intersecting_truncation_region(
            depth_j, self.warp_field, self.intrinsics,
            post_warp_extrinsics=ext,
        )
        color_j = (
            jnp.asarray(color, jnp.float32) / 255.0 if color is not None else None
        )
        # normal map for the oblique-angle test is in the current camera
        # frame; recompute from the untransformed observation
        raw_points, _ = unproject_depth_image(
            depth_j, self.intrinsics, p.fusion.depth_scale,
            p.fusion.far_clip_distance,
        )
        # compact the active-block list so per-frame voxel work scales with
        # the visible surface, not the table capacity
        max_active = min(
            p.tsdf.max_active_blocks, self.volume.capacity
        )
        (active_slots,) = jnp.nonzero(
            intersecting, size=max_active, fill_value=0
        )
        active_valid = intersecting[active_slots] & (
            jnp.arange(max_active) < jnp.sum(intersecting)
        )
        self.volume = self.volume.integrate_non_rigid(
            active_slots,
            active_valid,
            self.warp_field,
            depth_j,
            self.intrinsics,
            color=color_j,
            normals=point_image_normals(raw_points),
            post_warp_extrinsics=ext,
        )
        self._refresh_canonical_mesh()
        return {
            "data_loss": [float(x) for x in diagnostics["data_loss"]],
            "arap_loss": [float(x) for x in diagnostics["arap_loss"]],
            "active_blocks": int(jnp.sum(intersecting)),
            "rigid_rmse": rigid_rmse,
        }

    def warped_mesh_soup(self) -> np.ndarray:
        """Forward-warp the canonical soup by the current field (telemetry,
        reference ``extract_and_warp_canonical_mesh``)."""
        warped = self.warp_field.warp_points(self.canonical_vertices)
        return np.asarray(warped).reshape(-1, 3, 3)


def _max_feasible_layers(node_count: int) -> int:
    # each layer needs to shrink; with few nodes keep it flat
    if node_count < 8:
        return 1
    if node_count < 24:
        return 2
    return 4


def run_fusion(
    sequence,
    params: Parameters,
    run_name: str | None = None,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 0,
    resume: bool = False,
) -> FusionResult:
    from dynamicfuion_python_tpu.utils.tensor_io import (
        load_fusion_checkpoint,
        save_fusion_checkpoint,
    )

    telemetry = TelemetryRecorder(params.telemetry, run_name)
    intrinsics = sequence.intrinsics
    pipeline = FusionPipeline(params, intrinsics)
    resume_after = -1
    if resume and checkpoint_dir is not None:
        volume, field, resume_after = load_fusion_checkpoint(checkpoint_dir)
        pipeline.volume = volume
        pipeline.warp_field = field
        pipeline._refresh_canonical_mesh()
    first = resume_after < 0
    for frame in sequence:
        if frame.index <= resume_after:
            continue
        if first:
            first = False
            pipeline.initialize(frame.depth, frame.color)
            telemetry.record_frame(frame.index, nodes=pipeline.warp_field.num_nodes)
        else:
            metrics = pipeline.process_frame(frame.depth, frame.color)
            telemetry.record_frame(frame.index, **metrics)
            telemetry.record_meshes(
                frame.index,
                canonical=pipeline.canonical_mesh_soup,
                warped=pipeline.warped_mesh_soup(),
            )
        if (
            checkpoint_dir is not None
            and checkpoint_every > 0
            and (frame.index + 1) % checkpoint_every == 0
        ):
            save_fusion_checkpoint(
                checkpoint_dir, pipeline.volume, pipeline.warp_field, frame.index
            )
    summary = telemetry.finish()
    return FusionResult(
        warp_field=pipeline.warp_field,
        volume=pipeline.volume,
        canonical_mesh=pipeline.canonical_mesh_soup,
        summary=summary,
    )


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    from dynamicfuion_python_tpu.utils.config import apply_overrides, load_config

    seq_arg = "synthetic"
    overrides = []
    yaml_path = None
    n_frames = 5
    size = (240, 320)
    it = iter(argv)
    for arg in it:
        if arg == "--sequence":
            seq_arg = next(it)
        elif arg == "--config":
            yaml_path = next(it)
        elif arg == "--frames":
            n_frames = int(next(it))
        elif arg == "--size":
            h, w = next(it).split("x")
            size = (int(h), int(w))
        elif arg == "--platform":
            # must land before any backend use; overrides the env-provided
            # platform (the deployment harness pins JAX_PLATFORMS at
            # interpreter startup, so the env var alone is not enough)
            jax.config.update("jax_platforms", next(it))
        else:
            overrides.append(arg)
    params = load_config(Parameters, yaml_path, overrides)

    if seq_arg == "synthetic":
        sequence = SyntheticBendingPlaneSequence(
            frame_count=n_frames, image_size=size, focal=min(size) * 1.4
        )
    else:
        params_until = params.fusion.run_until_frame
        sequence = FrameSequenceDataset(
            seq_arg,
            start_at_frame=params.fusion.start_at_frame,
            run_until_frame=None if params_until < 0 else params_until,
            far_clip_mm=int(params.fusion.far_clip_distance * 1000),
        )
    result = run_fusion(sequence, params)
    print(
        f"fusion done: {result.summary['frame_count']} frames, "
        f"{len(result.canonical_mesh)} triangles in canonical mesh"
    )
    return result


if __name__ == "__main__":
    main()
