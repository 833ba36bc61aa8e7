"""Typed parameter tree for the whole framework.

Capability parity with the reference settings layer (``settings/*.py``:
``Parameters.{path,model,device,training,deform_net,alignment,graph,fusion,tsdf}``
built on ext_argparse) — same domains and parameter names where sensible,
expressed as the dataclass tree from ``utils/config.py`` with YAML round-trip
and dotted CLI overrides.
"""

from __future__ import annotations

import enum
from dataclasses import field

from dynamicfuion_python_tpu.utils.config import config_node


class GraphGenerationMode(enum.Enum):
    """Reference ``settings/fusion.py`` ``GraphGenerationMode``."""

    FIRST_FRAME_EXTRACTED_MESH = 0
    FIRST_FRAME_DEPTH_IMAGE = 1
    FIRST_FRAME_LOADED_GRAPH = 2


class AnchorComputationMode(enum.Enum):
    """Reference ``settings/fusion.py`` ``AnchorComputationMode``."""

    EUCLIDEAN = 0
    SHORTEST_PATH = 1
    PRECOMPUTED = 2


class TrackingSpanMode(enum.Enum):
    """Reference ``settings/fusion.py`` ``TrackingSpanMode``."""

    FIRST_TO_CURRENT = 0
    PREVIOUS_TO_CURRENT = 1
    KEYFRAME_TO_CURRENT = 2


class SourceImageMode(enum.Enum):
    """Reference ``settings/fusion.py`` ``SourceImageMode`` (how the neural
    prior's source RGBD pair is produced)."""

    IMAGE_ONLY = 0
    RENDERED_ONLY = 1
    RENDERED_WITH_PREVIOUS_FRAME_OVERLAY = 2


class MeshExtractionWeightThresholdingMode(enum.Enum):
    """Reference ``settings/fusion.py``
    ``MeshExtractionWeightThresholdingMode``."""

    CONSTANT = 0
    RAMP_UP_TO_CONSTANT = 1


@config_node
class TsdfConfig:
    """Reference ``settings/tsdf.py``."""

    voxel_size: float = 0.004
    sdf_truncation_distance: float = 0.02
    block_resolution: int = 8
    initial_block_count: int = 2048  # here: fixed table capacity
    # static cap on blocks integrated per frame (compacted active list);
    # bounds the per-frame voxel work independent of table capacity
    max_active_blocks: int = 1024


@config_node
class GraphConfig:
    """Reference ``settings/graph.py``."""

    node_coverage: float = 0.05
    erosion_num_iterations: int = 10
    erosion_min_neighbors: int = 4
    neighbor_count: int = 8
    max_neighbor_count: int = 8
    minimum_valid_anchor_count: int = 3
    anchor_count: int = 4
    layer_count: int = 4
    max_vertex_degree: int = 4


@config_node
class AlignmentConfig:
    """Reference ``settings/alignment.py`` + fitter params
    (``DeformableMeshToImageFitter.h:30-129``)."""

    max_iteration_count: int = 6
    # convergence early-exit: stop GN once max |update| falls below this
    # (reference ``minimal_update_threshold``,
    # ``DeformableMeshToImageFitter.h:35-37``); 0 always runs the maximum
    min_update_threshold: float = 1e-6
    arap_term_weight: float = 20.0
    use_tukey_penalty: bool = False
    tukey_penalty_cutoff: float = 0.01
    use_huber_penalty: bool = False
    huber_penalty_constant: float = 0.0001
    levenberg_marquardt_factor: float = 0.001
    max_depth: float = 10.0
    use_regularization: bool = True
    # rigid pre-alignment (reference pipeline.py:343-354 runs 3-level
    # point-to-plane odometry before the non-rigid stage)
    use_rigid_alignment: bool = True
    # GN iteration-mode schedule, comma-separated and cycled over the
    # iteration count (reference ``DeformableMeshToImageFitter.h:58``
    # ``iteration_mode_sequence``): e.g. "translation_only,all" warms up
    # translations before full 6-dof steps. Values: all / translation_only /
    # rotation_only.
    iteration_modes: str = "all"
    # data-term Hessian lumping (w j j^T instead of (w j)(w j)^T): exact for
    # rigid motions and contractive in general; False reproduces the literal
    # reference block-Jacobi math (``models/fitter.py`` FitterConfig docs)
    lump_data_hessian: bool = True
    # valid-solve guard: physical per-iteration limits + solve-residual
    # conditioning tolerance (see FitterConfig.valid_solve_*);
    # translation limit 0 -> max(4 * graph.node_coverage, 0.4 m)
    valid_solve_rotation_limit: float = 0.5
    valid_solve_translation_limit: float = 0.0
    valid_solve_residual_tolerance: float = 2.0
    # strict tolerance applied when the arrowhead solver's escalating
    # damping fired (the solve must accurately reproduce the DAMPED system
    # it factorized; see FitterConfig.valid_solve_escalated_residual_*)
    valid_solve_escalated_residual_tolerance: float = 0.35
    # data-term implementation: "face" (face-major tables + covered-pixel
    # compaction, the TPU production default), "fast" (pixel-major
    # analytic), "autodiff" (vmapped-jacrev oracle) — all parity-pinned in
    # tests/test_fitter.py
    data_term_impl: str = "face"
    # covered-pixel compaction fraction for the "face" data term (0
    # disables; pixels beyond ceil(H*W*fraction) covered ones are dropped
    # from the normal equations)
    pixel_compaction_fraction: float = 0.6
    # coarse-to-fine GN schedule (the reference fitter is explicitly
    # coarse-to-fine): the first ``coarse_iteration_count`` iterations fit a
    # ``coarse_factor``-strided observed frame, the rest polish at full
    # resolution. 0 disables; only applies to single-mode iteration_modes
    coarse_iteration_count: int = 0
    coarse_factor: int = 2


@config_node
class FusionConfig:
    """Reference ``settings/fusion.py``."""

    depth_scale: float = 1000.0
    far_clip_distance: float = 2.4
    graph_generation_mode: GraphGenerationMode = (
        GraphGenerationMode.FIRST_FRAME_EXTRACTED_MESH
    )
    pixel_anchor_computation_mode: AnchorComputationMode = (
        AnchorComputationMode.EUCLIDEAN
    )
    tracking_span_mode: TrackingSpanMode = TrackingSpanMode.FIRST_TO_CURRENT
    source_image_mode: SourceImageMode = SourceImageMode.IMAGE_ONLY
    keyframe_interval: int = 50
    start_at_frame: int = 0
    run_until_frame: int = -1
    extraction_max_triangles: int = 400000
    # loaded-graph mode only: crop the first-frame integration to within
    # 2 * graph.node_coverage of the loaded nodes (the reference's graph
    # blobs come from a masked salient subject; the node coverage region is
    # that mask's proxy). No effect in the other graph-generation modes
    crop_to_graph_coverage: bool = True
    # pre-size the canonical-mesh capacity buckets (power-of-two) so the
    # fit/extraction programs compile ONCE instead of recompiling as the
    # surface grows; 0 = adapt from 4096 upward (each growth recompiles)
    mesh_capacity_hint: int = 0
    # mesh-extraction weight thresholding (reference
    # determine_mesh_extraction_threshold, pipeline.py:451-462)
    mesh_extraction_weight_thresholding_mode: MeshExtractionWeightThresholdingMode = (
        MeshExtractionWeightThresholdingMode.RAMP_UP_TO_CONSTANT
    )
    mesh_extraction_weight_threshold: float = 10.0
    # neural tracking prior (SURVEY §0: dense-depth fitter primary, neural
    # tracking as prior/bootstrap initializing node transforms each frame)
    use_neural_prior: bool = False
    prior_checkpoint: str = ""
    # fetch per-frame scalar metrics synchronously (one device->host round
    # trip per frame). False keeps them on device: ``process_frame`` returns
    # jax arrays and the caller resolves them (``resolve_frame_metrics``)
    # when convenient — the streaming loop then never blocks on the tunnel.
    sync_frame_metrics: bool = True


@config_node
class TelemetryConfig:
    """Reference ``settings/fusion.py`` telemetry toggles
    (``telemetry/telemetry_generator.py:26``)."""

    output_directory: str = "output"
    record_canonical_meshes: bool = True
    record_warped_meshes: bool = True
    record_frame_metrics: bool = True
    # per-GN-iteration losses + warped node point clouds (reference
    # telemetry_generator.py:88-113 gn point-cloud recorder)
    record_gn_point_clouds: bool = False
    # prior correspondence sets + mask predictions (reference
    # process_correspondences)
    record_correspondences: bool = False
    # rendered warped-mesh color/depth PNGs (reference
    # process_rendering_result)
    record_rendered_warped_mesh: bool = False
    print_frame_info: bool = False
    print_runtime: bool = True


@config_node
class TrainingConfig:
    """Reference ``settings/training.py`` (DeformNet training)."""

    batch_size: int = 4
    learning_rate: float = 1e-5
    use_adam: bool = False
    momentum: float = 0.9
    weight_decay: float = 0.0
    epochs: int = 10
    shuffle: bool = True
    gn_max_matches_train: int = 10000
    gn_max_matches_eval: int = 10000


@config_node
class Parameters:
    """Root of the tree (reference ``settings/__init__.py:20-48``)."""

    tsdf: TsdfConfig = None  # type: ignore
    graph: GraphConfig = None  # type: ignore
    alignment: AlignmentConfig = None  # type: ignore
    fusion: FusionConfig = None  # type: ignore
    telemetry: TelemetryConfig = None  # type: ignore
    training: TrainingConfig = None  # type: ignore

    def __post_init__(self):
        if self.tsdf is None:
            self.tsdf = TsdfConfig()
        if self.graph is None:
            self.graph = GraphConfig()
        if self.alignment is None:
            self.alignment = AlignmentConfig()
        if self.fusion is None:
            self.fusion = FusionConfig()
        if self.telemetry is None:
            self.telemetry = TelemetryConfig()
        if self.training is None:
            self.training = TrainingConfig()
