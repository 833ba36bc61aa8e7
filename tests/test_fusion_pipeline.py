"""End-to-end fusion pipeline smoke test on a synthetic bending-plane
sequence (the reference's blender-sequence integration-test role)."""

import numpy as np
import pytest

from dynamicfuion_python_tpu.apps.fusion_pipeline import FusionPipeline, run_fusion
from dynamicfuion_python_tpu.data.frame_sequence import (
    SyntheticBendingPlaneSequence,
)
from dynamicfuion_python_tpu.settings import Parameters
from dynamicfuion_python_tpu.utils.config import apply_overrides


@pytest.fixture(scope="module")
def params(tmp_path_factory):
    p = Parameters()
    p = apply_overrides(
        p,
        [
            "tsdf.voxel_size=0.01",
            "tsdf.sdf_truncation_distance=0.04",
            "tsdf.initial_block_count=1024",
            "graph.node_coverage=0.12",
            "graph.layer_count=2",
            "graph.erosion_num_iterations=1",
            "alignment.max_iteration_count=4",
            "alignment.arap_term_weight=20.0",
            # static-camera deforming scene: rigid ICP would wrongly explain
            # deformation as camera motion
            "alignment.use_rigid_alignment=false",
            "fusion.far_clip_distance=2.0",
            "fusion.extraction_max_triangles=120000",
            f"telemetry.output_directory={tmp_path_factory.mktemp('fusion_out')}",
            "telemetry.print_runtime=false",
        ],
    )
    return p


class TestFusionPipeline:
    def test_three_frame_fusion(self, params):
        seq = SyntheticBendingPlaneSequence(
            frame_count=3, image_size=(96, 128), bend_per_frame=0.02, focal=160.0
        )
        result = run_fusion(seq, params, run_name="test_run")
        assert result.summary["frame_count"] == 3
        # a surface was reconstructed
        assert len(result.canonical_mesh) > 500
        # the warp field tracked the bend: losses decreased within frames
        for frame in result.summary["frames"][1:]:
            assert frame["data_loss"][-1] <= frame["data_loss"][0] * 1.5
            assert frame["active_blocks"] > 0
        # canonical mesh stays near the frame-0 surface (z ~ 1.0 plane-ish)
        z = result.canonical_mesh[..., 2]
        assert 0.9 < float(np.median(z)) < 1.15
        # warp field translations are finite and bounded
        t = np.asarray(result.warp_field.node_translations)
        assert np.isfinite(t).all() and np.abs(t).max() < 0.2

    def test_checkpoint_resume(self, params, tmp_path):
        from dynamicfuion_python_tpu.utils.config import apply_overrides

        seq = SyntheticBendingPlaneSequence(
            frame_count=3, image_size=(96, 128), bend_per_frame=0.02, focal=160.0
        )
        ckpt = tmp_path / "fusion_ckpt"
        p2 = apply_overrides(params, ["telemetry.print_runtime=false"])
        full = run_fusion(
            seq, p2, run_name="resume_a", checkpoint_dir=str(ckpt),
            checkpoint_every=2,
        )
        # resume from the frame-1 checkpoint and process only frame 2
        resumed = run_fusion(
            seq, p2, run_name="resume_b", checkpoint_dir=str(ckpt), resume=True
        )
        assert resumed.summary["frame_count"] == 1
        t_full = np.asarray(full.warp_field.node_translations)
        t_res = np.asarray(resumed.warp_field.node_translations)
        np.testing.assert_allclose(t_res, t_full, atol=1e-4)

    def test_telemetry_outputs(self, params):
        import json
        from pathlib import Path

        out = Path(params.telemetry.output_directory) / "test_run"
        assert (out / "metrics.json").exists()
        data = json.loads((out / "metrics.json").read_text())
        assert data["frame_count"] == 3
        plys = list(out.glob("*_warped_mesh.ply"))
        assert len(plys) == 2
        from dynamicfuion_python_tpu.utils.telemetry import read_ply

        verts, faces = read_ply(plys[0])
        assert len(verts) > 0 and len(faces) == len(verts) // 3
