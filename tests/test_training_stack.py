"""Training-stack smoke tests on the reference example data (read-only):
dataset construction, one train step, generate -> evaluate round trip."""

from pathlib import Path

import numpy as np
import pytest

EXAMPLE_DATA = Path("/root/reference/example_data")

pytestmark = pytest.mark.skipif(
    not EXAMPLE_DATA.exists(), reason="example data not mounted"
)


class TestDeformDataset:
    def test_sample_contents(self):
        from dynamicfuion_python_tpu.data.deform_dataset import DeformDataset

        ds = DeformDataset(
            EXAMPLE_DATA / "train",
            max_nodes=256,
            node_coverage=0.12,
            image_size=(128, 192),
        )
        assert len(ds) >= 1
        s = ds[0]
        assert s.source.shape == (128, 192, 6)
        assert s.flow_gt.shape == (128, 192, 2)
        assert np.isfinite(s.flow_gt).all()
        assert np.isfinite(s.scene_flow_gt).all()
        assert s.num_nodes > 4
        assert (s.pixel_anchors < s.num_nodes).all()
        # anchors of valid pixels reference only real (unpadded) nodes
        valid_px = s.source[..., 5] > 0
        anchors_of_valid = s.pixel_anchors[valid_px]
        assert (anchors_of_valid[anchors_of_valid >= 0] < s.num_nodes).all()
        # weights normalized where anchored
        wsum = s.pixel_weights.sum(-1)
        anchored = (s.pixel_anchors >= 0).any(-1)
        np.testing.assert_allclose(wsum[anchored], 1.0, atol=1e-4)

    def test_flow_io_round_trip(self, tmp_path, rng):
        from dynamicfuion_python_tpu.data.io import (
            load_flow_binary,
            load_flow_middlebury,
            save_flow_binary,
            save_flow_middlebury,
        )

        flow = rng.normal(size=(2, 12, 16)).astype(np.float32)
        save_flow_binary(tmp_path / "f.oflow", flow)
        np.testing.assert_array_equal(load_flow_binary(tmp_path / "f.oflow"), flow)
        flo = rng.normal(size=(12, 16, 2)).astype(np.float32)
        save_flow_middlebury(tmp_path / "f.flo", flo)
        np.testing.assert_array_equal(load_flow_middlebury(tmp_path / "f.flo"), flo)


class TestTrainStep:
    def test_two_iterations_decrease_loss(self, tmp_path):
        from dynamicfuion_python_tpu.apps.train import train

        params, hist = train(
            str(EXAMPLE_DATA),
            stage="1_solver",
            batch_size=1,
            iterations=2,
            max_nodes=256,
            image_size=(128, 192),
            node_coverage=0.12,
            checkpoint_dir=str(tmp_path / "ckpt"),
            learning_rate=1e-4,
        )
        assert np.isfinite(hist).all()
        assert hist[1] < hist[0]
        assert (tmp_path / "ckpt" / "latest.json").exists()
