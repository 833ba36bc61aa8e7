"""Data layer: frame sequences (DeepDeform layout), camera IO, synthetic
sequences for tests/benchmarks."""

from dynamicfuion_python_tpu.data.frame_sequence import (
    FrameSequenceDataset,
    SyntheticBendingPlaneSequence,
)
from dynamicfuion_python_tpu.data.camera import load_intrinsics_txt

__all__ = [
    "FrameSequenceDataset",
    "SyntheticBendingPlaneSequence",
    "load_intrinsics_txt",
]
