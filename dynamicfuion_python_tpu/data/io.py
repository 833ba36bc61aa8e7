"""Binary IO for flow / scene-flow files (reference ``data/io.py`` formats:
``.oflow``/``.sflow`` little-endian [channels, height, width] blobs, plus
Middlebury ``.flo``)."""

from __future__ import annotations

import struct
from pathlib import Path

import numpy as np


def load_flow_binary(path: str | Path) -> np.ndarray:
    """-> f32[C, H, W] (C=2 optical flow, C=3 scene flow)."""
    with open(path, "rb") as f:
        width, height, channels = struct.unpack("III", f.read(12))
        data = np.frombuffer(f.read(width * height * channels * 4), np.float32)
    return data.reshape(channels, height, width).copy()


def save_flow_binary(path: str | Path, flow: np.ndarray) -> None:
    assert flow.ndim == 3
    with open(path, "wb") as f:
        f.write(struct.pack("III", flow.shape[2], flow.shape[1], flow.shape[0]))
        f.write(flow.astype("<f4").tobytes())


def load_flow_middlebury(path: str | Path) -> np.ndarray:
    with open(path, "rb") as f:
        if f.read(4) != b"PIEH":
            raise ValueError("not a Middlebury .flo file")
        width, height = np.frombuffer(f.read(8), np.int32)
        data = np.frombuffer(f.read(width * height * 8), np.float32)
    return data.reshape(height, width, 2).copy()


def save_flow_middlebury(path: str | Path, flow: np.ndarray) -> None:
    with open(path, "wb") as f:
        f.write(b"PIEH")
        np.asarray([flow.shape[1], flow.shape[0]], np.int32).tofile(f)
        flow.astype(np.float32).tofile(f)
