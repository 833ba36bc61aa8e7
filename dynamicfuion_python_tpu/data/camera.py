"""Camera intrinsics IO (reference ``data/camera.py`` semantics: 4x4 text
matrix, upper-left 3x3 is the pinhole matrix)."""

from __future__ import annotations

from pathlib import Path

import numpy as np


def load_intrinsics_txt(path: str | Path) -> np.ndarray:
    """Load a DeepDeform ``intrinsics.txt`` -> f32[3, 3]."""
    mat = np.loadtxt(str(path), dtype=np.float64)
    if mat.shape == (4, 4):
        mat = mat[:3, :3]
    if mat.shape != (3, 3):
        raise ValueError(f"unexpected intrinsics shape {mat.shape} in {path}")
    return mat.astype(np.float32)


def crop_intrinsics(
    intrinsics: np.ndarray, crop_origin_uv: tuple[int, int]
) -> np.ndarray:
    """Shift the principal point for a crop starting at (u0, v0)
    (reference ``image_processing`` intrinsics cropping)."""
    out = intrinsics.copy()
    out[0, 2] -= crop_origin_uv[0]
    out[1, 2] -= crop_origin_uv[1]
    return out
