"""Run telemetry: mesh/point-cloud recording (PLY), per-frame metrics.

Capability parity with the reference ``telemetry/telemetry_generator.py:26-284``
(timestamped output dir, toggled recorders for canonical/warped meshes,
per-frame metadata, runtime prints) minus the interactive Open3D viewers.
"""

from __future__ import annotations

import json
import struct
import time
from pathlib import Path

import numpy as np


def _materialize_metrics(frames: list) -> list:
    """Convert any device-resident arrays in recorded frame metrics into
    plain Python scalars/lists (one batched device_get per frame entry)."""

    def to_py(v):
        if isinstance(v, (list, tuple)):
            return [to_py(x) for x in v]
        if isinstance(v, dict):
            return {k: to_py(x) for k, x in v.items()}
        if isinstance(v, np.generic):
            return v.item()
        if (
            isinstance(v, np.ndarray)
            or hasattr(v, "__jax_array__")
            or type(v).__module__.startswith("jax")
        ):
            arr = np.asarray(v)
            return arr.item() if arr.ndim == 0 else arr.tolist()
        return v

    return [to_py(entry) for entry in frames]


def write_ply_triangle_soup(path: str | Path, triangles: np.ndarray) -> None:
    """Write a triangle soup f32[T, 3, 3] as a binary-little-endian PLY."""
    tris = np.asarray(triangles, np.float32)
    t = len(tris)
    verts = tris.reshape(-1, 3)
    faces = np.arange(3 * t, dtype=np.int32).reshape(-1, 3)
    _write_ply(path, verts, faces)


def write_ply_mesh(path: str | Path, vertices: np.ndarray, faces: np.ndarray) -> None:
    _write_ply(path, np.asarray(vertices, np.float32), np.asarray(faces, np.int32))


def _write_ply(path, verts, faces):
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {len(verts)}\n"
        "property float x\nproperty float y\nproperty float z\n"
        f"element face {len(faces)}\n"
        "property list uchar int vertex_indices\nend_header\n"
    )
    with open(path, "wb") as f:
        f.write(header.encode())
        f.write(verts.astype("<f4").tobytes())
        face_block = np.empty((len(faces), 13), np.uint8)
        face_block[:, 0] = 3
        face_block[:, 1:] = faces.astype("<i4").view(np.uint8).reshape(-1, 12)
        f.write(face_block.tobytes())


def read_ply(path: str | Path) -> tuple[np.ndarray, np.ndarray]:
    """Minimal reader for the files this module writes (tests/round-trip)."""
    with open(path, "rb") as f:
        data = f.read()
    header_end = data.index(b"end_header\n") + len(b"end_header\n")
    header = data[:header_end].decode()
    n_verts = int(header.split("element vertex ")[1].split("\n")[0])
    n_faces = int(header.split("element face ")[1].split("\n")[0])
    verts = np.frombuffer(
        data, "<f4", count=n_verts * 3, offset=header_end
    ).reshape(-1, 3)
    face_bytes = np.frombuffer(
        data,
        np.uint8,
        count=n_faces * 13,
        offset=header_end + n_verts * 12,
    ).reshape(-1, 13)
    faces = face_bytes[:, 1:].copy().view("<i4").reshape(-1, 3)
    return verts.copy(), faces


class TelemetryRecorder:
    """Per-run output directory with toggled recorders."""

    def __init__(self, config, run_name: str | None = None):
        self.config = config
        stamp = run_name or time.strftime("%y-%m-%d-%H-%M-%S")
        self.run_dir = Path(config.output_directory) / stamp
        self.run_dir.mkdir(parents=True, exist_ok=True)
        self.frame_metrics: list[dict] = []
        self._start_time = time.perf_counter()

    def record_meshes(self, frame_index: int, canonical=None, warped=None):
        if canonical is not None and self.config.record_canonical_meshes:
            write_ply_triangle_soup(
                self.run_dir / f"{frame_index:06d}_canonical_mesh.ply", canonical
            )
        if warped is not None and self.config.record_warped_meshes:
            write_ply_triangle_soup(
                self.run_dir / f"{frame_index:06d}_warped_mesh.ply", warped
            )

    def record_gn_iterations(
        self,
        frame_index: int,
        data_losses,
        arap_losses,
        node_translations_per_iteration=None,
        node_positions=None,
    ):
        """Per-GN-iteration losses + warped node point clouds (reference
        ``process_gn_point_clouds``, telemetry_generator.py:88-113)."""
        if not self.config.record_gn_point_clouds:
            return
        np.savez_compressed(
            self.run_dir / f"{frame_index:06d}_gn_iterations.npz",
            data_losses=np.asarray(data_losses, np.float32),
            arap_losses=np.asarray(arap_losses, np.float32),
            **(
                {
                    "node_translations": np.asarray(
                        node_translations_per_iteration, np.float32
                    )
                }
                if node_translations_per_iteration is not None
                else {}
            ),
            **(
                {"node_positions": np.asarray(node_positions, np.float32)}
                if node_positions is not None
                else {}
            ),
        )

    def record_correspondences(
        self,
        frame_index: int,
        source_points=None,
        target_matches=None,
        correspondence_mask=None,
        mask_prediction=None,
    ):
        """Correspondence sets + mask predictions from the tracking prior
        (reference ``process_correspondences``)."""
        if not self.config.record_correspondences:
            return
        arrays = {}
        if source_points is not None:
            arrays["source_points"] = np.asarray(source_points, np.float32)
        if target_matches is not None:
            arrays["target_matches"] = np.asarray(target_matches, np.float32)
        if correspondence_mask is not None:
            arrays["correspondence_mask"] = np.asarray(
                correspondence_mask, bool
            )
        if mask_prediction is not None:
            arrays["mask_prediction"] = np.asarray(mask_prediction, np.float32)
        if arrays:
            np.savez_compressed(
                self.run_dir / f"{frame_index:06d}_correspondences.npz",
                **arrays,
            )

    def record_rendered_warped_mesh(self, frame_index: int, color, depth):
        """Rendered warped-mesh color + depth images (reference
        ``process_rendering_result``)."""
        if not self.config.record_rendered_warped_mesh:
            return
        from PIL import Image

        rgb = np.clip(np.asarray(color) * 255.0, 0, 255).astype(np.uint8)
        Image.fromarray(rgb).save(
            self.run_dir / f"{frame_index:06d}_rendered_color.png"
        )
        d16 = np.clip(np.asarray(depth) * 1000.0, 0, 65535).astype(np.uint16)
        Image.fromarray(d16).save(
            self.run_dir / f"{frame_index:06d}_rendered_depth.png"
        )

    def record_frame(self, frame_index: int, **metrics):
        entry = {"frame": frame_index, **metrics}
        self.frame_metrics.append(entry)
        if self.config.print_frame_info:
            print(f"[frame {frame_index}] {metrics}")

    def finish(self) -> dict:
        total = time.perf_counter() - self._start_time
        fps = len(self.frame_metrics) / total if total > 0 else 0.0
        # streaming pipelines (fusion.sync_frame_metrics=false) record
        # device-resident jax arrays per frame to keep the hot loop free of
        # host syncs; drain them all HERE, once, so json.dumps below never
        # sees a jax array (ADVICE r4 #2: it raised TypeError at end of run
        # and lost every metric)
        self.frame_metrics = _materialize_metrics(self.frame_metrics)
        summary = {
            "total_runtime_s": total,
            "frames_per_second": fps,
            "frame_count": len(self.frame_metrics),
            "frames": self.frame_metrics,
        }
        if self.config.record_frame_metrics:
            (self.run_dir / "metrics.json").write_text(json.dumps(summary, indent=1))
        if self.config.print_runtime:
            print(
                f"total runtime: {total:.2f} s for "
                f"{len(self.frame_metrics)} frames ({fps:.2f} frames/s)"
            )
        return summary
