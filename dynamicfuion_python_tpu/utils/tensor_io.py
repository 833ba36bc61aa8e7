"""Compressed binary serialization of tensors, voxel grids, warp fields, and
whole fusion-pipeline state.

Capability parity with the reference's ``cpp/io`` layer (``TensorIO``,
``VoxelBlockGridIO`` — zlib-compressed blobs exposed as
``nnrt.io.write/read_tensor`` and ``write/read_(non_rigid_surface_)voxel_block_grid``,
``cpp/pybind/io.cpp:40-70``) plus the checkpoint/resume design the reference
lacks (SURVEY.md §5.4): a fusion checkpoint bundles {TSDF block table, warp
field state, frame index} so a run can resume mid-sequence.

Format: magic ``NTIO``, version byte, then per tensor: name, dtype str,
shape, zlib-compressed little-endian blob. A C-level codec with the same
format lives in ``native/`` (used when built; this module is the portable
fallback and the format oracle).
"""

from __future__ import annotations

import io
import json
import struct
import zlib
from pathlib import Path

import numpy as np

_MAGIC = b"NTIO"
_VERSION = 1


# compression modes: 0 = raw, 1 = zlib, 2 = NTCZ (native parallel codec)
_NATIVE_THRESHOLD = 1 << 20  # below this, plain zlib is cheap enough


def _write_blob(f, name: str, array: np.ndarray, compress: bool):
    arr = np.ascontiguousarray(array)
    raw = arr.tobytes()
    mode = 0
    payload = raw
    if compress:
        if len(raw) >= _NATIVE_THRESHOLD:
            from dynamicfuion_python_tpu import native

            packed = native.compress(raw)
            if packed is not None:
                mode, payload = 2, packed
        if mode == 0:
            mode, payload = 1, zlib.compress(raw, 6)
    name_b = name.encode()
    dtype_b = arr.dtype.str.encode()
    f.write(struct.pack("<H", len(name_b)))
    f.write(name_b)
    f.write(struct.pack("<H", len(dtype_b)))
    f.write(dtype_b)
    f.write(struct.pack("<B", arr.ndim))
    f.write(struct.pack(f"<{arr.ndim}q", *arr.shape))
    f.write(struct.pack("<B", mode))
    f.write(struct.pack("<q", len(payload)))
    f.write(payload)


def _read_blob(f):
    (name_len,) = struct.unpack("<H", f.read(2))
    name = f.read(name_len).decode()
    (dtype_len,) = struct.unpack("<H", f.read(2))
    dtype = np.dtype(f.read(dtype_len).decode())
    (ndim,) = struct.unpack("<B", f.read(1))
    shape = struct.unpack(f"<{ndim}q", f.read(8 * ndim)) if ndim else ()
    (mode,) = struct.unpack("<B", f.read(1))
    (size,) = struct.unpack("<q", f.read(8))
    payload = f.read(size)
    if mode == 0:
        raw = payload
    elif mode == 1:
        raw = zlib.decompress(payload)
    elif mode == 2:
        from dynamicfuion_python_tpu import native

        raw = native.decompress(payload)
        if raw is None:
            raise RuntimeError(
                "blob uses the native NTCZ codec but libntio is unavailable "
                "(build it with dynamicfuion_python_tpu.native.build_library())"
            )
    else:
        raise ValueError(f"unknown compression mode {mode}")
    return name, np.frombuffer(raw, dtype).reshape(shape).copy()


def write_tensors(
    path: str | Path, tensors: dict[str, np.ndarray], compress: bool = True
) -> None:
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<BH", _VERSION, len(tensors)))
        for name, arr in tensors.items():
            _write_blob(f, name, np.asarray(arr), compress)


def read_tensors(path: str | Path) -> dict[str, np.ndarray]:
    with open(path, "rb") as f:
        if f.read(4) != _MAGIC:
            raise ValueError(f"{path} is not an NTIO tensor file")
        version, count = struct.unpack("<BH", f.read(3))
        if version != _VERSION:
            raise ValueError(f"unsupported NTIO version {version}")
        return dict(_read_blob(f) for _ in range(count))


def write_tensor(path, array, compress: bool = True):
    """Single-tensor convenience (``nnrt.io.write_tensor``)."""
    write_tensors(path, {"tensor": array}, compress)


def read_tensor(path) -> np.ndarray:
    return read_tensors(path)["tensor"]


# -- voxel grid / warp field / pipeline state --------------------------------


def write_voxel_block_grid(path, grid, compress: bool = True):
    meta = {
        "voxel_size": grid.voxel_size,
        "block_resolution": grid.block_resolution,
        "sdf_truncation_distance": grid.sdf_truncation_distance,
        "depth_scale": grid.depth_scale,
        "depth_max": grid.depth_max,
    }
    tensors = {
        "__meta__": np.frombuffer(json.dumps(meta).encode(), np.uint8),
        "slot_keys": np.asarray(grid.slot_keys),
        "tsdf": np.asarray(grid.tsdf),
        "weight": np.asarray(grid.weight),
        "color": np.asarray(grid.color),
    }
    write_tensors(path, tensors, compress)


def read_voxel_block_grid(path):
    import jax.numpy as jnp

    from dynamicfuion_python_tpu.models.voxel_block_grid import VoxelBlockGrid
    from dynamicfuion_python_tpu.ops.voxel_block_hash import build_sorted_index

    data = read_tensors(path)
    meta = json.loads(bytes(data["__meta__"]).decode())
    slot_keys = jnp.asarray(data["slot_keys"])
    sorted_keys, slot_of_sorted = build_sorted_index(slot_keys)
    return VoxelBlockGrid(
        slot_keys=slot_keys,
        sorted_keys=sorted_keys,
        slot_of_sorted=slot_of_sorted,
        tsdf=jnp.asarray(data["tsdf"]),
        weight=jnp.asarray(data["weight"]),
        color=jnp.asarray(data["color"]),
        **meta,
    )


def write_warp_field(path, field, compress: bool = True):
    from dynamicfuion_python_tpu.models.warp_field import HierarchicalGraphWarpField

    meta = {
        "node_coverage": field.node_coverage,
        "anchor_count": field.anchor_count,
        "minimum_valid_anchor_count": field.minimum_valid_anchor_count,
        "threshold_nodes_by_distance": field.threshold_nodes_by_distance,
        "coverage_method": field.coverage_method.name,
        "hierarchical": isinstance(field, HierarchicalGraphWarpField),
    }
    tensors = {
        "__meta__": np.frombuffer(json.dumps(meta).encode(), np.uint8),
        "node_positions": np.asarray(field.node_positions),
        "node_rotations": np.asarray(field.node_rotations),
        "node_translations": np.asarray(field.node_translations),
        "node_coverage_weights_squared": np.asarray(
            field.node_coverage_weights_squared
        ),
    }
    if meta["hierarchical"]:
        meta["layer_node_counts"] = list(field.layer_node_counts)
        meta["layer_decimation_radii"] = list(field.layer_decimation_radii)
        tensors["__meta__"] = np.frombuffer(json.dumps(meta).encode(), np.uint8)
        tensors["virtual_node_indices"] = np.asarray(field.virtual_node_indices)
        tensors["edges"] = np.asarray(field.edges)
        tensors["edge_layer_indices"] = np.asarray(field.edge_layer_indices)
    write_tensors(path, tensors, compress)


def read_warp_field(path):
    import jax.numpy as jnp

    from dynamicfuion_python_tpu.models.warp_field import (
        HierarchicalGraphWarpField,
        NodeCoverageMethod,
        WarpField,
    )

    data = read_tensors(path)
    meta = json.loads(bytes(data["__meta__"]).decode())
    common = dict(
        node_positions=jnp.asarray(data["node_positions"]),
        node_rotations=jnp.asarray(data["node_rotations"]),
        node_translations=jnp.asarray(data["node_translations"]),
        node_coverage_weights_squared=jnp.asarray(
            data["node_coverage_weights_squared"]
        ),
        node_coverage=meta["node_coverage"],
        anchor_count=meta["anchor_count"],
        minimum_valid_anchor_count=meta["minimum_valid_anchor_count"],
        threshold_nodes_by_distance=meta["threshold_nodes_by_distance"],
        coverage_method=NodeCoverageMethod[meta["coverage_method"]],
    )
    if meta["hierarchical"]:
        return HierarchicalGraphWarpField(
            **common,
            virtual_node_indices=jnp.asarray(data["virtual_node_indices"]),
            edges=jnp.asarray(data["edges"]),
            edge_layer_indices=jnp.asarray(data["edge_layer_indices"]),
            layer_node_counts=tuple(meta["layer_node_counts"]),
            layer_decimation_radii=tuple(meta["layer_decimation_radii"]),
        )
    return WarpField(**common)


def save_fusion_checkpoint(
    directory, volume, warp_field, frame_index: int, mesh_state: dict | None = None
):
    """Mid-sequence resume point (greenfield vs the reference, which can only
    re-slice via start_at_frame). ``mesh_state`` carries the pipeline's
    canonical-mesh capacity buckets + (one-frame-lagged) extraction counts so
    a resumed run reproduces the uninterrupted run bit-for-bit — the counts
    cross the tunnel asynchronously, so cap growth lags one frame and that
    lag is part of the deterministic state."""
    d = Path(directory)
    d.mkdir(parents=True, exist_ok=True)
    write_voxel_block_grid(d / "volume.ntio", volume)
    write_warp_field(d / "warp_field.ntio", warp_field)
    state = {"frame_index": frame_index}
    if mesh_state is not None:
        state["mesh_state"] = mesh_state
    (d / "state.json").write_text(json.dumps(state))


def load_fusion_checkpoint(directory):
    d = Path(directory)
    volume = read_voxel_block_grid(d / "volume.ntio")
    field = read_warp_field(d / "warp_field.ntio")
    state = json.loads((d / "state.json").read_text())
    return volume, field, state["frame_index"], state.get("mesh_state")
