"""Headless run visualizer: renders recorded telemetry meshes to images.

Capability parity (headless re-design) with the reference's interactive
viewers (``run_visualizer.py`` -> ``apps/visualizer/app.py`` Open3D playback
of per-frame canonical/warped meshes; ``run_frameviewer.py`` VTK input
viewer): instead of a GUI event loop — which has no place on a TPU pod —
each recorded frame's meshes are rendered with the framework's own
rasterizer (normal shading) from a fixed or orbiting viewpoint into PNGs,
plus an ``index.html`` contact sheet for browsing.

Run: python -m dynamicfuion_python_tpu.apps.visualizer --run <telemetry_dir> \
        [--out <dir>] [--size 480x640] [--orbit-degrees 20] [--platform cpu]
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np


def _look_at_transform(center: np.ndarray, distance: float, angle_deg: float):
    """Camera orbiting the mesh center in the XZ plane, looking at it."""
    import math

    a = math.radians(angle_deg)
    eye = center + distance * np.asarray([math.sin(a), 0.0, -math.cos(a)])
    forward = center - eye
    forward = forward / np.linalg.norm(forward)
    right = np.cross([0.0, 1.0, 0.0], forward)
    right = right / (np.linalg.norm(right) + 1e-12)
    up = np.cross(forward, right)
    rot = np.stack([right, up, forward])  # world -> camera rows
    t = -rot @ eye
    mat = np.eye(4, dtype=np.float32)
    mat[:3, :3] = rot
    mat[:3, 3] = t
    return mat


def render_run(
    run_dir: str | Path,
    out_dir: str | Path | None = None,
    image_size=(480, 640),
    orbit_degrees: float = 25.0,
    kinds=("warped", "canonical"),
):
    import jax.numpy as jnp

    from dynamicfuion_python_tpu.models.renderer import MeshRenderer
    from dynamicfuion_python_tpu.ops.camera import transform_points
    from dynamicfuion_python_tpu.utils.telemetry import read_ply

    run_dir = Path(run_dir)
    out = Path(out_dir) if out_dir else run_dir / "renders"
    out.mkdir(parents=True, exist_ok=True)
    h, w = image_size
    focal = 1.1 * min(h, w)
    intrinsics = jnp.asarray(
        [[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1]], jnp.float32
    )
    renderer = MeshRenderer((h, w), intrinsics)

    from PIL import Image

    written = []
    for kind in kinds:
        for ply in sorted(run_dir.glob(f"*_{kind}_mesh.ply")):
            verts, faces = read_ply(ply)
            if len(verts) == 0:
                continue
            center = verts.mean(axis=0)
            extent = float(np.linalg.norm(verts - center, axis=1).max())
            cam = _look_at_transform(center, 2.5 * extent + 1e-3, orbit_degrees)
            cam_verts = transform_points(jnp.asarray(verts), jnp.asarray(cam))
            color, depth = renderer.render_mesh(
                cam_verts, jnp.asarray(faces.astype(np.int32))
            )
            img = (np.clip(np.asarray(color), 0, 1) * 255).astype(np.uint8)
            png = out / (ply.stem + ".png")
            Image.fromarray(img).save(png)
            written.append(png.name)

    html = "<html><body style='background:#222'>" + "".join(
        f"<div style='display:inline-block;margin:4px;text-align:center;"
        f"color:#ccc'><img src='{name}' width='320'/><br/>{name}</div>"
        for name in written
    ) + "</body></html>"
    (out / "index.html").write_text(html)
    return written


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    kwargs = {}
    it = iter(argv)
    for arg in it:
        if arg == "--run":
            kwargs["run_dir"] = next(it)
        elif arg == "--out":
            kwargs["out_dir"] = next(it)
        elif arg == "--size":
            h, w = next(it).split("x")
            kwargs["image_size"] = (int(h), int(w))
        elif arg == "--orbit-degrees":
            kwargs["orbit_degrees"] = float(next(it))
        elif arg == "--platform":
            import jax

            jax.config.update("jax_platforms", next(it))
    written = render_run(**kwargs)
    print(f"rendered {len(written)} images")


if __name__ == "__main__":
    main()
