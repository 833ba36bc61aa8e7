"""Pallas indexed-mesh expansion kernel vs the XLA extraction oracle.

The kernel (``ops/pallas/mesh_expand.py``) replaces the per-row-bound XLA
``vertices[triangles]`` gather in the reference's indexed-mesh rasterization
entry (``cpp/rendering/functional/ExtractFaceVertices.h``); on the CPU test
mesh it runs through the pallas interpreter, on TPU it compiles. Contract:
identical (u, v, z) face vertices and clip mask as
``extract_face_vertices``, up to the plan's static face permutation."""

import numpy as np
import jax.numpy as jnp
import pytest


def _sphere(rings=9, segments=12, radius=0.22, center=(0.0, 0.0, 2.0)):
    phi = np.linspace(0, np.pi, rings + 1)[1:-1]
    theta = np.linspace(0, 2 * np.pi, segments, endpoint=False)
    pp, tt = np.meshgrid(phi, theta, indexing="ij")
    ring_pts = np.stack(
        [np.sin(pp) * np.cos(tt), np.sin(pp) * np.sin(tt), np.cos(pp)], -1
    ).reshape(-1, 3)
    verts = np.concatenate(
        [[[0, 0, 1.0]], ring_pts, [[0, 0, -1.0]]], 0
    ) * radius + np.asarray(center)
    n_ring = rings - 1
    faces = []
    top, bottom = 0, 1 + n_ring * segments
    ring0 = 1
    for s in range(segments):
        faces.append([top, ring0 + s, ring0 + (s + 1) % segments])
    for r in range(n_ring - 1):
        a = ring0 + r * segments
        b = a + segments
        for s in range(segments):
            s1 = (s + 1) % segments
            faces.append([a + s, b + s, b + s1])
            faces.append([a + s, b + s1, a + s1])
    last = ring0 + (n_ring - 1) * segments
    for s in range(segments):
        faces.append([bottom, last + (s + 1) % segments, last + s])
    return verts.astype(np.float32), np.asarray(faces, np.int32)


INTR = jnp.asarray(
    [[120.0, 0.0, 32.0], [0.0, 120.0, 32.0], [0.0, 0.0, 1.0]], jnp.float32
)


class TestExpansionKernel:
    def test_matches_extract_face_vertices(self):
        from dynamicfuion_python_tpu.ops.pallas.mesh_expand import (
            ExpansionPlan,
            expand_project_faces,
        )
        from dynamicfuion_python_tpu.ops.rasterize import (
            extract_face_vertices,
        )

        verts_np, faces_np = _sphere()
        # push a band of vertices behind the near plane so the clip mask
        # is non-trivial
        verts_np[::7, 2] = 0.01
        verts = jnp.asarray(verts_np)
        faces = jnp.asarray(faces_np)
        plan = ExpansionPlan(faces_np, len(verts_np), chunk=128)
        fv, valid, s2o = expand_project_faces(verts, plan, INTR)
        fv_ref, valid_ref = extract_face_vertices(
            verts, faces, INTR, (64, 64)
        )
        perm = np.asarray(plan.perm)
        # 1-ulp tolerance: the interpreter's FMA ordering differs from the
        # XLA oracle's (the compiled TPU kernel measures bit-exact)
        np.testing.assert_allclose(
            np.asarray(fv), np.asarray(fv_ref)[perm], rtol=2e-6, atol=1e-6
        )
        np.testing.assert_array_equal(
            np.asarray(valid), np.asarray(valid_ref)[perm]
        )
        # the permutation maps sorted ids back to caller ids
        np.testing.assert_array_equal(np.asarray(s2o), perm)

    def test_remap_restores_original_ids(self):
        from dynamicfuion_python_tpu.ops.pallas.mesh_expand import (
            _remap_fragment_ids,
        )

        s2o = jnp.asarray(np.asarray([4, 2, 0, 1, 3], np.int32))
        frag = jnp.asarray(np.asarray([[0, -1], [4, 2]], np.int32))
        got = np.asarray(_remap_fragment_ids(frag, s2o))
        np.testing.assert_array_equal(got, [[4, -1], [3, 0]])
