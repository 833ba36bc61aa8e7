"""Multi-device SPMD tests on the virtual 8-device CPU mesh: the sharded
Gauss-Newton step must match the single-device result bit-for-bit-ish, and
the driver entry points must compile and run."""

import jax
import numpy as np
import pytest


class TestDistributedFit:
    def test_sharded_step_matches_single_device(self):
        from __graft_entry__ import _tiny_problem
        from dynamicfuion_python_tpu.models.fitter import (
            FitterConfig,
            IterationMode,
            _gauss_newton_step,
            precompute_face_associations,
        )
        from dynamicfuion_python_tpu.ops.normals import mesh_vertex_normals
        from dynamicfuion_python_tpu.parallel.spmd import (
            distributed_fit_step,
            fusion_mesh,
        )

        field, verts, tris, ref_pts, ref_mask, intr = _tiny_problem(
            image_size=(64, 32)
        )
        config = FitterConfig(max_iterations=1, use_regularization=True)

        pre = precompute_face_associations(field, verts, tris)
        normals = mesh_vertex_normals(verts, tris)
        max_deg = max(1, min(4, field.layer_node_counts[1]))
        single, d_single, a_single, _, _, _ = _gauss_newton_step(
            field, verts, tris, normals, pre, ref_pts, ref_mask, intr,
            config, IterationMode.ALL, max_deg,
        )

        mesh = fusion_mesh(8)
        sharded, d_sharded, a_sharded, _ = distributed_fit_step(
            field, verts, tris, ref_pts, ref_mask, intr, config,
            IterationMode.ALL, mesh,
        )
        np.testing.assert_allclose(
            np.asarray(sharded.node_translations),
            np.asarray(single.node_translations),
            atol=1e-5,
        )
        np.testing.assert_allclose(
            float(d_sharded), float(d_single), rtol=1e-4
        )

    def test_dryrun_multichip(self, capsys):
        from __graft_entry__ import dryrun_multichip

        dryrun_multichip(8)
        out = capsys.readouterr().out
        assert "dryrun_multichip(8)" in out
        assert "integrated voxels=" in out
        assert "parity max|dt| vs single-device oracle=" in out

    def test_face_data_term_sharded_bit_parity(self):
        """Regression for the round-4 multi-chip corruption: the face-major
        data term packs int ids into float table rows; GSPMD's shard
        masking arithmetic flushes DENORMAL floats to zero, so unbiased
        bitcast ids (tiny ints -> denormals) came out 0 on sharded runs and
        the assembled H/g silently vanished. The packed ids are now biased
        into the normal-float range; sharded assembly must be bit-exact."""
        import jax.numpy as jnp

        from __graft_entry__ import _tiny_problem
        from dynamicfuion_python_tpu.models.fitter import (
            FitterConfig,
            _data_term_face,
            _warp_vertices,
            precompute_face_associations,
        )
        from dynamicfuion_python_tpu.ops.normals import mesh_vertex_normals
        from dynamicfuion_python_tpu.ops.rasterize import (
            extract_face_vertices,
            rasterize_splat,
        )
        from dynamicfuion_python_tpu.parallel.spmd import (
            fusion_mesh,
            shard_pixel_rows,
        )

        field, verts, tris, ref_pts, ref_mask, intr = _tiny_problem(
            image_size=(64, 32)
        )
        h, w = ref_mask.shape
        pre = precompute_face_associations(field, verts, tris)
        normals = mesh_vertex_normals(verts, tris)
        pos_v = field.virtual_positions()
        rot_v = field.virtual_rotations()
        trans_v = field.virtual_translations()

        def make_frag():
            wv = _warp_vertices(
                verts, pos_v, rot_v, trans_v, pre.anchors, pre.weights
            )
            fv, vf = extract_face_vertices(
                wv, tris, intr, (h, w), near=1e-3, far=10.0
            )
            frag = rasterize_splat(
                fv, vf, (h, w), faces_per_pixel=1,
                perspective_correct=True, cull_back_faces=False,
            )
            return frag.face_indices[..., 0]

        frag_faces = jax.jit(make_frag)()
        config = FitterConfig(pixel_compaction_fraction=0.6)

        def term(rp, rm, ff):
            return _data_term_face(
                pos_v, rot_v, trans_v, verts, normals, tris, pre, ff,
                rp, rm, intr, config, field.num_nodes,
            )

        f = jax.jit(term)
        h1, g1, l1 = f(ref_pts, ref_mask, frag_faces)
        mesh = fusion_mesh(8)
        h2, g2, l2 = f(
            shard_pixel_rows(ref_pts, mesh),
            shard_pixel_rows(ref_mask, mesh),
            shard_pixel_rows(frag_faces, mesh),
        )
        np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
        np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))

    def test_entry_compiles(self):
        from __graft_entry__ import entry

        fn, args = entry()
        out = jax.jit(fn)(*args)
        jax.block_until_ready(out)
        assert np.isfinite(float(out[1]))


class TestMultiHost:
    def test_two_process_global_step_matches_single(self, tmp_path):
        """Two OS processes (2 virtual CPU devices each) form one global
        4-device mesh; per-host row-slab ingestion + the global sharded GN
        step must reproduce the single-process oracle (the multi-host
        contract of parallel/distributed.py)."""
        import socket
        import subprocess
        import sys as _sys
        from pathlib import Path

        from __graft_entry__ import _tiny_problem
        from dynamicfuion_python_tpu.models.fitter import (
            FitterConfig,
            IterationMode,
            _gauss_newton_step,
            _max_wing_degree,
            precompute_face_associations,
        )
        from dynamicfuion_python_tpu.ops.normals import mesh_vertex_normals

        field, verts, tris, ref_pts, ref_mask, intr = _tiny_problem(
            image_size=(64, 32)
        )
        config = FitterConfig(max_iterations=1, use_regularization=True)
        pre = precompute_face_associations(field, verts, tris)
        normals = mesh_vertex_normals(verts, tris)
        single, d_single, _, _, _, _ = _gauss_newton_step(
            field, verts, tris, normals, pre, ref_pts, ref_mask, intr,
            config, IterationMode.ALL, _max_wing_degree(field),
        )

        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        coordinator = f"127.0.0.1:{port}"
        worker = Path(__file__).parent / "_distributed_worker.py"
        out_npz = tmp_path / "proc0.npz"
        procs = [
            subprocess.Popen(
                [_sys.executable, str(worker), coordinator, str(pid), str(out_npz)],
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
            )
            for pid in range(2)
        ]
        outs = [p.communicate(timeout=600)[0] for p in procs]
        for p, out in zip(procs, outs):
            assert p.returncode == 0, out.decode(errors="replace")[-4000:]

        got = np.load(out_npz)
        np.testing.assert_allclose(
            got["node_translations"],
            np.asarray(single.node_translations),
            atol=1e-5,
        )
        np.testing.assert_allclose(
            float(got["data_loss"]), float(d_single), rtol=1e-4
        )


class TestShardedFrameLoop:
    def test_multi_frame_pipeline_matches_single_device(self, tmp_path):
        """The WHOLE frame loop (odometry-off bending-plane scene: fit +
        block discovery + non-rigid integrate + mesh refresh) sharded over
        the 8-device mesh must reproduce the single-device pipeline
        (VERDICT r4 #8: the structural prerequisite for multi-chip
        throughput — previously only the fit step had a sharded path)."""
        from dynamicfuion_python_tpu.apps.fusion_pipeline import (
            FusionPipeline,
            resolve_frame_metrics,
        )
        from dynamicfuion_python_tpu.data.frame_sequence import (
            SyntheticBendingPlaneSequence,
        )
        from dynamicfuion_python_tpu.parallel.spmd import fusion_mesh
        from dynamicfuion_python_tpu.settings import Parameters
        from dynamicfuion_python_tpu.utils.config import apply_overrides

        params = apply_overrides(
            Parameters(),
            [
                "tsdf.voxel_size=0.01",
                "tsdf.sdf_truncation_distance=0.04",
                "tsdf.initial_block_count=512",
                "graph.node_coverage=0.12",
                "graph.layer_count=2",
                "graph.erosion_num_iterations=1",
                "alignment.max_iteration_count=2",
                "alignment.arap_term_weight=20.0",
                "alignment.use_rigid_alignment=false",
                "fusion.far_clip_distance=2.0",
                "fusion.extraction_max_triangles=60000",
                f"telemetry.output_directory={tmp_path}",
                "telemetry.print_runtime=false",
            ],
        )
        seq = SyntheticBendingPlaneSequence(
            frame_count=3, image_size=(64, 96), bend_per_frame=0.02,
            focal=120.0,
        )
        frames = list(seq)

        def run(mesh):
            pipe = FusionPipeline(params, seq.intrinsics)
            pipe.initialize(frames[0].depth, frames[0].color)
            if mesh is not None:
                pipe.enable_spmd(mesh)
            out = []
            for f in frames[1:]:
                out.append(
                    resolve_frame_metrics(
                        pipe.process_frame(f.depth, f.color)
                    )
                )
            return pipe, out

        single_pipe, single_metrics = run(None)
        sharded_pipe, sharded_metrics = run(fusion_mesh(8))

        np.testing.assert_allclose(
            np.asarray(sharded_pipe.warp_field.node_translations),
            np.asarray(single_pipe.warp_field.node_translations),
            atol=1e-5,
        )
        # TSDF state: same occupied voxels, same values
        np.testing.assert_allclose(
            np.asarray(sharded_pipe.volume.tsdf),
            np.asarray(single_pipe.volume.tsdf),
            atol=1e-5,
        )
        np.testing.assert_array_equal(
            np.asarray(sharded_pipe.volume.weight),
            np.asarray(single_pipe.volume.weight),
        )
        for ms, mm in zip(sharded_metrics, single_metrics):
            np.testing.assert_allclose(
                ms["data_loss"], mm["data_loss"], rtol=1e-4, atol=1e-6
            )
