"""Neural tracking stack tests: correlation, PWC-Net shapes, MaskNet,
differentiable GN, DeformNet forward, losses.

Oracle style mirrors the reference's alignment tests
(``tests/test_alignment_holistic.py`` uses golden outputs; here we assert
analytic properties + solver recovery on synthetic correspondences)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamicfuion_python_tpu.models.gn_point_cloud_optimizer import (
    GnConfig,
    optimize_point_cloud_alignment,
)
from dynamicfuion_python_tpu.ops.correlation import correlation
from dynamicfuion_python_tpu.ops.image_warp import backward_warp, bilinear_sample

INTR = jnp.asarray(
    [[100.0, 0.0, 32.0], [0.0, 100.0, 32.0], [0.0, 0.0, 1.0]], jnp.float32
)


class TestCorrelation:
    def test_zero_displacement_is_self_similarity(self, rng):
        x = jnp.asarray(rng.normal(size=(1, 8, 8, 16)).astype(np.float32))
        out = correlation(x, x)
        assert out.shape == (1, 8, 8, 81)
        center = np.asarray(out[..., 40])  # dy=0, dx=0 channel
        expected = np.asarray(jnp.mean(x * x, axis=-1))[0]
        np.testing.assert_allclose(center[0], expected, atol=1e-5)

    def test_shift_detection(self, rng):
        # second = first shifted right by 2 -> best correlation at dx=-2...
        # corr[(dy+4)*9+(dx+4)] compares first[y,x] with second[y+dy,x+dx];
        # second[y, x+dx] = first[y, x+dx-2] matches when dx=+2.
        first = jnp.asarray(rng.normal(size=(1, 16, 16, 8)).astype(np.float32))
        second = jnp.roll(first, shift=2, axis=2)
        out = np.asarray(correlation(first, second))[0, 4:-4, 4:-4]
        best = out.mean(axis=(0, 1)).argmax()
        dy, dx = divmod(best, 9)
        assert (dy - 4, dx - 4) == (0, 2)


class TestImageWarp:
    def test_backward_warp_identity(self, rng):
        img = jnp.asarray(rng.normal(size=(8, 8, 3)).astype(np.float32))
        out = backward_warp(img, jnp.zeros((8, 8, 2)))
        np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)

    def test_backward_warp_shift(self, rng):
        img = jnp.asarray(rng.normal(size=(8, 8, 1)).astype(np.float32))
        flow = jnp.ones((8, 8, 2)).at[..., 1].set(0.0)  # u+1
        out = backward_warp(img, flow)
        np.testing.assert_allclose(
            np.asarray(out)[:, :-1], np.asarray(img)[:, 1:], atol=1e-6
        )

    def test_bilinear_interpolation(self):
        img = jnp.asarray([[0.0, 1.0], [2.0, 3.0]])[..., None]
        val = bilinear_sample(img, jnp.asarray([0.5]), jnp.asarray([0.5]))
        np.testing.assert_allclose(np.asarray(val), [[1.5]], atol=1e-6)


def _synthetic_alignment_problem(rng, n_nodes=9, n_matches=200, gt_shift=(0.02, -0.01, 0.03)):
    """Source points on a plane; target = source + rigid shift; perfect
    correspondences. GN must recover the shift in node translations."""
    nodes = np.stack(
        np.meshgrid(np.linspace(-0.2, 0.2, 3), np.linspace(-0.2, 0.2, 3), indexing="ij"),
        -1,
    ).reshape(-1, 2)
    nodes = np.concatenate([nodes, np.ones((n_nodes, 1))], -1).astype(np.float32)
    pts = rng.uniform(-0.2, 0.2, size=(n_matches, 2)).astype(np.float32)
    pts = np.concatenate([pts, np.ones((n_matches, 1))], -1).astype(np.float32)
    shift = np.asarray(gt_shift, np.float32)
    moved = pts + shift
    # anchors: 4 nearest nodes, gaussian weights
    d2 = ((pts[:, None] - nodes[None]) ** 2).sum(-1)
    anchors = np.argsort(d2, axis=1)[:, :4].astype(np.int32)
    w = np.exp(-np.take_along_axis(d2, anchors, 1) / (2 * 0.2**2))
    w /= w.sum(1, keepdims=True)
    # flow targets: projection of moved points
    u = moved[:, 0] / moved[:, 2] * 100 + 32
    v = moved[:, 1] / moved[:, 2] * 100 + 32
    # simple chain edges
    edges = np.full((n_nodes, 2), -1, np.int32)
    edges[:-1, 0] = np.arange(1, n_nodes)
    edges[1:, 1] = np.arange(n_nodes - 1)
    edge_w = np.where(edges >= 0, 0.5, 0.0).astype(np.float32)
    return nodes, edges, edge_w, pts, anchors, w.astype(np.float32), u, v, moved


class TestGnOptimizer:
    def test_recovers_rigid_translation(self, rng):
        nodes, edges, edge_w, pts, anchors, w, u, v, moved = (
            _synthetic_alignment_problem(rng)
        )
        result = optimize_point_cloud_alignment(
            jnp.asarray(nodes),
            jnp.asarray(edges),
            jnp.asarray(edge_w),
            jnp.asarray(pts),
            jnp.asarray(anchors),
            jnp.asarray(w),
            jnp.ones(len(pts)),
            jnp.asarray(np.stack([u, v], -1)),
            jnp.asarray(moved[:, 2]),
            INTR,
            num_nodes=9,
            config=GnConfig(num_iterations=3, lm_factor=0.01),
        )
        np.testing.assert_allclose(
            np.asarray(result.translations), [[0.02, -0.01, 0.03]] * 9, atol=2e-3
        )
        assert float(result.losses[-1]) < float(result.losses[0])
        assert bool(result.valid_solve)

    def test_zero_weight_matches_are_inert(self, rng):
        nodes, edges, edge_w, pts, anchors, w, u, v, moved = (
            _synthetic_alignment_problem(rng)
        )
        # corrupt half the matches but zero their weights
        u2 = u.copy()
        u2[:100] += 500.0
        cw = np.ones(len(pts), np.float32)
        cw[:100] = 0.0
        result = optimize_point_cloud_alignment(
            jnp.asarray(nodes),
            jnp.asarray(edges),
            jnp.asarray(edge_w),
            jnp.asarray(pts),
            jnp.asarray(anchors),
            jnp.asarray(w),
            jnp.asarray(cw),
            jnp.asarray(np.stack([u2, v], -1)),
            jnp.asarray(moved[:, 2]),
            INTR,
            num_nodes=9,
            config=GnConfig(num_iterations=3, lm_factor=0.01),
        )
        np.testing.assert_allclose(
            np.asarray(result.translations), [[0.02, -0.01, 0.03]] * 9, atol=3e-3
        )

    def test_differentiable_through_solve(self, rng):
        nodes, edges, edge_w, pts, anchors, w, u, v, moved = (
            _synthetic_alignment_problem(rng)
        )

        def loss_fn(uv):
            result = optimize_point_cloud_alignment(
                jnp.asarray(nodes),
                jnp.asarray(edges),
                jnp.asarray(edge_w),
                jnp.asarray(pts),
                jnp.asarray(anchors),
                jnp.asarray(w),
                jnp.ones(len(pts)),
                uv,
                jnp.asarray(moved[:, 2]),
                INTR,
                num_nodes=9,
                config=GnConfig(num_iterations=2, lm_factor=0.01),
            )
            return jnp.sum(result.translations**2)

        grad = jax.grad(loss_fn)(jnp.asarray(np.stack([u, v], -1)))
        g = np.asarray(grad)
        assert np.isfinite(g).all()
        assert np.abs(g).max() > 0

    def test_non_finite_input_marks_solve_invalid(self, rng):
        """Reference guard parity (point_cloud_alignment_optimizer.py:260-267
        + deform_net.py:515): a degenerate system must produce valid_solve=0
        and leave the transforms at their initial (identity) state instead of
        poisoning downstream consumers with NaNs."""
        nodes, edges, edge_w, pts, anchors, w, u, v, moved = (
            _synthetic_alignment_problem(rng)
        )
        u_bad = np.full_like(u, np.nan)
        result = optimize_point_cloud_alignment(
            jnp.asarray(nodes),
            jnp.asarray(edges),
            jnp.asarray(edge_w),
            jnp.asarray(pts),
            jnp.asarray(anchors),
            jnp.asarray(w),
            jnp.ones(len(pts)),
            jnp.asarray(np.stack([u_bad, v], -1)),
            jnp.asarray(moved[:, 2]),
            INTR,
            num_nodes=9,
            config=GnConfig(num_iterations=3, lm_factor=0.01),
        )
        assert not bool(result.valid_solve)
        np.testing.assert_allclose(
            np.asarray(result.rotations), np.broadcast_to(np.eye(3), (9, 3, 3))
        )
        np.testing.assert_allclose(np.asarray(result.translations), 0.0)

    def test_condition_number_guard(self, rng):
        """check_condition_num + break_on_condition_num invalidate a solve on
        an ill-conditioned system (no correspondences at all -> H = lm*I plus
        nothing; condition number fine — so instead use a huge cutoff test:
        a healthy problem passes with the check enabled)."""
        nodes, edges, edge_w, pts, anchors, w, u, v, moved = (
            _synthetic_alignment_problem(rng)
        )
        ok = optimize_point_cloud_alignment(
            jnp.asarray(nodes),
            jnp.asarray(edges),
            jnp.asarray(edge_w),
            jnp.asarray(pts),
            jnp.asarray(anchors),
            jnp.asarray(w),
            jnp.ones(len(pts)),
            jnp.asarray(np.stack([u, v], -1)),
            jnp.asarray(moved[:, 2]),
            INTR,
            num_nodes=9,
            config=GnConfig(
                num_iterations=2, lm_factor=0.01, check_condition_num=True,
                max_condition_num=1e12,
            ),
        )
        assert bool(ok.valid_solve)
        assert np.isfinite(np.asarray(ok.condition_numbers)).all()
        # an absurdly strict cutoff must trip the guard
        strict = optimize_point_cloud_alignment(
            jnp.asarray(nodes),
            jnp.asarray(edges),
            jnp.asarray(edge_w),
            jnp.asarray(pts),
            jnp.asarray(anchors),
            jnp.asarray(w),
            jnp.ones(len(pts)),
            jnp.asarray(np.stack([u, v], -1)),
            jnp.asarray(moved[:, 2]),
            INTR,
            num_nodes=9,
            config=GnConfig(
                num_iterations=2, lm_factor=0.01, check_condition_num=True,
                max_condition_num=1.5,
            ),
        )
        assert not bool(strict.valid_solve)


class TestNetworks:
    def test_pwcnet_shapes(self, rng):
        from dynamicfuion_python_tpu.models.pwcnet import PWCNet

        net = PWCNet()
        x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
        params = net.init(jax.random.PRNGKey(0), x, x)
        flow2, flow3, flow4, flow5, flow6, feat2 = net.apply(params, x, x)
        assert flow2.shape == (1, 16, 16, 2)
        assert flow3.shape == (1, 8, 8, 2)
        assert flow6.shape == (1, 1, 1, 2)
        assert feat2.shape[-1] == 565
        assert np.isfinite(np.asarray(flow2)).all()

    def test_deform_net_forward(self, rng):
        from dynamicfuion_python_tpu.models.deform_net import DeformNet
        from dynamicfuion_python_tpu.models.gn_point_cloud_optimizer import GnConfig

        h = w = 64
        n = 9
        net = DeformNet(
            use_mask=True,
            num_nodes=n,
            gn_config=GnConfig(num_iterations=1, lm_factor=0.1),
        )
        source = np.zeros((1, h, w, 6), np.float32)
        source[..., :3] = rng.uniform(size=(1, h, w, 3))
        v, u = np.mgrid[0:h, 0:w].astype(np.float32)
        z = 1.0
        source[..., 3] = (u - 32) / 100 * z
        source[..., 4] = (v - 32) / 100 * z
        source[..., 5] = z
        target = source.copy()
        target[..., 5] += 0.02
        nodes = np.zeros((1, n, 3), np.float32)
        nodes[0, :, :2] = np.stack(
            np.meshgrid(np.linspace(-0.2, 0.2, 3), np.linspace(-0.2, 0.2, 3)),
            -1,
        ).reshape(-1, 2)
        nodes[0, :, 2] = 1.0
        edges = np.full((1, n, 2), -1, np.int32)
        edges[0, :-1, 0] = np.arange(1, n)
        edge_w = np.where(edges >= 0, 1.0, 0.0).astype(np.float32)
        clusters = np.zeros((1, n), np.int32)
        d2 = ((source[0, ..., 3:].reshape(-1, 3)[:, None] - nodes[0][None]) ** 2).sum(-1)
        anchors = np.argsort(d2, 1)[:, :4].astype(np.int32).reshape(1, h, w, 4)
        aw = np.exp(-np.sort(d2, 1)[:, :4] / (2 * 0.2**2))
        aw = (aw / aw.sum(1, keepdims=True)).astype(np.float32).reshape(1, h, w, 4)

        params = net.init(
            jax.random.PRNGKey(0),
            jnp.asarray(source),
            jnp.asarray(target),
            jnp.asarray(nodes),
            jnp.asarray(edges),
            jnp.asarray(edge_w),
            jnp.asarray(clusters),
            jnp.asarray(anchors),
            jnp.asarray(aw),
            INTR,
        )
        out = net.apply(
            params,
            jnp.asarray(source),
            jnp.asarray(target),
            jnp.asarray(nodes),
            jnp.asarray(edges),
            jnp.asarray(edge_w),
            jnp.asarray(clusters),
            jnp.asarray(anchors),
            jnp.asarray(aw),
            INTR,
        )
        assert out.node_translations.shape == (1, n, 3)
        assert out.mask_prediction.shape == (1, h, w, 1)
        assert np.isfinite(np.asarray(out.node_translations)).all()
        assert np.isfinite(np.asarray(out.deformed_points)).all()


class TestLosses:
    def test_flow_loss_zero_on_perfect(self, rng):
        from dynamicfuion_python_tpu.models.losses import (
            LossWeights,
            downscale_gt_flow,
            flow_loss,
        )

        gt = jnp.asarray(rng.normal(size=(1, 64, 64, 2)).astype(np.float32))
        mask = jnp.ones((1, 64, 64), bool)
        f2, _ = downscale_gt_flow(gt, mask, 16, 16)
        f3, _ = downscale_gt_flow(gt, mask, 8, 8)
        f4, _ = downscale_gt_flow(gt, mask, 8, 8)
        flows = (f2 / 20.0, f3 / 20.0, f4 / 20.0, None, None)
        loss = flow_loss(flows, gt, mask, LossWeights())
        assert float(loss) < 0.05  # RobustL1 eps floor

    def test_graph_and_epe_metrics(self, rng):
        from dynamicfuion_python_tpu.models.losses import epe_3d, graph_loss

        pred = jnp.zeros((2, 5, 3))
        gt = jnp.ones((2, 5, 3)) * 0.1
        validity = jnp.ones((2, 5))
        gl = graph_loss(pred, gt, validity)
        np.testing.assert_allclose(float(gl), 0.03, atol=1e-6)
        epe = epe_3d(pred, gt, validity > 0)
        np.testing.assert_allclose(float(epe), np.sqrt(0.03), atol=1e-5)


class TestTorchWeightConversion:
    """Reference torch checkpoint -> Flax params (models/torch_weight_conversion),
    mirroring the reference's ``load_default_nnrt_network`` partial/full loading
    (``alignment/default.py:11-42``)."""

    def test_conv_layer_parity_vs_torch(self, rng):
        torch = pytest.importorskip("torch")
        import flax.linen as nn

        from dynamicfuion_python_tpu.models.torch_weight_conversion import (
            convert_conv_transpose_weight,
            convert_conv_weight,
        )

        x = rng.normal(size=(1, 3, 8, 8)).astype(np.float32)
        xj = jnp.asarray(x.transpose(0, 2, 3, 1))

        torch.manual_seed(3)
        conv = torch.nn.Conv2d(3, 5, 3, padding=1)
        with torch.no_grad():
            want = conv(torch.from_numpy(x)).numpy()
        got = nn.Conv(5, (3, 3)).apply(
            {"params": {
                "kernel": jnp.asarray(convert_conv_weight(conv.weight.detach().numpy())),
                "bias": jnp.asarray(conv.bias.detach().numpy()),
            }},
            xj,
        )
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), want, atol=1e-5
        )

        deconv = torch.nn.ConvTranspose2d(3, 5, 4, stride=2, padding=1)
        with torch.no_grad():
            want = deconv(torch.from_numpy(x)).numpy()
        got = nn.ConvTranspose(5, (4, 4), strides=(2, 2)).apply(
            {"params": {
                "kernel": jnp.asarray(
                    convert_conv_transpose_weight(deconv.weight.detach().numpy())
                ),
                "bias": jnp.asarray(deconv.bias.detach().numpy()),
            }},
            xj,
        )
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), want, atol=1e-5
        )

    def test_extractor_forward_parity_vs_torch(self, rng):
        """Full 6-level feature-pyramid forward agreement torch vs flax."""
        torch = pytest.importorskip("torch")

        from dynamicfuion_python_tpu.models.pwcnet import Extractor
        from dynamicfuion_python_tpu.models.torch_weight_conversion import (
            convert_extractor,
        )

        torch.manual_seed(11)
        feats, words = (16, 32, 64, 96, 128, 196), ("One", "Two", "Thr", "Fou", "Fiv", "Six")
        state = {}
        layers = []
        c_in = 3
        for f, word in zip(feats, words):
            convs = [
                torch.nn.Conv2d(c_in, f, 3, stride=2, padding=1),
                torch.nn.Conv2d(f, f, 3, padding=1),
                torch.nn.Conv2d(f, f, 3, padding=1),
            ]
            for seq_idx, conv in zip((0, 2, 4), convs):
                state[f"flow_net.moduleExtractor.module{word}.{seq_idx}.weight"] = (
                    conv.weight.detach().numpy()
                )
                state[f"flow_net.moduleExtractor.module{word}.{seq_idx}.bias"] = (
                    conv.bias.detach().numpy()
                )
            layers.append(convs)
            c_in = f

        x = rng.normal(size=(1, 3, 64, 64)).astype(np.float32)
        act = torch.nn.LeakyReLU(negative_slope=0.1)
        with torch.no_grad():
            t = torch.from_numpy(x)
            torch_pyramid = []
            for convs in layers:
                for conv in convs:
                    t = act(conv(t))
                torch_pyramid.append(t.numpy())

        params = convert_extractor(state)
        flax_pyramid = Extractor().apply(
            {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1))
        )
        for want, got in zip(torch_pyramid, flax_pyramid):
            np.testing.assert_allclose(
                np.asarray(got).transpose(0, 3, 1, 2), want, atol=2e-4
            )

    def test_full_checkpoint_structure_roundtrip(self, tmp_path, rng):
        """Synthesize a torch-keyed checkpoint with the reference's exact key
        names/shapes (inverse of our name map), convert, and require exact
        agreement with a freshly initialized DeformNet param tree."""
        from dynamicfuion_python_tpu.models.deform_net import DeformNet
        from dynamicfuion_python_tpu.models.gn_point_cloud_optimizer import GnConfig
        from dynamicfuion_python_tpu.models.torch_weight_conversion import (
            _NUM_WORDS,
            convert_deform_net_checkpoint,
        )

        h = w = 64
        n = 4
        net = DeformNet(use_mask=True, num_nodes=n, gn_config=GnConfig(num_iterations=1))
        zeros = np.zeros
        template = net.init(
            jax.random.PRNGKey(0),
            jnp.asarray(zeros((1, h, w, 6), np.float32)),
            jnp.asarray(zeros((1, h, w, 6), np.float32)),
            jnp.asarray(zeros((1, n, 3), np.float32)),
            jnp.asarray(np.full((1, n, 2), -1, np.int32)),
            jnp.asarray(zeros((1, n, 2), np.float32)),
            jnp.asarray(zeros((1, n), np.int32)),
            jnp.asarray(np.full((1, h, w, 4), -1, np.int32)),
            jnp.asarray(zeros((1, h, w, 4), np.float32)),
            INTR,
        )["params"]

        # inverse name map: flax path -> torch key
        def torch_keys(flax_path):
            top, rest = flax_path[0], flax_path[1:]
            if top == "flow_net":
                sub = rest[0]
                if sub == "Extractor_0":
                    idx = int(rest[1].split("_")[1])
                    word, seq = _NUM_WORDS[idx // 3 + 1], (0, 2, 4)[idx % 3]
                    return f"flow_net.moduleExtractor.module{word}.{seq}"
                if sub.startswith("decoder"):
                    lvl = _NUM_WORDS[int(sub[-1])]
                    kind, idx = rest[1].split("_")
                    if kind == "ConvTranspose":
                        return f"flow_net.module{lvl}.moduleUp" + (
                            "flow" if idx == "0" else "feat"
                        )
                    return f"flow_net.module{lvl}.module{_NUM_WORDS[int(idx) + 1]}.0"
                if sub == "refiner":
                    idx = int(rest[1].split("_")[1])
                    return f"flow_net.moduleRefiner.moduleMain.{2 * idx}"
            if top == "mask_net":
                sub = rest[0]
                if sub.startswith("ConvTranspose"):
                    return f"mask_net.upconv{int(sub.split('_')[1]) + 1}"
                if sub.startswith("ResBlock"):
                    block = int(sub.split("_")[1]) + 1
                    which = int(rest[1].split("_")[1])
                    return f"mask_net.model.{block}.block{which}.0"
                if sub == "Conv_0":
                    return "mask_net.model.0.0.0"
                if sub == "Conv_1":
                    return "mask_net.model.4"
            raise AssertionError(f"unmapped flax path {flax_path}")

        state = {}

        def fill(tree, path):
            if "kernel" in tree:
                key = torch_keys(path)
                kern = np.asarray(tree["kernel"])  # [kh, kw, in, out]
                if "ConvTranspose" in path[-1] or "upconv" in key:
                    w_t = rng.normal(size=(kern.shape[2], kern.shape[3], kern.shape[0], kern.shape[1]))
                else:
                    w_t = rng.normal(size=(kern.shape[3], kern.shape[2], kern.shape[0], kern.shape[1]))
                state[f"{key}.weight"] = w_t.astype(np.float32)
                state[f"{key}.bias"] = rng.normal(size=np.asarray(tree["bias"]).shape).astype(np.float32)
            else:
                for k, v in tree.items():
                    fill(v, path + (k,))

        for k, v in template.items():
            fill(v, (k,))

        ckpt = tmp_path / "model.npz"
        np.savez(ckpt, **state)
        params = convert_deform_net_checkpoint(ckpt, params_template=template)
        # every leaf present with matching shape, and values actually came
        # from the checkpoint (spot-check one mapped tensor)
        got = params["flow_net"]["refiner"]["Conv_3"]["kernel"]
        want = state["flow_net.moduleRefiner.moduleMain.6.weight"].transpose(2, 3, 1, 0)
        np.testing.assert_array_equal(np.asarray(got), want)

        # only_flow_net: mask params must come from the template
        flow_only = {k: v for k, v in state.items() if k.startswith("flow_net.")}
        ckpt2 = tmp_path / "flow.npz"
        np.savez(ckpt2, **flow_only)
        params2 = convert_deform_net_checkpoint(
            ckpt2, params_template=template, only_flow_net=True
        )
        np.testing.assert_array_equal(
            np.asarray(params2["mask_net"]["Conv_0"]["kernel"]),
            np.asarray(template["mask_net"]["Conv_0"]["kernel"]),
        )


class TestSod:
    """U²-Net-lite SOD (models/u2net.py + apps/sod.py), the reference
    ``run_sod.py`` mask-generation capability."""

    def test_u2net_shapes(self, rng):
        from dynamicfuion_python_tpu.models.u2net import U2NetLite

        model = U2NetLite(mid=4, out=8)
        x = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), x)
        outs = model.apply(params, x)
        assert len(outs) == 7
        for o in outs:
            assert o.shape == (1, 64, 64, 1)
            v = np.asarray(o)
            assert np.isfinite(v).all() and (v >= 0).all() and (v <= 1).all()

    def test_u2netp_checkpoint_conversion_parity(self, rng):
        """Pretrained-checkpoint compatibility (VERDICT gap #9 / reference
        ``run_sod.py``): build the ORIGINAL torch U2NETP (vendored in the
        reference as 3rd-party/U-2-Net — used here purely as a parity
        oracle), convert its randomly-initialized state_dict with
        ``convert_u2net_checkpoint``, and require matching saliency output
        from the flax model in inference (running-average BatchNorm) mode."""
        torch = pytest.importorskip("torch")
        import sys as _sys

        u2net_dir = "/root/reference/3rd-party/U-2-Net"
        if u2net_dir not in _sys.path:
            _sys.path.insert(0, u2net_dir)
        try:
            from model.u2net import U2NETP  # noqa: E501  original torch model
        except Exception as exc:  # pragma: no cover - reference not mounted
            pytest.skip(f"original U-2-Net not importable: {exc}")

        from dynamicfuion_python_tpu.models.u2net import (
            U2NetLite,
            convert_u2net_checkpoint,
        )

        torch.manual_seed(7)
        torch_model = U2NETP(3, 1).eval()
        # randomize running stats so BatchNorm conversion is actually tested
        with torch.no_grad():
            for m in torch_model.modules():
                if isinstance(m, torch.nn.BatchNorm2d):
                    m.running_mean.normal_(0.0, 0.05)
                    m.running_var.uniform_(0.5, 1.5)

        x = rng.uniform(size=(1, 3, 64, 64)).astype(np.float32)
        with torch.no_grad():
            want = torch_model(torch.from_numpy(x))[0].numpy()[0, 0]

        variables = convert_u2net_checkpoint(torch_model.state_dict())
        model = U2NetLite()
        got = np.asarray(
            model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))[0]
        )[0, ..., 0]
        np.testing.assert_allclose(got, want, atol=2e-4)

    def test_sod_app_end_to_end(self, tmp_path, rng):
        from PIL import Image

        from dynamicfuion_python_tpu.apps.sod import generate_masks

        in_dir = tmp_path / "color"
        in_dir.mkdir()
        for i in range(2):
            Image.fromarray(
                (rng.uniform(size=(48, 40, 3)) * 255).astype(np.uint8)
            ).save(in_dir / f"{i:06d}.png")
        written = generate_masks(
            in_dir, tmp_path / "sod", checkpoint=None, resize_to=(64, 64)
        )
        assert len(written) == 2
        mask = np.asarray(Image.open(written[0]))
        assert mask.shape == (48, 40) and mask.dtype == np.uint8


class TestPatchwiseMaskThreshold:
    """Reference ``patchwise_threshold_mask_predictions``
    (``alignment/deform_net.py:707-717``): per-patch winner-take-all."""

    def test_keeps_exactly_per_patch_maxima(self):
        import torch
        import torch.nn.functional as F

        from dynamicfuion_python_tpu.models.deform_net import (
            patchwise_threshold,
        )

        rng = np.random.default_rng(11)
        m = rng.random((2, 64, 96)).astype(np.float32)
        ours = np.asarray(patchwise_threshold(jnp.asarray(m), 16))
        # torch oracle = the reference's literal recipe
        t = torch.from_numpy(m)
        pooled = F.max_pool2d(t, kernel_size=16, stride=16)
        pooled = F.interpolate(
            pooled.unsqueeze(1), size=(64, 96), mode="nearest"
        ).squeeze(1)
        selected = (torch.abs(t - pooled) <= 1e-8).float()
        want = (t * selected).numpy()
        np.testing.assert_allclose(ours, want, rtol=0, atol=0)
        # exactly one survivor per 16x16 patch (random ties are measure-zero)
        per_patch = ours.reshape(2, 4, 16, 6, 16)
        counts = (per_patch > 0).sum(axis=(2, 4))
        assert (counts == 1).all()
