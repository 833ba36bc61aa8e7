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
        rot, trans, losses = optimize_point_cloud_alignment(
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
            np.asarray(trans), [[0.02, -0.01, 0.03]] * 9, atol=2e-3
        )
        assert float(losses[-1]) < float(losses[0])

    def test_zero_weight_matches_are_inert(self, rng):
        nodes, edges, edge_w, pts, anchors, w, u, v, moved = (
            _synthetic_alignment_problem(rng)
        )
        # corrupt half the matches but zero their weights
        u2 = u.copy()
        u2[:100] += 500.0
        cw = np.ones(len(pts), np.float32)
        cw[:100] = 0.0
        rot, trans, _ = optimize_point_cloud_alignment(
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
            np.asarray(trans), [[0.02, -0.01, 0.03]] * 9, atol=3e-3
        )

    def test_differentiable_through_solve(self, rng):
        nodes, edges, edge_w, pts, anchors, w, u, v, moved = (
            _synthetic_alignment_problem(rng)
        )

        def loss_fn(uv):
            _, trans, _ = optimize_point_cloud_alignment(
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
            return jnp.sum(trans**2)

        grad = jax.grad(loss_fn)(jnp.asarray(np.stack([u, v], -1)))
        g = np.asarray(grad)
        assert np.isfinite(g).all()
        assert np.abs(g).max() > 0


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
