"""U²-Net salient-object-detection network in Flax.

TPU-native replacement for the reference's vendored 3rd-party U-2-Net
(``run_sod.py:15-80`` shells out to ``3rd-party/U-2-Net/u2net_test.py``): the
nested-U architecture of RSU (ReSidual U-block) encoders/decoders with deep
side supervision, producing a per-pixel saliency probability used as the
foreground mask for background subtraction in DeepDeform-style sequences.

Module/parameter naming mirrors the original torch model
(``3rd-party/U-2-Net/model/u2net.py``: ``stageN[d].rebnconvK[d].conv_s1`` /
``bn_s1``, ``sideN``, ``outconv``) and normalization is real BatchNorm
(running statistics), so pretrained ``u2net.pth`` / ``u2netp.pth``
checkpoints convert directly via :func:`convert_u2net_checkpoint`.

NHWC layout throughout; down-sampling is ceil-mode 2x2 max pool (torch
``MaxPool2d(2, stride=2, ceil_mode=True)`` parity) and up-sampling bilinear
resize, so any input size works under jit with static shapes.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class ConvBnRelu(nn.Module):
    """Original ``REBNCONV``: 3x3 conv (dilated) + BatchNorm + ReLU."""

    features: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            (3, 3),
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=True,
            name="conv_s1",
        )(x)
        # torch BatchNorm2d defaults: momentum=0.1 (flax momentum = 1 - 0.1),
        # eps=1e-5
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            name="bn_s1",
        )(x)
        return nn.relu(x)


def _down(x):
    """2x2 stride-2 max pool with ceil_mode=True semantics (odd dims are
    padded with -inf on the bottom/right so the last window survives)."""
    pad_h = x.shape[1] % 2
    pad_w = x.shape[2] % 2
    if pad_h or pad_w:
        x = jnp.pad(
            x,
            ((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
            constant_values=-jnp.inf,
        )
    return nn.max_pool(x, (2, 2), strides=(2, 2))


def _up_to(x, like):
    return jax.image.resize(
        x, (x.shape[0], like.shape[1], like.shape[2], x.shape[-1]), "bilinear"
    )


class RSU(nn.Module):
    """ReSidual U-block of the given depth (original RSU7..RSU4)."""

    depth: int
    mid: int
    out: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        hx_in = ConvBnRelu(self.out, name="rebnconvin")(x, train)
        encs = []
        h = hx_in
        for level in range(1, self.depth):
            h = ConvBnRelu(self.mid, name=f"rebnconv{level}")(h, train)
            encs.append(h)
            if level < self.depth - 1:
                h = _down(h)
        h = ConvBnRelu(self.mid, dilation=2, name=f"rebnconv{self.depth}")(
            h, train
        )
        for level in range(self.depth - 1, 0, -1):
            skip = encs[level - 1]
            if h.shape[1] != skip.shape[1] or h.shape[2] != skip.shape[2]:
                h = _up_to(h, skip)
            h = ConvBnRelu(
                self.out if level == 1 else self.mid, name=f"rebnconv{level}d"
            )(jnp.concatenate([h, skip], -1), train)
        return h + hx_in


class RSU4F(nn.Module):
    """Dilation-only RSU (no pooling) used at the deepest stages."""

    mid: int
    out: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        hx_in = ConvBnRelu(self.out, name="rebnconvin")(x, train)
        h1 = ConvBnRelu(self.mid, dilation=1, name="rebnconv1")(hx_in, train)
        h2 = ConvBnRelu(self.mid, dilation=2, name="rebnconv2")(h1, train)
        h3 = ConvBnRelu(self.mid, dilation=4, name="rebnconv3")(h2, train)
        h4 = ConvBnRelu(self.mid, dilation=8, name="rebnconv4")(h3, train)
        d3 = ConvBnRelu(self.mid, dilation=4, name="rebnconv3d")(
            jnp.concatenate([h4, h3], -1), train
        )
        d2 = ConvBnRelu(self.mid, dilation=2, name="rebnconv2d")(
            jnp.concatenate([d3, h2], -1), train
        )
        d1 = ConvBnRelu(self.out, dilation=1, name="rebnconv1d")(
            jnp.concatenate([d2, h1], -1), train
        )
        return d1 + hx_in


# stage plans: ((depth-or-None, mid, out) x 6 encoder, x 5 decoder); depth
# None = RSU4F. Channel plans match the originals exactly so pretrained
# checkpoints convert 1:1.
U2NETP_PLAN = (
    ((7, 16, 64), (6, 16, 64), (5, 16, 64), (4, 16, 64), (None, 16, 64), (None, 16, 64)),
    ((None, 16, 64), (4, 16, 64), (5, 16, 64), (6, 16, 64), (7, 16, 64)),
)
U2NET_PLAN = (
    ((7, 32, 64), (6, 32, 128), (5, 64, 256), (4, 128, 512), (None, 256, 512), (None, 256, 512)),
    ((None, 256, 512), (4, 128, 256), (5, 64, 128), (6, 32, 64), (7, 16, 64)),
)


def _make_stage(spec, name):
    depth, mid, out = spec
    if depth is None:
        return RSU4F(mid, out, name=name)
    return RSU(depth, mid, out, name=name)


class U2Net(nn.Module):
    """U2NET / U2NETP: 6 encoder + 5 decoder RSU stages with deep side
    supervision. ``plan`` selects the channel configuration."""

    plan: Any = U2NETP_PLAN

    @nn.compact
    def __call__(self, x, train: bool = False):
        enc_plan, dec_plan = self.plan
        e1 = _make_stage(enc_plan[0], "stage1")(x, train)
        e2 = _make_stage(enc_plan[1], "stage2")(_down(e1), train)
        e3 = _make_stage(enc_plan[2], "stage3")(_down(e2), train)
        e4 = _make_stage(enc_plan[3], "stage4")(_down(e3), train)
        e5 = _make_stage(enc_plan[4], "stage5")(_down(e4), train)
        e6 = _make_stage(enc_plan[5], "stage6")(_down(e5), train)

        d5 = _make_stage(dec_plan[0], "stage5d")(
            jnp.concatenate([_up_to(e6, e5), e5], -1), train
        )
        d4 = _make_stage(dec_plan[1], "stage4d")(
            jnp.concatenate([_up_to(d5, e4), e4], -1), train
        )
        d3 = _make_stage(dec_plan[2], "stage3d")(
            jnp.concatenate([_up_to(d4, e3), e3], -1), train
        )
        d2 = _make_stage(dec_plan[3], "stage2d")(
            jnp.concatenate([_up_to(d3, e2), e2], -1), train
        )
        d1 = _make_stage(dec_plan[4], "stage1d")(
            jnp.concatenate([_up_to(d2, e1), e1], -1), train
        )

        sides = []
        for i, stage in enumerate((d1, d2, d3, d4, d5, e6)):
            sides.append(
                _up_to(nn.Conv(1, (3, 3), name=f"side{i + 1}")(stage), d1)
            )
        fused = nn.Conv(1, (1, 1), name="outconv")(
            jnp.concatenate(sides, -1)
        )
        # (fused, side1..side6) sigmoid probabilities — original's output
        # contract; train with BCE on all seven
        return tuple(nn.sigmoid(s) for s in (fused, *sides))


def U2NetLite(mid: int = 16, out: int = 64) -> U2Net:
    """U2NETP-shaped model; ``mid``/``out`` shrink it for tests."""
    if (mid, out) == (16, 64):
        return U2Net(plan=U2NETP_PLAN)
    enc = tuple(
        (d, mid, out) for d, _, _ in ((7, 0, 0), (6, 0, 0), (5, 0, 0), (4, 0, 0), (None, 0, 0), (None, 0, 0))
    )
    dec = tuple(
        (d, mid, out) for d, _, _ in ((None, 0, 0), (4, 0, 0), (5, 0, 0), (6, 0, 0), (7, 0, 0))
    )
    return U2Net(plan=(enc, dec))


def U2NetFull() -> U2Net:
    """The full U2NET configuration (the reference's ``run_sod.py`` default
    model, ``u2net_test.py:62``)."""
    return U2Net(plan=U2NET_PLAN)


def convert_u2net_checkpoint(state_dict: dict) -> dict:
    """Convert an original-U-2-Net torch ``state_dict`` (e.g. the published
    ``u2net.pth`` / ``u2netp.pth``, loaded with
    ``torch.load(..., map_location='cpu')``) into flax variables
    ``{"params": ..., "batch_stats": ...}`` for :class:`U2Net`.

    Mapping (torch -> flax): ``*.conv_s1.weight [O,I,3,3]`` ->
    ``conv_s1.kernel [3,3,I,O]``; ``bn_s1.{weight,bias}`` ->
    ``bn_s1.{scale,bias}`` params; ``bn_s1.running_{mean,var}`` ->
    batch_stats ``bn_s1.{mean,var}``; ``sideN``/``outconv`` conv weights
    likewise.
    """
    params: dict = {}
    batch_stats: dict = {}

    def put(tree, path, value):
        node = tree
        for key in path[:-1]:
            node = node.setdefault(key, {})
        node[path[-1]] = value

    for name, tensor in state_dict.items():
        value = np.asarray(
            tensor.detach().cpu().numpy()
            if hasattr(tensor, "detach")
            else tensor
        )
        parts = name.split(".")
        if parts[-2:] == ["conv_s1", "weight"] or (
            parts[-1] == "weight" and parts[-2].startswith(("side", "outconv"))
        ):
            put(params, parts[:-1] + ["kernel"], value.transpose(2, 3, 1, 0))
        elif parts[-2:] == ["bn_s1", "weight"]:
            put(params, parts[:-1] + ["scale"], value)
        elif parts[-1] == "bias" and parts[-2] == "bn_s1":
            put(params, parts, value)
        elif parts[-1] == "bias":
            put(params, parts, value)
        elif parts[-1] == "running_mean":
            put(batch_stats, parts[:-1] + ["mean"], value)
        elif parts[-1] == "running_var":
            put(batch_stats, parts[:-1] + ["var"], value)
        elif parts[-1] == "num_batches_tracked":
            continue
        else:
            raise ValueError(f"unrecognized checkpoint entry: {name}")
    return {"params": params, "batch_stats": batch_stats}
