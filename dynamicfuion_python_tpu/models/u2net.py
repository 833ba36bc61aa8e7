"""U²-Net (lite) salient-object-detection network in Flax.

TPU-native replacement for the reference's vendored 3rd-party U-2-Net
(``run_sod.py:15-80`` shells out to ``3rd-party/U-2-Net/u2net_test.py``): the
U2NETP "lite" architecture — a two-level nested U-structure of RSU
(ReSidual U-block) encoders/decoders with deep side supervision — producing
a per-pixel saliency probability used as the foreground mask for background
subtraction in DeepDeform-style sequences.

NHWC layout throughout; all convs 3x3 with dilation where the original uses
it; down/up-sampling via stride-2 max pool and bilinear resize, so arbitrary
input sizes divisible by 32 work under jit with static shapes.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class ConvBnRelu(nn.Module):
    features: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features,
            (3, 3),
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=True,
        )(x)
        # GroupNorm stands in for BatchNorm (no running stats to manage in
        # a functional pipeline; equivalent capacity at SOD scales)
        x = nn.GroupNorm(num_groups=min(8, self.features))(x)
        return nn.relu(x)


def _down(x):
    return nn.max_pool(x, (2, 2), strides=(2, 2))


def _up_to(x, like):
    return jax.image.resize(
        x, (x.shape[0], like.shape[1], like.shape[2], x.shape[-1]), "bilinear"
    )


class RSU(nn.Module):
    """ReSidual U-block of the given depth."""

    depth: int
    mid: int
    out: int

    @nn.compact
    def __call__(self, x):
        hx_in = ConvBnRelu(self.out)(x)
        encs = []
        h = hx_in
        for level in range(self.depth - 1):
            h = ConvBnRelu(self.mid)(h)
            encs.append(h)
            if level < self.depth - 2:
                h = _down(h)
        h = ConvBnRelu(self.mid, dilation=2)(h)
        for level in reversed(range(self.depth - 1)):
            skip = encs[level]
            if h.shape[1] != skip.shape[1] or h.shape[2] != skip.shape[2]:
                h = _up_to(h, skip)
            h = ConvBnRelu(self.out if level == 0 else self.mid)(
                jnp.concatenate([h, skip], -1)
            )
        return h + hx_in


class RSU4F(nn.Module):
    """Dilation-only RSU (no pooling) used at the deepest stages."""

    mid: int
    out: int

    @nn.compact
    def __call__(self, x):
        hx_in = ConvBnRelu(self.out)(x)
        h1 = ConvBnRelu(self.mid, dilation=1)(hx_in)
        h2 = ConvBnRelu(self.mid, dilation=2)(h1)
        h3 = ConvBnRelu(self.mid, dilation=4)(h2)
        h4 = ConvBnRelu(self.mid, dilation=8)(h3)
        d3 = ConvBnRelu(self.mid, dilation=4)(jnp.concatenate([h4, h3], -1))
        d2 = ConvBnRelu(self.mid, dilation=2)(jnp.concatenate([d3, h2], -1))
        d1 = ConvBnRelu(self.out, dilation=1)(jnp.concatenate([d2, h1], -1))
        return d1 + hx_in


class U2NetLite(nn.Module):
    """U2NETP: 6 encoder + 5 decoder RSU stages, 64-channel lite config."""

    mid: int = 16
    out: int = 64

    @nn.compact
    def __call__(self, x):
        m, o = self.mid, self.out
        e1 = RSU(7, m, o)(x)
        e2 = RSU(6, m, o)(_down(e1))
        e3 = RSU(5, m, o)(_down(e2))
        e4 = RSU(4, m, o)(_down(e3))
        e5 = RSU4F(m, o)(_down(e4))
        e6 = RSU4F(m, o)(_down(e5))

        d5 = RSU4F(m, o)(jnp.concatenate([_up_to(e6, e5), e5], -1))
        d4 = RSU(4, m, o)(jnp.concatenate([_up_to(d5, e4), e4], -1))
        d3 = RSU(5, m, o)(jnp.concatenate([_up_to(d4, e3), e3], -1))
        d2 = RSU(6, m, o)(jnp.concatenate([_up_to(d3, e2), e2], -1))
        d1 = RSU(7, m, o)(jnp.concatenate([_up_to(d2, e1), e1], -1))

        sides = []
        for stage in (d1, d2, d3, d4, d5, e6):
            sides.append(_up_to(nn.Conv(1, (3, 3))(stage), d1))
        fused = nn.Conv(1, (1, 1))(jnp.concatenate(sides, -1))
        # (fused, side1..side6) sigmoid probabilities — original's output
        # contract; train with BCE on all seven
        return tuple(nn.sigmoid(s) for s in (fused, *sides))
