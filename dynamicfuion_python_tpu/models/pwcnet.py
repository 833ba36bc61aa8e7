"""PWC-Net optical flow network (Flax).

Capability parity with the reference's PyTorch PWC-Net
(``alignment/pwcnet.py:47-332``, the sniklaus implementation): 6-level
feature pyramid extractor (16/32/64/96/128/196 channels), per-level decoders
with cost-volume correlation + feature/flow upsampling + DenseNet-style
concatenation, and a dilated-convolution context refiner. Returns
(flow2..flow6, features2), flows at 1/4..1/64 resolution.

TPU-native: NHWC layout (native conv layout for XLA:TPU), correlation as the
fused shifted-product op (``ops/correlation.py``), bilinear backward warping
from ``ops/image_warp.py``. Weight init is Flax default (the reference ships
no pretrained checkpoint — ``nn_data/models/model_A`` holds only a marker
file)."""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from dynamicfuion_python_tpu.ops.correlation import correlation
from dynamicfuion_python_tpu.ops.image_warp import backward_warp


def _leaky(x):
    return nn.leaky_relu(x, negative_slope=0.1)


class Extractor(nn.Module):
    """6-level strided conv pyramid."""

    features: Sequence[int] = (16, 32, 64, 96, 128, 196)

    @nn.compact
    def __call__(self, x):
        pyramid = []
        for f in self.features:
            # explicit (1,1) padding: torch Conv2d(stride=2, padding=1)
            # semantics, NOT XLA SAME (which pads (0,1) for even dims) —
            # required for reference-checkpoint weight compatibility
            x = _leaky(
                nn.Conv(f, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))(x)
            )
            x = _leaky(nn.Conv(f, (3, 3))(x))
            x = _leaky(nn.Conv(f, (3, 3))(x))
            pyramid.append(x)
        return pyramid


# per-level flow magnitude scales applied before warping (reference
# ``scales`` table, pwcnet.py:160)
_SCALES = {3: 5.0, 4: 2.5, 5: 1.25, 6: 0.625}


class Decoder(nn.Module):
    """Per-level flow decoder with dense connections."""

    level: int

    @nn.compact
    def __call__(self, first, second, prev):
        if prev is None:
            cost = _leaky(correlation(first, second))
            features = cost
            flow_in = None
        else:
            prev_flow, prev_features = prev
            flow_in = nn.ConvTranspose(2, (4, 4), strides=(2, 2))(prev_flow)
            upfeat = nn.ConvTranspose(2, (4, 4), strides=(2, 2))(prev_features)
            scale = _SCALES[self.level + 1]
            warped = jax.vmap(backward_warp)(second, flow_in * scale)
            cost = _leaky(correlation(first, warped))
            features = jnp.concatenate([cost, first, flow_in, upfeat], axis=-1)

        for f in (128, 128, 96, 64, 32):
            out = _leaky(nn.Conv(f, (3, 3))(features))
            features = jnp.concatenate([out, features], axis=-1)
        flow = nn.Conv(2, (3, 3))(features)
        return flow, features


class Refiner(nn.Module):
    """Dilated-conv context network refining flow2."""

    @nn.compact
    def __call__(self, features):
        dilations = (1, 2, 4, 8, 16, 1)
        widths = (128, 128, 128, 96, 64, 32)
        x = features
        for width, dil in zip(widths, dilations):
            x = _leaky(
                nn.Conv(width, (3, 3), kernel_dilation=(dil, dil))(x)
            )
        return nn.Conv(2, (3, 3))(x)


class PWCNet(nn.Module):
    """Full network; inputs NHWC RGB in [0, 1]."""

    @nn.compact
    def __call__(self, first, second):
        extractor = Extractor()
        p1 = extractor(first)
        p2 = extractor(second)

        prev = None
        flows = {}
        features2 = None
        for level, idx in ((6, 5), (5, 4), (4, 3), (3, 2), (2, 1)):
            flow, features = Decoder(level=level, name=f"decoder{level}")(
                p1[idx], p2[idx], prev
            )
            prev = (flow, features)
            flows[level] = flow
            if level == 2:
                flow = flow + Refiner(name="refiner")(features)
                flows[2] = flow
                features2 = features
        return flows[2], flows[3], flows[4], flows[5], flows[6], features2


def upsample_flow_to_full(flow2: jnp.ndarray, image_size: tuple[int, int]) -> jnp.ndarray:
    """flow2 (1/4 res) -> dense full-resolution flow, x20 magnitude (the
    reference's ``apply_flow_net`` upsampling convention,
    ``deform_net.py:618-633``)."""
    h, w = image_size
    up = jax.image.resize(
        flow2, (flow2.shape[0], h, w, 2), method="bilinear"
    )
    return up * 20.0
