"""MaskNet: per-pixel correspondence-weight prediction (Flax).

Capability parity with the reference ``alignment/mask_net.py:6-42``: two
transposed convs upsample the 565-channel PWC-Net features2 to full
resolution (565 -> 32 -> 16 channels), concatenated with the 12-channel
[source rgbxyz, warped target rgb, target matches] stack, then 1 conv block +
3 residual blocks -> sigmoid weight map.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class ResBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        out = nn.relu(nn.Conv(self.features, (3, 3))(x))
        out = nn.Conv(self.features, (3, 3))(out)
        return nn.relu(out + x)


class MaskNet(nn.Module):
    @nn.compact
    def __call__(self, features2, x):
        """features2: f32[B, H/4, W/4, 565]; x: f32[B, H, W, 12]."""
        f = nn.ConvTranspose(32, (4, 4), strides=(2, 2))(features2)
        f = nn.ConvTranspose(16, (4, 4), strides=(2, 2))(f)
        out = jnp.concatenate([f, x], axis=-1)
        out = nn.relu(nn.Conv(16, (3, 3))(out))
        for _ in range(3):
            out = ResBlock(16)(out)
        out = nn.Conv(1, (3, 3))(out)
        return nn.sigmoid(out)
