"""Cost-volume correlation for PWC-Net.

Capability parity with the reference's inline-CUDA correlation layer
(``alignment/correlation/correlation.py``, the NVIDIA/sniklaus kernel with a
hand-written autograd Function): for displacement radius md=4, out channel
(dy+4)*9+(dx+4) holds mean_c(first[y, x, c] * second[y+dy, x+dx, c]).

TPU-native: the 81 shifted inner products are expressed as a static unrolled
loop of elementwise multiplies + channel means over a padded copy — XLA
fuses the whole stack into one pass, and reverse-mode AD provides the
backward kernel the reference hand-writes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MAX_DISPLACEMENT = 4


def correlation(first: jnp.ndarray, second: jnp.ndarray) -> jnp.ndarray:
    """NHWC cost volume: f32[B, H, W, C] x2 -> f32[B, H, W, 81]."""
    md = MAX_DISPLACEMENT
    b, h, w, c = first.shape
    padded = jnp.pad(second, ((0, 0), (md, md), (md, md), (0, 0)))
    outputs = []
    for dy in range(-md, md + 1):
        for dx in range(-md, md + 1):
            shifted = jax.lax.dynamic_slice(
                padded, (0, dy + md, dx + md, 0), (b, h, w, c)
            )
            outputs.append(jnp.mean(first * shifted, axis=-1))
    return jnp.stack(outputs, axis=-1)
