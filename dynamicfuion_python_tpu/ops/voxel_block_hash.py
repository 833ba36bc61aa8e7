"""Static-capacity voxel-block table primitives (the TPU hash map).

Replaces Open3D's pointer-based ``core::HashMap`` underlying
``cpp/geometry/VoxelBlockGrid.h:48`` with a fully static-shape design:

  - block keys are 3D integer block coordinates packed into one int32
    (10 bits + bias per axis, so the world spans 1024^3 blocks);
  - a *sorted key index* (keys + slot permutation, empty slots = INT32_MAX)
    gives O(log N) lookup via ``searchsorted`` — vectorized over millions of
    queries at once, which is how TPU wants it;
  - insertion = mask of novel keys -> compact into free slots via cumsum
    (no atomics, deterministic), then re-sort the index.

Everything is jit-safe; capacity overflow clamps and is reported via the
returned count so callers can grow + re-run (host-side) when needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# plain Python int — a module-level jnp scalar would initialize the device
# backend at import time
EMPTY_KEY = 2**31 - 1
_BIAS = 512  # blocks per axis span [-512, 511]


def pack_block_keys(coords: jnp.ndarray) -> jnp.ndarray:
    """int32[..., 3] block coords -> packed int32[...] keys (lexicographic)."""
    c = coords + _BIAS
    return (c[..., 0] << 20) | (c[..., 1] << 10) | c[..., 2]


def unpack_block_keys(keys: jnp.ndarray) -> jnp.ndarray:
    """Packed keys -> int32[..., 3] block coords (EMPTY_KEY-safe at caller)."""
    x = (keys >> 20) & 0x3FF
    y = (keys >> 10) & 0x3FF
    z = keys & 0x3FF
    return jnp.stack([x, y, z], axis=-1) - _BIAS


def build_sorted_index(
    slot_keys: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Sort per-slot keys (EMPTY_KEY in unused slots sorts last).

    Returns (sorted_keys, slot_of_sorted) both [capacity].
    """
    order = jnp.argsort(slot_keys)
    return slot_keys[order], order.astype(jnp.int32)


def lookup(
    sorted_keys: jnp.ndarray, slot_of_sorted: jnp.ndarray, query_keys: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Find storage slots for packed query keys.

    Returns (slots int32[...], found bool[...]); slot is arbitrary-but-valid
    when not found (callers must mask with ``found``).
    """
    pos = jnp.searchsorted(sorted_keys, query_keys)
    pos = jnp.minimum(pos, sorted_keys.shape[0] - 1)
    found = sorted_keys[pos] == query_keys
    return slot_of_sorted[pos], found


def unique_keys_padded(keys: jnp.ndarray, pad_key=EMPTY_KEY) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Deduplicate packed keys -> (unique keys compacted to front, count).

    Output has the same length as input; unused tail = ``pad_key``. Entries
    equal to ``pad_key`` in the input are treated as invalid and dropped.
    """
    n = keys.shape[0]
    sorted_k = jnp.sort(keys)
    heads = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_k[1:] != sorted_k[:-1]]
    ) & (sorted_k != pad_key)
    dest = jnp.cumsum(heads) - 1
    out = jnp.full((n,), pad_key, keys.dtype)
    out = out.at[jnp.where(heads, dest, n - 1)].set(
        jnp.where(heads, sorted_k, out[-1])
    )
    # the scatter above may clobber the final slot with a non-head value; fix:
    count = jnp.sum(heads)
    out = jnp.where(jnp.arange(n) < count, out, pad_key)
    return out, count
