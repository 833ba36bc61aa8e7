"""Point-to-plane distances.

Capability parity with ``cpp/geometry/functional/PointToPlaneDistances.h`` /
``kernel/PointToPlaneDistancesImpl.h``: the per-pixel depth residual of the
dense-depth fitter, d = dot(n, p_rast - p_ref)
(``DeformableMeshToImageFitter.cpp:370-371``).
"""

from __future__ import annotations

import jax.numpy as jnp


def point_to_plane_distances(
    rasterized_points: jnp.ndarray,
    reference_points: jnp.ndarray,
    rasterized_normals: jnp.ndarray,
) -> jnp.ndarray:
    """dot(n, p_rast - p_ref) over matching [..., 3] arrays -> [...]."""
    return jnp.sum(
        rasterized_normals * (rasterized_points - reference_points), axis=-1
    )
