"""Hierarchical ARAP (as-rigid-as-possible) regularization term.

Capability parity with the reference's ARAP kernels
(``cpp/alignment/kernel/DeformableMeshToImageFitterImpl.h:645-790``
``ComputeArapResiduals_{Fixed,Variable}CoverageWeight``,
``cpp/alignment/functional/{ArapJacobian,ArapHessian}`` assembling the
``BlockSparseArrowheadMatrix`` with arrow base = #layer-0 nodes,
``ArapHessianImpl.h:82``).

Per hierarchy edge e = (i, j) (i finer, j coarser, virtual indices):

    r_e = lam * w_e * [ (g_i + t_i) - (g_j + t_j) - R_i (g_i - g_j) ]

with w_e = decimation radius of the target layer (FIXED coverage) or the
max of the two nodes' coverage radii (VARIABLE). Jacobians (for increments
dR applied on the left, t += dt):

    d r_e / d rot_i   = lam*w_e * skew(R_i (g_i - g_j))
    d r_e / d trans_i = lam*w_e * I
    d r_e / d trans_j = -lam*w_e * I        (rot_j does not appear)

Two deliberate deviations from reference *code* (bugs noted in SURVEY.md —
the mid-refactor snapshot):
  - the fixed-coverage edge weight indexes ``edge_layer_indices`` by edge
    (the reference erroneously indexes it by node id,
    ``DeformableMeshToImageFitterImpl.h:708``);
  - the variable-coverage weight uses the coverage *radius*
    (sqrt of the stored squared weight) so both paths are in meters.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dynamicfuion_python_tpu.ops.linalg.rodrigues import skew

_P = jax.lax.Precision.HIGHEST


class ArapTerm(NamedTuple):
    """Per-edge residuals and jacobian factors."""

    residuals: jnp.ndarray  # f32[E, 3]
    rotation_jacobian_i: jnp.ndarray  # f32[E, 3, 3]  (= c_e * skew(R_i(g_i-g_j)))
    translation_scale: jnp.ndarray  # f32[E]  (= c_e; trans_j gets -c_e)
    huber_weights: jnp.ndarray  # f32[E] IRLS weight


def compute_arap_term(
    edges: jnp.ndarray,
    node_positions_virtual: jnp.ndarray,
    node_rotations_virtual: jnp.ndarray,
    node_translations_virtual: jnp.ndarray,
    edge_weights: jnp.ndarray,
    arap_term_weight: float,
    huber_constant: float | None = None,
) -> ArapTerm:
    """Residuals + jacobian factors for all hierarchy edges.

    ``edge_weights``: f32[E] precomputed w_e (see ``edge_weights_fixed`` /
    ``edge_weights_variable``).
    """
    i = edges[:, 0]
    j = edges[:, 1]
    g_i = node_positions_virtual[i]
    g_j = node_positions_virtual[j]
    t_i = node_translations_virtual[i]
    t_j = node_translations_virtual[j]
    r_mat = node_rotations_virtual[i]
    c = arap_term_weight * edge_weights  # [E]

    rotated = jnp.einsum("eab,eb->ea", r_mat, g_i - g_j, precision=_P)
    residuals = c[:, None] * ((g_i + t_i) - (g_j + t_j) - rotated)

    rot_jac = c[:, None, None] * skew(rotated)

    if huber_constant is None:
        hw = jnp.ones(edges.shape[0], jnp.float32)
    else:
        norm = jnp.linalg.norm(residuals, axis=-1)
        hw = jnp.where(norm <= huber_constant, 1.0, huber_constant / jnp.maximum(norm, 1e-12))
    return ArapTerm(residuals, rot_jac, c, hw)


def edge_weights_fixed(
    edge_layer_indices: jnp.ndarray, layer_decimation_radii: tuple
) -> jnp.ndarray:
    radii = jnp.asarray(layer_decimation_radii, jnp.float32)
    return radii[edge_layer_indices.astype(jnp.int32)]


def edge_weights_variable(
    edges: jnp.ndarray, node_coverage_weights_squared_virtual: jnp.ndarray
) -> jnp.ndarray:
    cov = jnp.sqrt(node_coverage_weights_squared_virtual)
    return jnp.maximum(cov[edges[:, 0]], cov[edges[:, 1]])


def assemble_arap_normal_equations(
    term: ArapTerm,
    edges: jnp.ndarray,
    num_nodes: int,
    arrow_base: int,
    max_wing_degree: int,
):
    """Accumulate the ARAP term into arrowhead-structured normal equations.

    Returns (stem_diag f32[N0,6,6], wing f32[N0,K,6,6], wing_cols int32[N0,K],
    corner f32[(N-N0)*6,(N-N0)*6], gradient f32[N*6]) where gradient = -J^T r
    (all in virtual node ordering; rotation dofs first within each 6-block).

    Edge (i, j) contributes:
      (i,i):  [JrT Jr, JrT*c ;  c*Jr, c^2 I]        (Jr = rot jacobian)
      (j,j):  c^2 on the translation diag
      (i,j):  [0, -c*Jr ; 0, -c^2 I]                 (only when i is stem ->
                                                      wing; else corner)
    """
    e = edges.shape[0]
    i = edges[:, 0]
    j = edges[:, 1]
    n0 = arrow_base
    nc = num_nodes - arrow_base
    hw = term.huber_weights
    c = term.translation_scale * jnp.sqrt(hw)  # IRLS: scale J and r by sqrt(w)
    jr = term.rotation_jacobian_i * jnp.sqrt(hw)[:, None, None]
    r = term.residuals * jnp.sqrt(hw)[:, None]

    # -- per-edge 6x6 blocks
    jr_t_jr = jnp.einsum("eab,eac->ebc", jr, jr, precision=_P)  # [E,3,3]
    jr_t_c = jnp.einsum("eab->eba", jr, precision=_P) * c[:, None, None]  # JrT * cI
    eye3 = jnp.eye(3, dtype=jnp.float32)
    c2_eye = (c**2)[:, None, None] * eye3

    def six_block(rr, rt, tr, tt):
        top = jnp.concatenate([rr, rt], axis=-1)
        bot = jnp.concatenate([tr, tt], axis=-1)
        return jnp.concatenate([top, bot], axis=-2)

    h_ii = six_block(jr_t_jr, jr_t_c, jr_t_c.swapaxes(-1, -2), c2_eye)
    zeros3 = jnp.zeros_like(jr_t_jr)
    h_ij = six_block(zeros3, -jr_t_c, zeros3, -c2_eye)
    h_jj = six_block(zeros3, zeros3, zeros3, c2_eye)

    # -- gradient: -J^T r (one-hot matmuls: TPU scatter-add serializes even
    # at this edge count and costs ~ms per op; the [N, E] one-hot contractions
    # are single fused kernels)
    gi_rot = -jnp.einsum("eab,ea->eb", jr, r, precision=_P)
    gi_trans = -c[:, None] * r
    gj_trans = c[:, None] * r
    ids_n = jnp.arange(num_nodes)
    oi = (i[None, :] == ids_n[:, None]).astype(jnp.float32)  # [N, E]
    oj = (j[None, :] == ids_n[:, None]).astype(jnp.float32)
    g_rot = jnp.einsum("ne,eb->nb", oi, gi_rot, precision=_P)
    g_trans = jnp.einsum(
        "ne,eb->nb", oi, gi_trans, precision=_P
    ) + jnp.einsum("ne,eb->nb", oj, gj_trans, precision=_P)
    g = jnp.concatenate([g_rot, g_trans], axis=-1)  # [N, 6]

    # -- diagonal accumulation (one-hot contractions again)
    h_ii_flat = h_ii.reshape(e, 36)
    h_jj_flat = h_jj.reshape(e, 36)
    stem_diag = jnp.einsum(
        "ne,ec->nc", oi[:n0], h_ii_flat, precision=_P
    ).reshape(n0, 6, 6)
    nc1 = max(nc, 1)
    oc_i = oi[n0:] if nc > 0 else jnp.zeros((1, e), jnp.float32)
    oc_j = oj[n0:] if nc > 0 else jnp.zeros((1, e), jnp.float32)
    corner_blocks_diag = (
        jnp.einsum("ne,ec->nc", oc_i, h_ii_flat, precision=_P)
        + jnp.einsum("ne,ec->nc", oc_j, h_jj_flat, precision=_P)
    ).reshape(nc1, 6, 6)

    # -- wing: edges with stem source, grouped by source (build() emits them
    # contiguously per fine node with a fixed per-layer degree)
    is_stem_edge = i < n0
    # slot of this edge within its source node's edge list (edges are emitted
    # contiguously per source by HierarchicalGraphWarpField.build, but we
    # compute the rank robustly: sort by source, subtract segment start)
    idx = jnp.arange(e)
    src_key = jnp.where(is_stem_edge, i, n0)
    sorted_order = jnp.argsort(src_key, stable=True)
    ssrc = src_key[sorted_order]
    first = jnp.where(
        jnp.concatenate([jnp.ones((1,), bool), ssrc[1:] != ssrc[:-1]]), idx, 0
    )
    first = jax.lax.associative_scan(jnp.maximum, first)
    slot_sorted = idx - first
    slot = jnp.zeros((e,), jnp.int32).at[sorted_order].set(slot_sorted.astype(jnp.int32))

    ok = is_stem_edge & (slot < max_wing_degree)
    h_ij_flat = h_ij.reshape(e, 36)
    wid = jnp.where(
        ok, i * max_wing_degree + slot, n0 * max_wing_degree
    )
    ids_w = jnp.arange(n0 * max_wing_degree)
    ow = (wid[None, :] == ids_w[:, None]).astype(jnp.float32)
    wing = jnp.einsum("we,ec->wc", ow, h_ij_flat, precision=_P).reshape(
        n0, max_wing_degree, 6, 6
    )
    wing_cols = jnp.full((n0, max_wing_degree), -1, jnp.int32)
    si = jnp.where(ok, i, 0)
    ss = jnp.where(ok, slot, 0)
    wing_cols = wing_cols.at[si, ss].set(
        jnp.where(ok, j - n0, wing_cols[si, ss])
    )

    # -- corner off-diagonals: edges between coarser layers
    nc1 = max(nc, 1)
    coarse_edge = i >= n0
    ci = jnp.maximum(i - n0, 0)
    cj = jnp.maximum(j - n0, 0)
    flat_idx = jnp.where(coarse_edge, ci * nc1 + cj, nc1 * nc1)
    ids_c = jnp.arange(nc1 * nc1)
    oc = (flat_idx[None, :] == ids_c[:, None]).astype(jnp.float32)
    off = jnp.einsum("ce,ef->cf", oc, h_ij_flat, precision=_P).reshape(
        nc1, nc1, 6, 6
    )
    # place blocks + transposes + diagonal blocks into the dense corner
    corner = off.transpose(0, 2, 1, 3) + off.transpose(1, 3, 0, 2)
    diag_idx = jnp.arange(nc1)
    corner = corner.at[diag_idx, :, diag_idx, :].add(corner_blocks_diag)
    corner = corner.reshape(nc1 * 6, nc1 * 6)

    return stem_diag, wing, wing_cols, corner, g.reshape(-1)
