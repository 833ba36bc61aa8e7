"""Differentiable Gauss-Newton point-cloud alignment (the neural tracker's
solver).

Capability parity with the reference ``alignment/point_cloud_alignment_optimizer.py:32-512``
(``PointCloudAlignmentOptimizer``): per GN iteration, data residual rows
[flow-u, flow-v, depth] per correspondence (jacobians wrt the 4 anchor
nodes' axis-angle + translation), ARAP residuals over the flat graph edges,
A = J^T J + lm I, b = -J^T r, dense solve, axis-angle update — all
*differentiable* so training backprops through the solve.

TPU-native re-design (SURVEY.md §7.1):
  - the dense [3M x 6N] jacobian (the reference's main memory hog) is never
    materialized: per-match jacobians come from one vmapped ``jax.jacrev``
    of the 3-vector residual wrt its 4 anchors' 6-dof deltas, and J^T J /
    J^T r assemble by ``segment_sum`` over anchor pairs into [N, N, 6, 6]
    blocks;
  - the custom ``LinearSolverLU`` autograd Function is replaced by
    ``jnp.linalg.solve``, which is natively differentiable in JAX;
  - match counts are static (``max_matches``) with zero-weight padding, so
    the whole 3-iteration loop jits once and vmaps over the batch.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from dynamicfuion_python_tpu.ops.linalg.rodrigues import axis_angle_to_matrix

_P = jax.lax.Precision.HIGHEST


class GnConfig(NamedTuple):
    """Defaults mirror ``settings/deform_net.py``."""

    num_iterations: int = 3
    lm_factor: float = 0.1
    lambda_data_flow: float = 1.0  # sqrt(gn_data_flow)
    lambda_data_depth: float = 1.0
    lambda_arap: float = 1.0
    use_edge_weighting: bool = False
    # failure machinery (reference point_cloud_alignment_optimizer.py:219-267)
    check_condition_num: bool = False
    break_on_condition_num: bool = True
    max_condition_num: float = 1e6


class GnResult(NamedTuple):
    """Solve outputs + failure telemetry.

    ``valid_solve`` mirrors the reference's ``ill_posed_system`` /
    non-finite-solution guards (``point_cloud_alignment_optimizer.py:219-267``
    and ``deform_net.py:515-522``): 0 means at least one GN iteration produced
    a non-finite update (or tripped the condition-number cutoff) — callers
    must discard the transforms (they are frozen at the last valid state).
    """

    rotations: jnp.ndarray  # f32[N, 3, 3]
    translations: jnp.ndarray  # f32[N, 3]
    losses: jnp.ndarray  # f32[iterations]
    valid_solve: jnp.ndarray  # bool[]
    condition_numbers: jnp.ndarray  # f32[iterations] (inf when not checked)


def _match_residual(
    delta: jnp.ndarray,  # [4, 6]
    source_point: jnp.ndarray,  # [3]
    anchor_nodes: jnp.ndarray,  # [4, 3] positions
    anchor_weights: jnp.ndarray,  # [4]
    rot: jnp.ndarray,  # [4, 3, 3] current rotations of the anchors
    trans: jnp.ndarray,  # [4, 3]
    target_uv: jnp.ndarray,  # [2] flow-warped pixel target
    target_z: jnp.ndarray,  # [] target match depth
    intrinsics: jnp.ndarray,
    config: GnConfig,
) -> jnp.ndarray:
    """[flow-u, flow-v, depth] residual for one correspondence
    (``compute_data_residual_and_jacobian`` math)."""
    d_rot = axis_angle_to_matrix(delta[:, :3])
    r = jnp.einsum("kab,kbc->kac", d_rot, rot, precision=_P)
    t = trans + delta[:, 3:]
    offset = source_point[None] - anchor_nodes
    rotated = jnp.einsum("kab,kb->ka", r, offset, precision=_P)
    deformed = jnp.einsum(
        "k,ka->a", anchor_weights, anchor_nodes + rotated + t, precision=_P
    )
    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]
    inv_z = 1.0 / (deformed[2] + 1e-7)
    u = fx * deformed[0] * inv_z + cx
    v = fy * deformed[1] * inv_z + cy
    return jnp.stack(
        [
            config.lambda_data_flow * (u - target_uv[0]),
            config.lambda_data_flow * (v - target_uv[1]),
            config.lambda_data_depth * (deformed[2] - target_z),
        ]
    )


_match_res_jac = jax.vmap(
    jax.jacrev(_match_residual, argnums=0, has_aux=False),
    in_axes=(None, 0, 0, 0, 0, 0, 0, 0, None, None),
)
_match_res = jax.vmap(
    _match_residual, in_axes=(None, 0, 0, 0, 0, 0, 0, 0, None, None)
)


def _edge_residual_jacobian(nodes, rot, trans, edges, edge_weights, config):
    """ARAP residuals [E, 3] + jacobian factors (analytic, matching
    ``compute_arap_residual_and_jacobian``)."""
    i = edges[:, 0]
    j = edges[:, 1]
    w = (
        edge_weights
        if config.use_edge_weighting
        else jnp.ones_like(edge_weights)
    ) * config.lambda_arap
    rotated = jnp.einsum(
        "eab,eb->ea", rot[i], nodes[j] - nodes[i], precision=_P
    )
    res = w[:, None] * (rotated + nodes[i] + trans[i] - (nodes[j] + trans[j]))
    # d res / d rot_i = -w * skew(rotated); d/d t_i = w I; d/d t_j = -w I
    from dynamicfuion_python_tpu.ops.linalg.rodrigues import skew

    jac_rot_i = -w[:, None, None] * skew(rotated)
    return res, jac_rot_i, w


@functools.partial(jax.jit, static_argnames=("config", "num_nodes"))
def optimize_point_cloud_alignment(
    graph_nodes: jnp.ndarray,  # f32[N, 3]
    graph_edges: jnp.ndarray,  # int32[N, Ke] (-1 pad)
    graph_edge_weights: jnp.ndarray,  # f32[N, Ke]
    source_points: jnp.ndarray,  # f32[M, 3] filtered source points
    source_anchors: jnp.ndarray,  # int32[M, 4]
    source_anchor_weights: jnp.ndarray,  # f32[M, 4]
    correspondence_weights: jnp.ndarray,  # f32[M] (0 = padding/invalid)
    target_uv: jnp.ndarray,  # f32[M, 2] flow-warped pixel targets
    target_z: jnp.ndarray,  # f32[M]
    intrinsics: jnp.ndarray,
    num_nodes: int,
    config: GnConfig = GnConfig(),
    initial_rotations: jnp.ndarray | None = None,
    initial_translations: jnp.ndarray | None = None,
):
    """Returns a :class:`GnResult` (rotations, translations, per-iteration
    losses, valid_solve flag, per-iteration condition numbers).

    Fully differentiable wrt network-produced inputs (``target_uv``,
    ``correspondence_weights``) — gradients flow through the dense solve.
    """
    n = num_nodes
    rot = (
        initial_rotations
        if initial_rotations is not None
        else jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (n, 3, 3))
    )
    trans = (
        initial_translations
        if initial_translations is not None
        else jnp.zeros((n, 3), jnp.float32)
    )

    # flatten edge lists to pairs once
    ke = graph_edges.shape[1]
    src = jnp.repeat(jnp.arange(n), ke)
    dst = graph_edges.reshape(-1)
    edge_ok = dst >= 0
    pairs = jnp.stack([src, jnp.maximum(dst, 0)], axis=1)
    pair_w = jnp.where(edge_ok, graph_edge_weights.reshape(-1) * ke, 0.0)

    safe_anchor = jnp.maximum(source_anchors, 0)
    anchor_w = jnp.where(source_anchors >= 0, source_anchor_weights, 0.0)

    def gn_iteration(state, _):
        rot, trans, valid = state
        anchor_nodes = graph_nodes[safe_anchor]  # [M, 4, 3]
        jac = _match_res_jac(
            jnp.zeros((4, 6), jnp.float32),
            source_points,
            anchor_nodes,
            anchor_w,
            rot[safe_anchor],
            trans[safe_anchor],
            target_uv,
            target_z,
            intrinsics,
            config,
        )  # [M, 3, 4, 6]
        res = _match_res(
            jnp.zeros((4, 6), jnp.float32),
            source_points,
            anchor_nodes,
            anchor_w,
            rot[safe_anchor],
            trans[safe_anchor],
            target_uv,
            target_z,
            intrinsics,
            config,
        )  # [M, 3]
        cw = correspondence_weights
        jac = jac * cw[:, None, None, None]
        res_w = res * cw[:, None]

        # data J^T J: anchor-pair products -> [N, N, 6, 6]
        pair_blocks = jnp.einsum(
            "mrka,mrlb->mklab", jac, jac, precision=_P
        )  # [M, 4, 4, 6, 6]
        a_i = jnp.broadcast_to(safe_anchor[:, :, None], pair_blocks.shape[:3])
        a_j = jnp.broadcast_to(safe_anchor[:, None, :], pair_blocks.shape[:3])
        seg = (a_i * n + a_j).reshape(-1)
        h = jax.ops.segment_sum(
            pair_blocks.reshape(-1, 6, 6), seg, num_segments=n * n
        ).reshape(n, n, 6, 6)
        g = -jax.ops.segment_sum(
            jnp.einsum("mrka,mr->mka", jac, res_w, precision=_P).reshape(-1, 6),
            safe_anchor.reshape(-1),
            num_segments=n,
        )  # [N, 6]

        # ARAP
        e_res, e_jrot, e_w = _edge_residual_jacobian(
            graph_nodes, rot, trans, pairs, pair_w, config
        )
        e_res = e_res * edge_ok[:, None]
        e_jrot = e_jrot * edge_ok[:, None, None]
        e_w = e_w * edge_ok
        i_idx = pairs[:, 0]
        j_idx = pairs[:, 1]
        # J_i = [jrot | wI] (3x6), J_j = [0 | -wI]
        eye3 = jnp.eye(3, dtype=jnp.float32)
        j_i = jnp.concatenate(
            [e_jrot, e_w[:, None, None] * eye3[None]], axis=-1
        )  # [E, 3, 6]
        j_j = jnp.concatenate(
            [jnp.zeros_like(e_jrot), -e_w[:, None, None] * eye3[None]], axis=-1
        )
        blocks_ii = jnp.einsum("eab,eac->ebc", j_i, j_i, precision=_P)
        blocks_ij = jnp.einsum("eab,eac->ebc", j_i, j_j, precision=_P)
        blocks_ji = blocks_ij.swapaxes(-1, -2)
        blocks_jj = jnp.einsum("eab,eac->ebc", j_j, j_j, precision=_P)
        for blk, (ai, aj) in (
            (blocks_ii, (i_idx, i_idx)),
            (blocks_ij, (i_idx, j_idx)),
            (blocks_ji, (j_idx, i_idx)),
            (blocks_jj, (j_idx, j_idx)),
        ):
            h = h.at[ai, aj].add(blk)
        g = g.at[i_idx].add(
            -jnp.einsum("eab,ea->eb", j_i, e_res, precision=_P)
        )
        g = g.at[j_idx].add(
            -jnp.einsum("eab,ea->eb", j_j, e_res, precision=_P)
        )

        # dense system
        h_dense = h.transpose(0, 2, 1, 3).reshape(6 * n, 6 * n)
        h_dense = h_dense + config.lm_factor * jnp.eye(6 * n)
        delta = jnp.linalg.solve(h_dense, g.reshape(-1)).reshape(n, 6)

        # ---- failure guards (reference solve_linear_system, ----------------
        # point_cloud_alignment_optimizer.py:219-267): non-finite solution
        # and (optional) condition-number cutoff mark the solve invalid; the
        # state freezes at the last valid iterate from then on.
        if config.check_condition_num:
            eigs = jnp.abs(
                jnp.linalg.eigvalsh(jax.lax.stop_gradient(h_dense))
            )
            condition_number = jnp.max(eigs) / jnp.maximum(jnp.min(eigs), 1e-30)
            if config.break_on_condition_num:
                cond_ok = jnp.isfinite(condition_number) & (
                    condition_number <= config.max_condition_num
                )
            else:
                cond_ok = jnp.array(True)
        else:
            condition_number = jnp.array(jnp.inf, jnp.float32)
            cond_ok = jnp.array(True)
        step_ok = jnp.all(jnp.isfinite(delta)) & cond_ok
        delta = jnp.where(step_ok, jnp.where(jnp.isfinite(delta), delta, 0.0), 0.0)
        valid = valid & step_ok

        new_rot = jnp.einsum(
            "nab,nbc->nac",
            axis_angle_to_matrix(delta[:, :3]),
            rot,
            precision=_P,
        )
        new_trans = trans + delta[:, 3:]
        new_rot = jnp.where(valid, new_rot, rot)
        new_trans = jnp.where(valid, new_trans, trans)
        loss = jnp.sum(res_w**2) + jnp.sum(e_res**2)
        return (new_rot, new_trans, valid), (loss, condition_number)

    if config.num_iterations == 0:
        # skip_solver mode (reference deform_net.py:230: stage 0_flow trains
        # the flow net only) — identity transforms, trivially valid
        return GnResult(
            rot,
            trans,
            jnp.zeros((1,), jnp.float32),
            jnp.array(True),
            jnp.full((1,), jnp.inf, jnp.float32),
        )

    (rot, trans, valid), (losses, condition_numbers) = jax.lax.scan(
        gn_iteration,
        (rot, trans, jnp.array(True)),
        None,
        length=config.num_iterations,
    )
    # final residual sanity (reference deform_net.py:515: writes solutions
    # only when torch.isfinite(residuals).all())
    valid = valid & jnp.isfinite(losses[-1])
    return GnResult(rot, trans, losses, valid, condition_numbers)
