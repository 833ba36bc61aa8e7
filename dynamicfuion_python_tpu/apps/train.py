"""DeformNet training (4-stage curriculum).

Capability parity with the reference ``apps/train.py:25-476`` +
``run_train.sh`` recipe (README.md:203-211): SGD+StepLR (or Adam) over
DeformLoss with the staged curriculum — ``0_flow`` (flow loss only, solver
skipped) -> ``1_solver`` (+graph/warp losses, mask net frozen) -> ``2_mask``
(+MaskNet & weighted BCE against ``compute_baseline_mask_gt`` oracle masks,
flow net frozen) -> ``3_refine`` (everything trains) — periodic in-training
evaluation (losses + EPE-2D / Graph Error 3D / EPE-3D / valid-solve ratio,
reference ``apps/train.py:224-317``), too-large-translation invalidation
(``:369-384``), and time-throttled checkpointing (``SnapshotManager`` ->
orbax).

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
from dynamicfuion_python_tpu.models.losses import (
    LossWeights,
    compute_baseline_mask_gt,
    epe_2d,
    epe_3d,
    total_loss,
    valid_ratio,
)
from dynamicfuion_python_tpu.models.pwcnet import upsample_flow_to_full


class StageConfig:
    """One curriculum stage: which losses fire, which nets freeze, whether
    the GN solver runs (reference flags freeze_optical_flow_net /
    freeze_mask_net / skip_solver, settings/deform_net.py:102-106)."""

    def __init__(self, weights, freeze_flow=False, freeze_mask=False,
                 skip_solver=False, use_mask_net=True):
        self.weights = weights
        self.freeze_flow = freeze_flow
        self.freeze_mask = freeze_mask
        self.skip_solver = skip_solver
        self.use_mask_net = use_mask_net


STAGES = {
    "0_flow": StageConfig(
        LossWeights(
            use_flow_loss=True, use_graph_loss=False, use_warp_loss=False,
            use_mask_loss=False,
        ),
        skip_solver=True,
        use_mask_net=False,
    ),
    "1_solver": StageConfig(
        LossWeights(
            use_flow_loss=True, use_graph_loss=True, use_warp_loss=True,
            use_mask_loss=False,
        ),
        use_mask_net=False,
    ),
    "2_mask": StageConfig(
        LossWeights(
            use_flow_loss=True, use_graph_loss=True, use_warp_loss=True,
            use_mask_loss=True,
        ),
        freeze_flow=True,
    ),
    "3_refine": StageConfig(
        LossWeights(
            use_flow_loss=True, use_graph_loss=True, use_warp_loss=True,
            use_mask_loss=True,
        ),
    ),
}

# reference settings/training.py:140-145
GN_MAX_MEAN_TRANSLATION_ERROR = 0.5


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


def _forward_and_loss(model, params, batch, stage: StageConfig):
    """Model forward + all gt preparation + total loss (shared by the train
    and eval steps)."""
    weights = stage.weights
    out = model.apply(
        params,
        batch["source"],
        batch["target"],
        batch["graph_nodes"],
        batch["graph_edges"],
        batch["graph_edges_weights"],
        batch["graph_clusters"],
        batch["pixel_anchors"],
        batch["pixel_weights"],
        batch["intrinsics"],
        match_subsample_uniforms=batch.get("match_subsample_uniforms"),
    )

    # too-large-translation invalidation (reference apps/train.py:369-384):
    # solves whose mean node-translation error exceeds the threshold produce
    # noisy gradients — drop them from the solver-dependent loss terms
    validity = out.deformations_validity
    err = jnp.linalg.norm(
        out.node_translations - batch["node_translations_gt"], axis=-1
    )
    denom = jnp.maximum(jnp.sum(validity, axis=1), 1.0)
    mean_err = jnp.sum(err * validity, axis=1) / denom
    keep = (mean_err <= GN_MAX_MEAN_TRANSLATION_ERROR).astype(jnp.float32)
    out = out._replace(
        deformations_validity=validity * keep[:, None],
        valid_solve=(out.valid_solve.astype(jnp.float32) * keep).astype(
            jnp.uint8
        ),
    )

    deformed_gt = (
        batch["source"][..., 3:].reshape(out.deformed_points.shape)
        + batch["scene_flow_gt"].reshape(out.deformed_points.shape)
    )
    deformed_mask = (
        batch["scene_flow_mask"].reshape(out.deformed_points.shape[:2])
        * keep[:, None]
    )

    mask_gt = None
    mask_valid = None
    if weights.use_mask_loss:
        h, w = batch["source"].shape[1:3]
        flow_full = jax.lax.stop_gradient(
            upsample_flow_to_full(out.flows[0], (h, w))
        )
        mask_gt, mask_valid = compute_baseline_mask_gt(
            flow_full,
            batch["source"][..., 3:],
            batch["target"][..., 3:],
            batch["scene_flow_gt"],
            batch["scene_flow_mask"].astype(bool),
            batch["target_boundary_mask"].astype(bool),
        )
    loss, parts = total_loss(
        out,
        batch["flow_gt"],
        batch["flow_mask"],
        batch["node_translations_gt"],
        deformed_gt,
        deformed_mask,
        mask_gt=mask_gt,
        mask_valid=mask_valid,
        weights=weights,
    )
    return loss, (parts, out)


def make_train_step(model: DeformNet, optimizer, stage: StageConfig):
    @jax.jit
    def train_step(params, opt_state, batch):
        def loss_fn(p):
            loss, (parts, _) = _forward_and_loss(model, p, batch, stage)
            return loss, parts

        (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, parts

    return train_step


def make_eval_step(model: DeformNet, stage: StageConfig):
    """In-training evaluation (reference apps/train.py:224-317): losses +
    the paper metrics over a validation batch."""

    @jax.jit
    def eval_step(params, batch):
        loss, (parts, out) = _forward_and_loss(model, params, batch, stage)
        h, w = batch["source"].shape[1:3]
        flow_full = upsample_flow_to_full(out.flows[0], (h, w))
        metrics = dict(parts)
        metrics["epe_2d"] = epe_2d(
            flow_full, batch["flow_gt"], batch["flow_mask"].astype(bool)
        )
        metrics["graph_error_3d"] = epe_3d(
            out.node_translations,
            batch["node_translations_gt"],
            out.deformations_validity > 0,
        )
        deformed_gt = (
            batch["source"][..., 3:].reshape(out.deformed_points.shape)
            + batch["scene_flow_gt"].reshape(out.deformed_points.shape)
        )
        metrics["epe_3d"] = epe_3d(
            out.deformed_points,
            deformed_gt,
            batch["scene_flow_mask"].reshape(out.deformed_points.shape[:2])
            > 0,
        )
        metrics["valid_ratio"] = valid_ratio(out.valid_solve)
        return metrics

    return eval_step


def _stage_optimizer(stage: StageConfig, params, learning_rate, use_adam,
                     momentum=0.9, use_lr_scheduler=True, step_lr=1000,
                     weight_decay=0.0):
    """SGD+StepLR by default (the published recipe,
    settings/training.py:28-45); Adam optional. Frozen subtrees (per stage)
    get zero updates via optax.multi_transform."""
    if use_lr_scheduler and not use_adam:
        schedule = optax.exponential_decay(
            learning_rate, transition_steps=step_lr, decay_rate=0.1,
            staircase=True,
        )
    else:
        schedule = learning_rate
    base = (
        optax.adam(schedule)
        if use_adam
        else optax.sgd(schedule, momentum=momentum)
    )
    if weight_decay > 0:
        base = optax.chain(
            optax.add_decayed_weights(weight_decay), base
        )

    def label_fn(tree):
        def label_path(path):
            top = path[0] if path else ""
            if stage.freeze_flow and top == "flow_net":
                return "frozen"
            if stage.freeze_mask and top == "mask_net":
                return "frozen"
            return "train"

        import flax

        flat = flax.traverse_util.flatten_dict(tree)
        return flax.traverse_util.unflatten_dict(
            {k: label_path(k[1:]) for k in flat}
        )

    return optax.multi_transform(
        {"train": base, "frozen": optax.set_to_zero()}, label_fn
    )


def train(
    data_root: str,
    stage: str = "1_solver",
    batch_size: int | None = None,
    learning_rate: float | None = None,
    iterations: int | None = None,
    max_nodes: int = 128,
    checkpoint_dir: str = "output/checkpoints",
    eval_every: int = 50,
    seed: int = 0,
    image_size=None,
    node_coverage: float = 0.05,
    use_adam: bool | None = None,
    momentum: float | None = None,
    use_lr_scheduler: bool = True,
    step_lr: int = 1000,
    training_config=None,
    labeled: bool = False,
    labels_filename: str = "train",
    val_labels_filename: str = "val",
):
    """``training_config`` (settings.TrainingConfig) supplies the reference
    defaults (batch size, lr, SGD momentum, weight decay, Adam toggle, match
    budgets); explicit arguments override."""
    from dynamicfuion_python_tpu.settings import TrainingConfig

    cfg = training_config or TrainingConfig()
    batch_size = cfg.batch_size if batch_size is None else batch_size
    learning_rate = (
        cfg.learning_rate if learning_rate is None else learning_rate
    )
    use_adam = cfg.use_adam if use_adam is None else use_adam
    momentum = cfg.momentum if momentum is None else momentum
    weight_decay = cfg.weight_decay
    gn_max_matches_train = cfg.gn_max_matches_train
    shuffle = cfg.shuffle
    if labeled:
        # the reference's PRIMARY training path: a labels JSON listing
        # precomputed graph-blob pairs (reference ``apps/train.py:162-198``
        # over ``data/deform_dataset.py:18-300``)
        from dynamicfuion_python_tpu.data.deform_dataset import (
            LabeledDeformDataset,
        )

        size = tuple(image_size) if image_size is not None else (448, 640)
        dataset = LabeledDeformDataset(
            data_root, labels_filename, input_size=size, max_nodes=max_nodes
        )
        if len(dataset) == 0:
            raise ValueError(
                f"no pairs listed in {data_root}/{labels_filename}.json"
            )
        try:
            val_dataset = LabeledDeformDataset(
                data_root, val_labels_filename, input_size=size,
                max_nodes=max_nodes,
            )
            if len(val_dataset) == 0:
                val_dataset = dataset
        except FileNotFoundError:
            val_dataset = dataset
    else:
        dataset = DeformDataset(
            Path(data_root) / "train", max_nodes=max_nodes,
            image_size=image_size, node_coverage=node_coverage,
        )
        if len(dataset) == 0:
            raise ValueError(f"no labeled pairs under {data_root}/train")
        try:
            val_dataset = DeformDataset(
                Path(data_root) / "val", max_nodes=max_nodes,
                image_size=image_size, node_coverage=node_coverage,
            )
            if len(val_dataset) == 0:
                val_dataset = dataset
        except (FileNotFoundError, ValueError):
            val_dataset = dataset
    stage_cfg = STAGES[stage]
    weights = stage_cfg.weights

    sample = dataset.batch([0])
    if iterations is None:
        # reference recipe: `epochs` passes over the dataset
        iterations = max(
            1, cfg.epochs * ((len(dataset) + batch_size - 1) // batch_size)
        )
    model = DeformNet(
        use_mask=stage_cfg.use_mask_net,
        num_nodes=max_nodes,
        gn_config=GnConfig(
            num_iterations=0 if stage_cfg.skip_solver else 3, lm_factor=0.1
        ),
        gn_max_matches=gn_max_matches_train,
    )
    # eval uses the val-split match budget (reference gn_max_matches_eval)
    model_eval = DeformNet(
        use_mask=stage_cfg.use_mask_net,
        num_nodes=max_nodes,
        gn_config=GnConfig(
            num_iterations=0 if stage_cfg.skip_solver else 3, lm_factor=0.1
        ),
        gn_max_matches=cfg.gn_max_matches_eval,
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
    optimizer = _stage_optimizer(
        stage_cfg, params, learning_rate, use_adam=use_adam,
        momentum=momentum, use_lr_scheduler=use_lr_scheduler, step_lr=step_lr,
        weight_decay=weight_decay,
    )
    opt_state = optimizer.init(params)
    train_step = make_train_step(model, optimizer, stage_cfg)
    eval_step = make_eval_step(model_eval, stage_cfg)

    ckpt_dir = Path(checkpoint_dir)
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    np_rng = np.random.default_rng(seed)
    history = []
    eval_history = []
    last_save = time.time()

    def prepare(batch):
        gt_t, gt_valid = node_translations_gt_from_scene_flow(batch)
        batch["node_translations_gt"] = gt_t
        # boundary mask of the TARGET frame (depth discontinuities), needed
        # by the mask-GT oracle (reference target_boundary_mask)
        from dynamicfuion_python_tpu.ops.image_proc_extras import (
            compute_boundary_mask,
        )

        if "target_boundary_mask" not in batch:
            # labeled datasets ship the (point-distance) boundary mask with
            # the pair; the on-the-fly path derives a depth-step one here
            target_z = batch["target"][..., 5]
            batch["target_boundary_mask"] = np.stack(
                [
                    np.asarray(compute_boundary_mask(jnp.asarray(z), 0.1))
                    for z in target_z
                ]
            )
        # per-batch uniforms for the gn_max_matches random subsampling
        batch["match_subsample_uniforms"] = np_rng.uniform(
            size=batch["target"].shape[:3]
        ).astype(np.float32)
        return {k: jnp.asarray(v) for k, v in batch.items()}

    it = 0
    try:
      for it in range(iterations):
        if shuffle:
            idx = np_rng.choice(
                len(dataset), size=min(batch_size, len(dataset)),
                replace=len(dataset) < batch_size,
            )
        else:
            base = it * batch_size
            idx = [
                (base + j) % len(dataset)
                for j in range(min(batch_size, len(dataset)))
            ]
        batch = prepare(dataset.batch(idx))
        params, opt_state, loss, parts = train_step(params, opt_state, batch)
        history.append(float(loss))
        if it % 10 == 0:
            print(
                f"iter {it}: loss {float(loss):.4f} "
                + " ".join(f"{k}={float(v):.4f}" for k, v in parts.items()),
                flush=True,
            )
        # periodic in-training evaluation (reference apps/train.py:224-317)
        if eval_every > 0 and (it + 1) % eval_every == 0:
            vidx = np_rng.choice(
                len(val_dataset), size=min(batch_size, len(val_dataset)),
                replace=len(val_dataset) < batch_size,
            )
            metrics = eval_step(params, prepare(val_dataset.batch(vidx)))
            metrics = {k: float(v) for k, v in metrics.items()}
            metrics["iteration"] = it
            eval_history.append(metrics)
            print(
                f"eval @{it}: "
                + " ".join(f"{k}={v:.4f}" for k, v in metrics.items()),
                flush=True,
            )
        # time-throttled snapshot (reference SnapshotManager: 5 min default)
        if time.time() - last_save > 300 or it == iterations - 1:
            save_checkpoint(ckpt_dir, params, opt_state, it)
            last_save = time.time()
    except (KeyboardInterrupt, ConnectionResetError):
        # interrupt-save (reference ``apps/train.py:466-469``): a killed
        # 30k-iteration stage still leaves a final snapshot on disk
        save_checkpoint(ckpt_dir, params, opt_state, it)
        print(f"interrupted at iteration {it}: snapshot saved", flush=True)
        raise
    if eval_history:
        (ckpt_dir / "eval_history.json").write_text(
            json.dumps(eval_history, indent=1)
        )
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
        elif arg == "--labeled":
            kwargs["labeled"] = True
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
            str_keys = {
                "checkpoint_dir", "stage", "data_root",
                "labels_filename", "val_labels_filename",
            }
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
