"""Offline prediction generation.

Capability parity with ``apps/generate.py:21-189``: iterate a split's labeled
frame pairs, run DeformNet inference, save per-pair node deformations +
densely deformed points to an experiment directory (consumed by
``apps/evaluate.py``).

Run: python -m dynamicfuion_python_tpu.apps.generate --data <root> \
        --split train --out output/predictions [--checkpoint <dir>]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from dynamicfuion_python_tpu.data.deform_dataset import DeformDataset
from dynamicfuion_python_tpu.models.deform_net import DeformNet
from dynamicfuion_python_tpu.models.gn_point_cloud_optimizer import GnConfig


def generate(
    data_root: str,
    split: str = "train",
    out_dir: str = "output/predictions",
    checkpoint_dir: str | None = None,
    max_nodes: int = 128,
    seed: int = 0,
    image_size=None,
    node_coverage: float = 0.05,
):
    dataset = DeformDataset(Path(data_root) / split, max_nodes=max_nodes,
                            image_size=image_size, node_coverage=node_coverage)
    if len(dataset) == 0:
        raise ValueError(f"no labeled pairs under {data_root}/{split}")
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    model = DeformNet(
        use_mask=True, num_nodes=max_nodes, gn_config=GnConfig(num_iterations=3)
    )
    sample = dataset.batch([0])
    args = (
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
    params = model.init(jax.random.PRNGKey(seed), *args)
    if checkpoint_dir is not None:
        from dynamicfuion_python_tpu.apps.train import load_checkpoint

        params = load_checkpoint(Path(checkpoint_dir), params)

    apply = jax.jit(lambda p, *a: model.apply(p, *a, evaluate=True))

    index = []
    for i in range(len(dataset)):
        batch = dataset.batch([i])
        out_i = apply(
            params,
            jnp.asarray(batch["source"]),
            jnp.asarray(batch["target"]),
            jnp.asarray(batch["graph_nodes"]),
            jnp.asarray(batch["graph_edges"]),
            jnp.asarray(batch["graph_edges_weights"]),
            jnp.asarray(batch["graph_clusters"]),
            jnp.asarray(batch["pixel_anchors"]),
            jnp.asarray(batch["pixel_weights"]),
            jnp.asarray(batch["intrinsics"]),
        )
        seq_dir, src_id, tgt_id, _, _ = dataset.pairs[i]
        name = f"{seq_dir.name}_{src_id}_{tgt_id}"
        np.savez_compressed(
            out / f"{name}.npz",
            node_translations=np.asarray(out_i.node_translations[0]),
            node_rotations=np.asarray(out_i.node_rotations[0]),
            deformations_validity=np.asarray(out_i.deformations_validity[0]),
            deformed_points=np.asarray(out_i.deformed_points[0]),
            valid_solve=np.asarray(out_i.valid_solve[0]),
            num_nodes=batch["num_nodes"][0],
        )
        index.append(name)
        print(f"[{i+1}/{len(dataset)}] {name}", flush=True)
    (out / "index.json").write_text(json.dumps(index))
    return index


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    kwargs = {}
    it = iter(argv)
    for arg in it:
        if arg == "--data":
            kwargs["data_root"] = next(it)
        elif arg == "--split":
            kwargs["split"] = next(it)
        elif arg == "--out":
            kwargs["out_dir"] = next(it)
        elif arg == "--checkpoint":
            kwargs["checkpoint_dir"] = next(it)
        elif arg == "--platform":
            jax.config.update("jax_platforms", next(it))
    generate(**kwargs)


if __name__ == "__main__":
    main()
