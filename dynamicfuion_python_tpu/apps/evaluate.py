"""Metric evaluation of generated predictions.

Capability parity with ``apps/evaluate.py:14-205``: reload the predictions
written by ``apps/generate.py``, compare against ground truth, and report the
paper metrics — "Graph Error 3D" (mean node-translation EPE) and "EPE 3D"
(mean dense deformed-point EPE) plus valid-solve ratio (README.md:217-236).

Run: python -m dynamicfuion_python_tpu.apps.evaluate --data <root> \
        --split train --predictions output/predictions
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

from dynamicfuion_python_tpu.data.deform_dataset import DeformDataset


def evaluate(
    data_root: str,
    split: str = "train",
    predictions_dir: str = "output/predictions",
    max_nodes: int = 128,
    image_size=None,
    node_coverage: float = 0.05,
) -> dict:
    dataset = DeformDataset(Path(data_root) / split, max_nodes=max_nodes,
                            image_size=image_size, node_coverage=node_coverage)
    pred_dir = Path(predictions_dir)
    graph_errors = []
    epe3d_errors = []
    valid_solves = []
    for i in range(len(dataset)):
        seq_dir, src_id, tgt_id, _, _ = dataset.pairs[i]
        name = f"{seq_dir.name}_{src_id}_{tgt_id}"
        path = pred_dir / f"{name}.npz"
        if not path.exists():
            continue
        pred = np.load(path)
        sample = dataset[i]
        if sample.scene_flow_gt is None:
            continue
        n = int(pred["num_nodes"])

        # node gt: scene flow sampled at node projections
        from dynamicfuion_python_tpu.apps.train import (
            node_translations_gt_from_scene_flow,
        )

        batch = dataset.batch([i])
        gt_t, gt_valid = node_translations_gt_from_scene_flow(batch)
        validity = pred["deformations_validity"][:n] * gt_valid[0][:n]
        if validity.sum() > 0:
            err = np.linalg.norm(
                pred["node_translations"][:n] - gt_t[0][:n], axis=-1
            )
            graph_errors.append(float((err * validity).sum() / validity.sum()))

        # dense EPE 3D
        src_pts = sample.source[..., 3:].reshape(-1, 3)
        gt_deformed = src_pts + sample.scene_flow_gt.reshape(-1, 3)
        mask = (sample.source[..., 5].reshape(-1) > 0) & np.isfinite(
            gt_deformed
        ).all(-1)
        if mask.sum() > 0:
            err = np.linalg.norm(
                pred["deformed_points"] - gt_deformed, axis=-1
            )
            epe3d_errors.append(float(err[mask].mean()))
        valid_solves.append(float(pred["valid_solve"]))

    metrics = {
        "graph_error_3d": float(np.mean(graph_errors)) if graph_errors else None,
        "epe_3d": float(np.mean(epe3d_errors)) if epe3d_errors else None,
        "valid_solve_ratio": float(np.mean(valid_solves)) if valid_solves else None,
        "pair_count": len(valid_solves),
    }
    print(json.dumps(metrics, indent=1))
    return metrics


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    kwargs = {}
    it = iter(argv)
    for arg in it:
        if arg == "--data":
            kwargs["data_root"] = next(it)
        elif arg == "--split":
            kwargs["split"] = next(it)
        elif arg == "--predictions":
            kwargs["predictions_dir"] = next(it)
    evaluate(**kwargs)


if __name__ == "__main__":
    main()
