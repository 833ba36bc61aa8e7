"""Salient-object-detection mask generation for RGB sequences.

Capability parity with the reference's ``run_sod.py:15-80`` (which shells out
to the vendored 3rd-party U-2-Net): walks a DeepDeform split/sequence (or a
custom input folder), runs the Flax U²-Net-lite (``models/u2net.py``) on each
color frame, and writes greyscale saliency masks (0-255 PNG, same stem as the
input frame) to the ``sod`` output folder the fusion data layer reads for
background subtraction.

Same CLI surface: ``--dataset --split --sequence_index | --input_folder``,
``--output_folder``. Additionally ``--checkpoint``: either a torch
``u2net.pth``/``u2netp.pth`` from the original U-2-Net release (converted
on the fly via ``models/u2net.py:convert_u2net_checkpoint`` — pass
``--full`` for the big model, matching the reference's default) or an
npz/msgpack of flax variables. Without one, a deterministic seed
initialization is used, which is only useful for smoke-testing the pipeline
shape, and a warning is printed.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

PROGRAM_EXIT_SUCCESS = 0


def _load_params(path: str | None, model, sample):
    import jax

    if path is None:
        print(
            "WARNING: no --checkpoint given; using seed-initialized weights "
            "(masks will not be meaningful saliency)",
            file=sys.stderr,
        )
        return model.init(jax.random.PRNGKey(0), sample)
    p = Path(path)
    if p.suffix in (".pth", ".pt"):
        import torch

        from dynamicfuion_python_tpu.models.u2net import (
            convert_u2net_checkpoint,
        )

        state_dict = torch.load(p, map_location="cpu")
        variables = convert_u2net_checkpoint(state_dict)
        import jax as _jax

        template = model.init(_jax.random.PRNGKey(0), sample)
        t_shapes = _jax.tree.map(lambda a: a.shape, template)
        v_shapes = _jax.tree.map(lambda a: a.shape, variables)
        if t_shapes != v_shapes:
            raise ValueError(
                "converted checkpoint does not match the model configuration "
                "(use --full for u2net.pth, omit it for u2netp.pth)"
            )
        return variables
    if p.suffix == ".npz":
        import flax

        flat = dict(np.load(p, allow_pickle=False))
        return flax.traverse_util.unflatten_dict(
            {tuple(k.split("/")): v for k, v in flat.items()}
        )
    import flax.serialization

    template = model.init(jax.random.PRNGKey(0), sample)
    return flax.serialization.from_bytes(template, p.read_bytes())


def generate_masks(
    input_folder: str | Path,
    output_folder: str | Path,
    checkpoint: str | None = None,
    resize_to: tuple[int, int] = (320, 320),
    threshold: float | None = None,
    full_model: bool = False,
) -> list[Path]:
    """Run SOD over every image in ``input_folder`` -> mask PNGs. Returns the
    written paths. ``threshold`` binarizes (the reference writes greyscale)."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from dynamicfuion_python_tpu.models.u2net import U2NetFull, U2NetLite

    input_folder = Path(input_folder)
    output_folder = Path(output_folder)
    output_folder.mkdir(parents=True, exist_ok=True)

    frames = sorted(
        p for p in input_folder.iterdir()
        if p.suffix.lower() in (".png", ".jpg", ".jpeg")
    )
    if not frames:
        raise FileNotFoundError(f"no images in {input_folder}")

    model = U2NetFull() if full_model else U2NetLite()
    sample = jnp.zeros((1, *resize_to, 3), jnp.float32)
    params = _load_params(checkpoint, model, sample)
    apply = jax.jit(lambda p, x: model.apply(p, x)[0])

    written = []
    for frame in frames:
        img = Image.open(frame).convert("RGB")
        orig_size = img.size  # (W, H)
        arr = np.asarray(img.resize(resize_to[::-1]), np.float32)
        # original ToTensorLab(flag=0) preprocessing (data_loader.py:222-231):
        # scale by the per-image max, then imagenet mean/std
        arr = arr / max(float(arr.max()), 1e-6)
        arr = (arr - np.asarray([0.485, 0.456, 0.406])) / np.asarray(
            [0.229, 0.224, 0.225]
        )
        prob = apply(params, jnp.asarray(arr[None], jnp.float32))[0, ..., 0]
        prob = np.asarray(prob)
        prob = (prob - prob.min()) / max(prob.max() - prob.min(), 1e-8)
        if threshold is not None:
            prob = (prob >= threshold).astype(np.float32)
        mask = Image.fromarray((prob * 255).astype(np.uint8)).resize(orig_size)
        out_path = output_folder / (frame.stem + ".png")
        mask.save(out_path)
        written.append(out_path)
    return written


def main(argv=None) -> int:
    possible_splits = ["train", "test", "val"]
    parser = argparse.ArgumentParser(
        "Run salient object detection to generate greyscale masks for an "
        "RGB image sequence."
    )
    parser.add_argument("-d", "--dataset", type=str, default=".")
    parser.add_argument("-sp", "--split", type=str, default="train")
    parser.add_argument("-si", "--sequence_index", type=int, default=70)
    parser.add_argument("-i", "--input_folder", type=str, default=None)
    parser.add_argument("-o", "--output_folder", type=str, default="sod")
    parser.add_argument("-c", "--checkpoint", type=str, default=None)
    parser.add_argument(
        "--full",
        action="store_true",
        help="use the full U2NET configuration (for u2net.pth checkpoints; "
        "default is U2NETP/lite)",
    )
    parser.add_argument("--threshold", type=float, default=None)
    args = parser.parse_args(argv)

    if args.input_folder is not None:
        input_folder = Path(args.input_folder)
        output_folder = (
            Path(args.output_folder)
            if Path(args.output_folder).is_absolute()
            else input_folder.parent / args.output_folder
        )
    else:
        if args.split not in possible_splits:
            raise ValueError(
                f"--split should be one of {possible_splits}, got {args.split}"
            )
        seq = Path(args.dataset) / args.split / f"seq{args.sequence_index:03d}"
        input_folder = seq / "color"
        output_folder = seq / args.output_folder

    written = generate_masks(
        input_folder,
        output_folder,
        args.checkpoint,
        threshold=args.threshold,
        full_model=args.full,
    )
    print(f"wrote {len(written)} masks to {output_folder}")
    return PROGRAM_EXIT_SUCCESS


if __name__ == "__main__":
    raise SystemExit(main())
