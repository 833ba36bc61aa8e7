"""Reference (PyTorch) checkpoint -> Flax parameter conversion.

Capability parity with ``alignment/default.py:11-42``
(``load_default_nnrt_network`` with ``model_module_to_load`` = "full_model" |
"only_flow_net"): loads a reference NNRT DeformNet ``state_dict`` checkpoint
and maps it onto this framework's Flax ``DeformNet`` parameter tree, so
pretrained reference models (e.g. ``nn_data/models/model_A``) run unchanged
on TPU.

Layer-name correspondence (reference module attrs -> our Flax auto-names):

  flow_net.moduleExtractor.module{One..Six}.{0,2,4} -> flow_net/Extractor_0/Conv_{3l+i}
  flow_net.module{Two..Six}.moduleUpflow            -> flow_net/decoder{l}/ConvTranspose_0
  flow_net.module{Two..Six}.moduleUpfeat            -> flow_net/decoder{l}/ConvTranspose_1
  flow_net.module{Two..Six}.module{One..Fiv}.0      -> flow_net/decoder{l}/Conv_{0..4}
  flow_net.module{Two..Six}.moduleSix.0             -> flow_net/decoder{l}/Conv_5
  flow_net.moduleRefiner.moduleMain.{0,2,..,12}     -> flow_net/refiner/Conv_{0..6}
  mask_net.upconv{1,2}                              -> mask_net/ConvTranspose_{0,1}
  mask_net.model.0.0.0                              -> mask_net/Conv_0
  mask_net.model.{1,2,3}.block{0,1}.0               -> mask_net/ResBlock_{0,1,2}/Conv_{0,1}
  mask_net.model.4                                  -> mask_net/Conv_1

Weight layout transforms (validated by parity tests against torch CPU):
  Conv2d          [out,in,kh,kw]  -> HWIO via transpose(2,3,1,0)
  ConvTranspose2d [in,out,kh,kw]  -> spatial flip + transpose(2,3,0,1)
    (flax ``ConvTranspose`` uses the kernel unflipped, torch's transposed
    conv is the conv gradient — the flip reconciles the two.)

Checkpoints are read with ``torch.load(map_location="cpu")`` when torch is
importable, else from a ``numpy``-converted ``.npz`` fallback.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

_NUM_WORDS = {1: "One", 2: "Two", 3: "Thr", 4: "Fou", 5: "Fiv", 6: "Six"}


def convert_conv_weight(w: np.ndarray) -> np.ndarray:
    """torch Conv2d [out, in, kh, kw] -> flax HWIO [kh, kw, in, out]."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def convert_conv_transpose_weight(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d [in, out, kh, kw] -> flax [kh, kw, in, out]."""
    return np.ascontiguousarray(np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1)))


def load_state_dict(path: str | Path) -> dict[str, np.ndarray]:
    """Read a reference checkpoint into {torch_key: np.ndarray}."""
    path = Path(path)
    if path.suffix == ".npz":
        with np.load(path) as data:
            return {k: data[k] for k in data.files}
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    return {k: v.detach().cpu().numpy() for k, v in state.items()}


def _conv_entry(state, torch_name):
    return {
        "kernel": convert_conv_weight(state[f"{torch_name}.weight"]),
        "bias": state[f"{torch_name}.bias"].copy(),
    }


def _deconv_entry(state, torch_name):
    return {
        "kernel": convert_conv_transpose_weight(state[f"{torch_name}.weight"]),
        "bias": state[f"{torch_name}.bias"].copy(),
    }


def convert_extractor(state: dict[str, np.ndarray], prefix: str = "flow_net.") -> dict:
    """Torch feature-pyramid extractor slice -> Flax ``Extractor`` subtree."""
    extractor: dict = {}
    for level in range(6):
        word = _NUM_WORDS[level + 1]
        for conv_idx, seq_idx in enumerate((0, 2, 4)):
            extractor[f"Conv_{3 * level + conv_idx}"] = _conv_entry(
                state, f"{prefix}moduleExtractor.module{word}.{seq_idx}"
            )
    return extractor


def convert_pwcnet(state: dict[str, np.ndarray], prefix: str = "flow_net.") -> dict:
    """Torch PWC-Net state_dict slice -> Flax ``PWCNet`` param subtree."""
    params: dict = {"Extractor_0": convert_extractor(state, prefix)}

    for level in range(2, 7):
        word = _NUM_WORDS[level]
        dec: dict = {}
        if level != 6:
            dec["ConvTranspose_0"] = _deconv_entry(
                state, f"{prefix}module{word}.moduleUpflow"
            )
            dec["ConvTranspose_1"] = _deconv_entry(
                state, f"{prefix}module{word}.moduleUpfeat"
            )
        for conv_idx in range(5):
            dec[f"Conv_{conv_idx}"] = _conv_entry(
                state, f"{prefix}module{word}.module{_NUM_WORDS[conv_idx + 1]}.0"
            )
        dec["Conv_5"] = _conv_entry(state, f"{prefix}module{word}.moduleSix.0")
        params[f"decoder{level}"] = dec

    refiner: dict = {}
    for conv_idx, seq_idx in enumerate((0, 2, 4, 6, 8, 10, 12)):
        refiner[f"Conv_{conv_idx}"] = _conv_entry(
            state, f"{prefix}moduleRefiner.moduleMain.{seq_idx}"
        )
    params["refiner"] = refiner
    return params


def convert_mask_net(state: dict[str, np.ndarray], prefix: str = "mask_net.") -> dict:
    """Torch MaskNet state_dict slice -> Flax ``MaskNet`` param subtree."""
    params: dict = {
        "ConvTranspose_0": _deconv_entry(state, f"{prefix}upconv1"),
        "ConvTranspose_1": _deconv_entry(state, f"{prefix}upconv2"),
        "Conv_0": _conv_entry(state, f"{prefix}model.0.0.0"),
        "Conv_1": _conv_entry(state, f"{prefix}model.4"),
    }
    for block in range(3):
        params[f"ResBlock_{block}"] = {
            "Conv_0": _conv_entry(state, f"{prefix}model.{block + 1}.block0.0"),
            "Conv_1": _conv_entry(state, f"{prefix}model.{block + 1}.block1.0"),
        }
    return params


def _tree_shapes(tree, out, path=""):
    if isinstance(tree, dict):
        for k, v in tree.items():
            _tree_shapes(v, out, f"{path}/{k}")
    else:
        out[path] = tuple(np.shape(tree))
    return out


def convert_deform_net_checkpoint(
    path: str | Path,
    params_template: dict | None = None,
    only_flow_net: bool = False,
) -> dict:
    """Full reference DeformNet checkpoint -> Flax params.

    ``only_flow_net`` mirrors the reference's partial-loading mode
    (``alignment/default.py:31-39``): convert just the flow net and take
    mask-net params from ``params_template``. When a template is given, the
    converted tree's leaf shapes are validated against it.
    """
    state = load_state_dict(path)
    if not any(k.startswith("flow_net.") for k in state):
        # checkpoint of a bare PWCNet (reference also saves flow-only ckpts)
        state = {f"flow_net.{k}": v for k, v in state.items()}
    params: dict = {"flow_net": convert_pwcnet(state)}
    if not only_flow_net and any(k.startswith("mask_net.") for k in state):
        params["mask_net"] = convert_mask_net(state)
    elif params_template is not None and "mask_net" in params_template:
        params["mask_net"] = params_template["mask_net"]

    if params_template is not None:
        got = _tree_shapes(params, {})
        want = _tree_shapes(params_template, {})
        missing = sorted(set(want) - set(got))
        extra = sorted(set(got) - set(want))
        mismatched = sorted(
            p for p in set(got) & set(want) if got[p] != want[p]
        )
        if missing or extra or mismatched:
            raise ValueError(
                f"checkpoint/model structure mismatch: missing={missing[:5]} "
                f"extra={extra[:5]} shape-mismatch="
                f"{[(p, got[p], want[p]) for p in mismatched[:5]]}"
            )
    return params
