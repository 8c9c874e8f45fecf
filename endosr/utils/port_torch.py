"""Checkpoint porter: PyTorch ``.pth`` state dicts → flax param pytrees.

The reference ships GPU checkpoints (``latest_G.pth`` etc., saved by
``base_model.save_network``, ``codes/models/base_model.py:77-85``). This
module maps them onto the NHWC flax parameter trees of ``endosr.nn``.

Name translation (flax → torch):
  * module names: ``depth_residual3`` → ``depth-residual3``; a trailing
    ``_<idx>`` Sequential index becomes ``.<idx>`` (``head_0`` → ``head.0``)
  * leaves: ``kernel``→``weight``, ``v``→``weight_v``, ``g``→``weight_g``,
    SEAN's fused leaves ``A_i_j_kernel``→``A_i_j.weight`` etc.

Tensor layout:
  * Conv OIHW → HWIO (transpose 2,3,1,0)
  * ConvTranspose (I,O,kh,kw) → our storage (kh,kw,I,O) (transpose 2,3,0,1)
  * weight_g (D,1,1,1) → (D,)
  * Linear (O,I) → (I,O)

Dead parameters in the torch dict (e.g. the never-called ``depth-residual14``,
SURVEY.md §2.9-2, or unused ``upscale1/2`` at small scales) are ignored.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Mapping

import numpy as np

__all__ = ["port_state_dict", "load_torch_state_dict", "flatten_params", "unflatten_params"]

_SEQ_IDX = re.compile(r"^(.*)_(\d+)$")

# flax module-name segments that are ConvTranspose (need the (I,O) layout)
_TRANSPOSE_CONV_SEGMENTS = {"layer4", "mlp_depthMatrix"}


def load_torch_state_dict(path: str) -> dict[str, np.ndarray]:
    """Load a torch checkpoint file into numpy arrays (CPU, no torch device)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):  # DDP/DP prefix strip, like load_network
            k = k[len("module."):]
        out[k] = v.detach().numpy()
    return out


def flatten_params(tree: Mapping[str, Any], prefix: tuple[str, ...] = ()) -> dict[tuple[str, ...], Any]:
    flat: dict[tuple[str, ...], Any] = {}
    for k, v in tree.items():
        if isinstance(v, Mapping):
            flat.update(flatten_params(v, prefix + (k,)))
        else:
            flat[prefix + (k,)] = v
    return flat


def unflatten_params(flat: Mapping[tuple[str, ...], Any]) -> dict:
    tree: dict = {}
    for path, v in flat.items():
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v
    return tree


def _segment_to_torch(seg: str) -> str:
    if seg.startswith("depth_residual"):
        return "depth-residual" + seg[len("depth_residual"):]
    if seg.startswith("classic_residual"):
        return "classic-residual" + seg[len("classic_residual"):]
    m = _SEQ_IDX.match(seg)
    if m and not m.group(1).startswith(("upscale", "layer")):
        return f"{m.group(1)}.{m.group(2)}"
    if m and m.group(1) in {"head", "upscale1", "upscale2", "upscale3", "conv1",
                            "conv2", "block", "mlp_mask"}:
        return f"{m.group(1)}.{m.group(2)}"
    return seg


_LEAF_MAP = {
    "kernel": "weight",
    "v": "weight_v",
    "g": "weight_g",
    "bias": "bias",
    "scale": "weight",   # affine norm scale
    "A_i_j_kernel": "A_i_j.weight",
    "A_i_j_bias": "A_i_j.bias",
    "alpha_gamma": "alpha_gamma",
    "alpha_beta": "alpha_beta",
}


def flax_path_to_torch_key(path: tuple[str, ...]) -> str:
    *mods, leaf = path
    segs = [_segment_to_torch(s) for s in mods]
    leaf_t = _LEAF_MAP.get(leaf, leaf)
    return ".".join(segs + [leaf_t]) if segs else leaf_t


def _convert(torch_arr: np.ndarray, flax_shape: tuple[int, ...],
             leaf: str, is_transpose_conv: bool) -> np.ndarray:
    a = np.asarray(torch_arr)
    if leaf in ("v", "kernel", "A_i_j_kernel") and a.ndim == 4:
        a = a.transpose(2, 3, 0, 1) if is_transpose_conv else a.transpose(2, 3, 1, 0)
    elif leaf == "g":
        a = a.reshape(-1)
    elif leaf == "kernel" and a.ndim == 2:  # linear
        a = a.T
    if tuple(a.shape) != tuple(flax_shape):
        raise ValueError(
            f"shape mismatch for leaf {leaf}: torch {a.shape} vs flax {flax_shape}"
        )
    return a


def port_state_dict(
    torch_sd: Mapping[str, np.ndarray],
    flax_params: Mapping[str, Any],
    key_fn: Callable[[tuple[str, ...]], str] = flax_path_to_torch_key,
    strict: bool = True,
) -> dict:
    """Fill a flax param tree from a torch state dict.

    ``strict`` requires every flax leaf to be found in the torch dict.
    Extra torch entries (dead modules) are always allowed, mirroring the
    reference's ``strict_load`` applying only to the torch side.
    """
    flat = flatten_params(flax_params)
    out: dict[tuple[str, ...], Any] = {}
    missing = []
    for path, leaf_val in flat.items():
        tkey = key_fn(path)
        if tkey not in torch_sd:
            if strict:
                missing.append(tkey)
                continue
            out[path] = leaf_val
            continue
        is_tc = any(seg in _TRANSPOSE_CONV_SEGMENTS for seg in path)
        arr = _convert(torch_sd[tkey], np.shape(leaf_val), path[-1], is_tc)
        out[path] = arr.astype(np.asarray(leaf_val).dtype)
    if missing:
        raise KeyError(f"missing {len(missing)} torch keys, e.g. {missing[:5]}")
    return unflatten_params(out)
