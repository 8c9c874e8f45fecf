"""Checkpoint surgery: copy matching parameters between checkpoints.

Capability twin of ``codes/scripts/transfer_params_sft.py`` /
``transfer_params_MSRResNet.py``: initialize a new model's checkpoint from a
donor checkpoint wherever names+shapes match (e.g. seed an SFT net from a
plain SR net). Works on flax ``.ckpt`` msgpack files and torch ``.pth``
donors (ported on the fly).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def transfer_params(donor_path: str, target_path: str, out_path: str) -> int:
    from flax import serialization

    from endosr.utils.port_torch import flatten_params, unflatten_params

    def load_any(path, template=None):
        if path.endswith(".pth"):
            from endosr.utils.port_torch import load_torch_state_dict

            return {("torch",) + tuple(k.split(".")): v
                    for k, v in load_torch_state_dict(path).items()}
        with open(path, "rb") as f:
            tree = serialization.msgpack_restore(f.read())
        return flatten_params(tree)

    donor = load_any(donor_path)
    target = load_any(target_path)

    # index donor leaves by (trailing name, shape) for fuzzy matching
    donor_by_key = {}
    for path, v in donor.items():
        donor_by_key.setdefault((path[-1], np.shape(v)), []).append((path, v))

    transferred = 0
    out = {}
    for path, v in target.items():
        exact = donor.get(path)
        if exact is not None and np.shape(exact) == np.shape(v):
            out[path] = np.asarray(exact)
            transferred += 1
            continue
        cands = donor_by_key.get((path[-1], np.shape(v)))
        if cands and len(cands) == 1:
            out[path] = np.asarray(cands[0][1])
            transferred += 1
        else:
            out[path] = np.asarray(v)

    tree = unflatten_params(out)
    from flax import serialization as ser

    with open(out_path, "wb") as f:
        f.write(ser.msgpack_serialize(tree))
    return transferred


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--donor", required=True)
    ap.add_argument("--target", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    n = transfer_params(args.donor, args.target, args.out)
    print(f"transferred {n} parameter tensors")
