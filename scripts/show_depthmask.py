"""Visualize the K binary depth-range masks for one sample.

Twin of ``codes/show_depthMask.py:5-35``: loads a ``*_disp.npy`` map, bins it
with the flagship's mask logic, and writes one PNG per depth bin.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def show_depth_mask(disp_npy: str, out_dir: str, num_masks: int = 10,
                    fixed_range: bool = False) -> list[str]:
    import cv2

    from endosr.ops.masks import depth_masks_np

    depth = np.load(disp_npy)
    depth = np.squeeze(depth)
    masks = depth_masks_np(depth, fixed_range, num_masks)  # HWK
    os.makedirs(out_dir, exist_ok=True)
    stem = os.path.splitext(os.path.basename(disp_npy))[0]
    written = []
    for k in range(num_masks):
        p = os.path.join(out_dir, f"{stem}_mask{k}.png")
        cv2.imwrite(p, (masks[..., k] * 255).astype(np.uint8))
        written.append(p)
    return written


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--disp", required=True, help="path to *_disp.npy")
    ap.add_argument("--out", required=True)
    ap.add_argument("--num", type=int, default=10)
    ap.add_argument("--fixed_range", action="store_true")
    args = ap.parse_args()
    paths = show_depth_mask(args.disp, args.out, args.num, args.fixed_range)
    print("\n".join(paths))
