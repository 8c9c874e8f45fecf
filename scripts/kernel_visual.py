"""Visualize a blur kernel as a heat map (``codes/scripts/kernel_visual.py``)."""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def visualize_kernel(out_path: str, l: int = 21, sig: float = 2.6) -> None:
    import cv2

    from endosr.ops.degradation import isotropic_gaussian_kernel

    k = np.asarray(isotropic_gaussian_kernel(l, sig))
    norm = (k / k.max() * 255).astype(np.uint8)
    heat = cv2.applyColorMap(cv2.resize(norm, (256, 256),
                                        interpolation=cv2.INTER_NEAREST),
                             cv2.COLORMAP_JET)
    cv2.imwrite(out_path, heat)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="kernel.png")
    ap.add_argument("--l", type=int, default=21)
    ap.add_argument("--sig", type=float, default=2.6)
    args = ap.parse_args()
    visualize_kernel(args.out, args.l, args.sig)
    print(f"wrote {args.out}")
