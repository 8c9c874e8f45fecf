"""Iterative back-projection refinement of SR outputs.

Python/JAX port of the capability of ``codes/scripts/back_projection/
{backprojection,main_bp,main_reverse_filter}.m``: repeatedly push the SR
estimate's downsampled residual back up through bicubic resampling,

    SR ← SR + λ · upscale(LR − downscale(SR)).

Runs as two MXU matmuls per direction via the MATLAB-conformant resampler.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def back_projection(sr: np.ndarray, lr: np.ndarray, scale: int,
                    iters: int = 20, lam: float = 1.0) -> np.ndarray:
    """HWC float [0,1] arrays; returns the refined SR."""
    from endosr.ops.resize import imresize_np

    sr = sr.astype(np.float32).copy()
    for _ in range(iters):
        down = imresize_np(sr, 1 / scale, True)
        residual = lr - down
        sr = sr + lam * imresize_np(residual, scale, True)
    return np.clip(sr, 0.0, 1.0)


def run_folder(sr_dir: str, lr_dir: str, out_dir: str, scale: int,
               iters: int = 20) -> int:
    import cv2

    os.makedirs(out_dir, exist_ok=True)
    names = sorted(
        f for f in os.listdir(sr_dir)
        if f.lower().endswith((".png", ".jpg", ".jpeg"))
    )
    for n in names:
        sr = cv2.imread(os.path.join(sr_dir, n)).astype(np.float32) / 255.0
        lr = cv2.imread(os.path.join(lr_dir, n)).astype(np.float32) / 255.0
        out = back_projection(sr, lr, scale, iters)
        cv2.imwrite(os.path.join(out_dir, n),
                    (out * 255).round().astype(np.uint8))
    return len(names)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sr_dir", required=True)
    ap.add_argument("--lr_dir", required=True)
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--scale", type=int, required=True)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    n = run_folder(args.sr_dir, args.lr_dir, args.out_dir, args.scale,
                   args.iters)
    print(f"refined {n} images")
