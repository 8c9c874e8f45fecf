"""Convert ``*_disp.npy`` disparity maps to uint16 PNGs.

Twin of ``codes/depth_estimation/read_depth_map.py:1-17``.
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np


def disp_npy_to_png(npy_path: str, out_path: str | None = None) -> str:
    import cv2

    disp = np.squeeze(np.load(npy_path))
    norm = disp / max(float(disp.max()), 1e-8)
    png = (norm * 65535).astype(np.uint16)
    out_path = out_path or npy_path.replace("_disp.npy", "_depth.png")
    cv2.imwrite(out_path, png)
    return out_path


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="file or folder of *_disp.npy")
    args = ap.parse_args()
    paths = ([args.input] if os.path.isfile(args.input)
             else sorted(glob.glob(os.path.join(args.input, "*_disp.npy"))))
    for p in paths:
        print(disp_npy_to_png(p))
