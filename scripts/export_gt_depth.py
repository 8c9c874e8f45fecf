"""Export ground-truth depth maps for evaluation.

Capability twin of ``codes/depth_estimation/export_gt_depth.py`` for the
endoscopy datasets: collect per-frame GT depth PNGs (uint16, as produced by
e.g. the Hamlyn rig) into a single ``gt_depths.npz`` keyed by frame id that
``endosr.depth.evaluate`` consumes. KITTI velodyne projection is out of
scope for the endoscopy build.
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np


def export_gt_depths(depth_dir: str, out_path: str,
                     depth_scale: float = 1000.0) -> int:
    import cv2

    paths = sorted(glob.glob(os.path.join(depth_dir, "*.png")))
    gt = {}
    for p in paths:
        d = cv2.imread(p, cv2.IMREAD_UNCHANGED)
        if d is None:
            continue
        key = os.path.splitext(os.path.basename(p))[0]
        gt[key] = d.astype(np.float32) / depth_scale
    np.savez_compressed(out_path, **gt)
    return len(gt)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--depth_dir", required=True)
    ap.add_argument("--out", default="gt_depths.npz")
    ap.add_argument("--depth_scale", type=float, default=1000.0)
    args = ap.parse_args()
    n = export_gt_depths(args.depth_dir, args.out, args.depth_scale)
    print(f"exported {n} GT depth maps → {args.out}")
