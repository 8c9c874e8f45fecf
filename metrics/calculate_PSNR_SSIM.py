"""Offline folder scorer — twin of ``metrics/calculate_PSNR_SSIM.py``.

Scores a folder of SR results against GT with MATLAB-conformant PSNR/SSIM,
RGB and Y-channel, crop_border = scale (the reference protocol at
``metrics/calculate_PSNR_SSIM.py:12-66``). Prints per-image rows and the
averages, and writes a TSV beside the SR folder.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def score_folders(gt_dir: str, sr_dir: str, scale: int, suffix: str = "",
                  test_y: bool = True) -> dict:
    import cv2

    from endosr.metrics import calculate_psnr, calculate_ssim
    from endosr.ops.color import bgr2ycbcr

    names = sorted(
        f for f in os.listdir(gt_dir)
        if f.lower().endswith((".png", ".jpg", ".jpeg", ".bmp", ".tif"))
    )
    rows = []
    sums = np.zeros(4)
    for i, name in enumerate(names, 1):
        stem, ext = os.path.splitext(name)
        sr_path = os.path.join(sr_dir, stem + suffix + ".png")
        if not os.path.exists(sr_path):
            sr_path = os.path.join(sr_dir, stem + suffix + ext)
        if not os.path.exists(sr_path):
            print(f"skip {name}: no SR output")
            continue
        gt = cv2.imread(os.path.join(gt_dir, name)).astype(np.float64) / 255.0
        sr = cv2.imread(sr_path).astype(np.float64) / 255.0
        h = min(gt.shape[0], sr.shape[0])
        w = min(gt.shape[1], sr.shape[1])
        gt, sr = gt[:h, :w], sr[:h, :w]

        c = scale
        gt_c, sr_c = gt[c:-c, c:-c] * 255, sr[c:-c, c:-c] * 255
        psnr = calculate_psnr(sr_c, gt_c)
        ssim = calculate_ssim(sr_c, gt_c)
        if test_y:
            gt_y = bgr2ycbcr(gt.copy(), only_y=True) * 255
            sr_y = bgr2ycbcr(sr.copy(), only_y=True) * 255
            psnr_y = calculate_psnr(sr_y[c:-c, c:-c], gt_y[c:-c, c:-c])
            ssim_y = calculate_ssim(sr_y[c:-c, c:-c], gt_y[c:-c, c:-c])
        else:
            psnr_y = ssim_y = 0.0
        rows.append((stem, psnr, ssim, psnr_y, ssim_y))
        sums += [psnr, ssim, psnr_y, ssim_y]
        print(f"{i:3d} - {stem:25s} PSNR: {psnr:.6f} dB; SSIM: {ssim:.6f}; "
              f"PSNR_Y: {psnr_y:.6f} dB; SSIM_Y: {ssim_y:.6f}")

    n = max(1, len(rows))
    avg = sums / n
    print(f"Average: PSNR: {avg[0]:.6f} dB; SSIM: {avg[1]:.6f}; "
          f"PSNR_Y: {avg[2]:.6f} dB; SSIM_Y: {avg[3]:.6f}")

    tsv = os.path.join(sr_dir, "psnr_ssim.tsv")
    with open(tsv, "w") as f:
        f.write("Name\tPSNR\tSSIM\tPSNR_Y\tSSIM_Y\n")
        for r in rows:
            f.write("\t".join([r[0]] + [f"{x:.6f}" for x in r[1:]]) + "\n")
        f.write("Average\t" + "\t".join(f"{x:.6f}" for x in avg) + "\n")
    return {"psnr": avg[0], "ssim": avg[1], "psnr_y": avg[2], "ssim_y": avg[3],
            "n": len(rows)}


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--gt", required=True)
    ap.add_argument("--sr", required=True)
    ap.add_argument("--scale", type=int, required=True)
    ap.add_argument("--suffix", default="")
    args = ap.parse_args()
    score_folders(args.gt, args.sr, args.scale, args.suffix)
