"""Crop large images into overlapping sub-images for training.

Twin of ``codes/scripts/extract_subimgs_single.py`` (which used a process
pool; this host pipeline is IO-bound so a thread pool is used instead).
"""

from __future__ import annotations

import argparse
import os
from concurrent.futures import ThreadPoolExecutor


def extract_subimages(input_folder: str, save_folder: str, crop_sz: int = 480,
                      step: int = 240, thres_sz: int = 48,
                      compression_level: int = 3, n_threads: int = 4) -> int:
    import cv2
    import numpy as np

    os.makedirs(save_folder, exist_ok=True)
    names = sorted(
        f for f in os.listdir(input_folder)
        if f.lower().endswith((".png", ".jpg", ".jpeg", ".bmp"))
    )

    def worker(name):
        img = cv2.imread(os.path.join(input_folder, name), cv2.IMREAD_UNCHANGED)
        h, w = img.shape[:2]
        h_space = list(np.arange(0, h - crop_sz + 1, step))
        if h - (h_space[-1] + crop_sz) > thres_sz:
            h_space.append(h - crop_sz)
        w_space = list(np.arange(0, w - crop_sz + 1, step))
        if w - (w_space[-1] + crop_sz) > thres_sz:
            w_space.append(w - crop_sz)
        idx = 0
        stem, ext = os.path.splitext(name)
        for x in h_space:
            for y in w_space:
                idx += 1
                crop = img[x:x + crop_sz, y:y + crop_sz]
                cv2.imwrite(
                    os.path.join(save_folder, f"{stem}_s{idx:03d}.png"),
                    np.ascontiguousarray(crop),
                    [cv2.IMWRITE_PNG_COMPRESSION, compression_level],
                )
        return idx

    with ThreadPoolExecutor(max_workers=n_threads) as pool:
        counts = list(pool.map(worker, names))
    return sum(counts)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--crop_sz", type=int, default=480)
    ap.add_argument("--step", type=int, default=240)
    ap.add_argument("--thres_sz", type=int, default=48)
    args = ap.parse_args()
    n = extract_subimages(args.input, args.output, args.crop_sz, args.step,
                          args.thres_sz)
    print(f"wrote {n} sub-images")
