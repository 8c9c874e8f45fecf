"""Dataset prep: mod-crop HR and generate bicubic LR/HR pairs.

Twin of ``codes/scripts/generate_mod_LR_bic.py`` (and its MATLAB twin):
for each image produce HR (mod-cropped), LR (MATLAB-bicubic 1/scale) and
optionally a bicubic re-upsampled version, under ``<savedir>/{HR,LR,Bic}/x<s>``.

Usage: python scripts/generate_mod_LR_bic.py --sourcedir D --savedir O --scale 4
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def generate_mod_lr_bic(sourcedir: str, savedir: str, up_scale: int = 4,
                        mod_scale: int | None = None,
                        save_bic: bool = True) -> int:
    import cv2

    from endosr.ops.color import modcrop
    from endosr.ops.resize import imresize_np

    mod_scale = mod_scale or up_scale
    hr_dir = os.path.join(savedir, "HR", f"x{mod_scale}")
    lr_dir = os.path.join(savedir, "LR", f"x{up_scale}")
    bic_dir = os.path.join(savedir, "Bic", f"x{up_scale}")
    for d in (hr_dir, lr_dir, bic_dir):
        os.makedirs(d, exist_ok=True)

    names = sorted(
        f for f in os.listdir(sourcedir)
        if f.lower().endswith((".png", ".jpg", ".jpeg", ".bmp", ".tif"))
    )
    for name in names:
        img = cv2.imread(os.path.join(sourcedir, name), cv2.IMREAD_UNCHANGED)
        img = img.astype(np.float32) / 255.0
        img_hr = modcrop(img, mod_scale)
        img_lr = imresize_np(img_hr, 1 / up_scale, True)
        cv2.imwrite(os.path.join(hr_dir, name),
                    (np.clip(img_hr, 0, 1) * 255).round().astype(np.uint8))
        cv2.imwrite(os.path.join(lr_dir, name),
                    (np.clip(img_lr, 0, 1) * 255).round().astype(np.uint8))
        if save_bic:
            img_bic = imresize_np(img_lr, up_scale, True)
            cv2.imwrite(os.path.join(bic_dir, name),
                        (np.clip(img_bic, 0, 1) * 255).round().astype(np.uint8))
    return len(names)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sourcedir", required=True)
    ap.add_argument("--savedir", required=True)
    ap.add_argument("--scale", type=int, default=4)
    ap.add_argument("--mod_scale", type=int, default=None)
    ap.add_argument("--no_bic", action="store_true")
    args = ap.parse_args()
    n = generate_mod_lr_bic(args.sourcedir, args.savedir, args.scale,
                            args.mod_scale, not args.no_bic)
    print(f"processed {n} images")
