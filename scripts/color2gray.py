"""Batch color→gray conversion (``codes/scripts/color2gray.py``)."""

from __future__ import annotations

import argparse
import os


def color2gray(input_folder: str, save_folder: str) -> int:
    import cv2

    os.makedirs(save_folder, exist_ok=True)
    names = sorted(
        f for f in os.listdir(input_folder)
        if f.lower().endswith((".png", ".jpg", ".jpeg", ".bmp"))
    )
    for n in names:
        img = cv2.imread(os.path.join(input_folder, n), cv2.IMREAD_COLOR)
        gray = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
        cv2.imwrite(os.path.join(save_folder, n), gray)
    return len(names)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    args = ap.parse_args()
    print(f"converted {color2gray(args.input, args.output)} images")
