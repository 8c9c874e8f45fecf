"""Pack an image folder into an LMDB archive (``codes/scripts/create_lmdb.py``).

Requires the optional ``lmdb`` package (not shipped in the TPU image —
plain-image mode is the primary data path; this exists for dataset parity).
Writes raw HWC uint8 blobs keyed by basename plus ``meta_info.pkl`` with
per-image resolutions, matching the reader in ``endosr/data/util.py``.
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys


def create_lmdb(img_folder: str, lmdb_save_path: str) -> int:
    try:
        import lmdb
    except ImportError:
        sys.exit("the 'lmdb' package is not installed in this image; "
                 "use plain-image (data_type: img) mode instead")
    import cv2

    names = sorted(
        f for f in os.listdir(img_folder)
        if f.lower().endswith((".png", ".jpg", ".jpeg", ".bmp"))
    )
    imgs = []
    total = 0
    for n in names:
        img = cv2.imread(os.path.join(img_folder, n), cv2.IMREAD_UNCHANGED)
        imgs.append((n, img))
        total += img.nbytes

    env = lmdb.open(lmdb_save_path, map_size=total * 2 + 10 ** 8)
    resolutions = []
    with env.begin(write=True) as txn:
        for n, img in imgs:
            key = os.path.splitext(n)[0].encode("ascii")
            txn.put(key, img.tobytes())
            h, w = img.shape[:2]
            c = 1 if img.ndim == 2 else img.shape[2]
            resolutions.append(f"{h}_{w}_{c}")
    meta = {"keys": [os.path.splitext(n)[0] for n, _ in imgs],
            "resolution": resolutions}
    with open(os.path.join(lmdb_save_path, "meta_info.pkl"), "wb") as f:
        pickle.dump(meta, f)
    return len(imgs)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True, help="path ending in .lmdb")
    args = ap.parse_args()
    n = create_lmdb(args.input, args.output)
    print(f"packed {n} images")
