"""Pack an image folder into an LMDB archive (``codes/scripts/create_lmdb.py``).

Writes raw HWC uint8 blobs keyed by basename plus ``meta_info.pkl`` with
per-image resolutions, matching the reader in ``endosr/data/util.py``.
Uses the real ``lmdb`` package when available, otherwise the pure-Python
writer in ``endosr.data.lmdb_io`` (this TPU image ships no lmdb wheel).
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def create_lmdb(img_folder: str, lmdb_save_path: str) -> int:
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

    resolutions = []
    items = []
    for n, img in imgs:
        key = os.path.splitext(n)[0].encode("ascii")
        items.append((key, img.tobytes()))
        h, w = img.shape[:2]
        c = 1 if img.ndim == 2 else img.shape[2]
        resolutions.append(f"{h}_{w}_{c}")

    try:
        import lmdb

        if not hasattr(lmdb, "open"):  # a test stub, not the real package
            raise ImportError("lmdb module has no open()")
        env = lmdb.open(lmdb_save_path, map_size=total * 2 + 10 ** 8)
        with env.begin(write=True) as txn:
            for key, blob in items:
                txn.put(key, blob)
        env.close()
    except ImportError:
        from endosr.data.lmdb_io import write_lmdb

        write_lmdb(lmdb_save_path, items)

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
