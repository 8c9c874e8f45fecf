"""Host input-pipeline benchmark: images/sec through the flagship dataset.

Builds a Kvasir-×8-shaped synthetic dataset on disk (1024² GT PNG, 128² LR
PNG, monodepth2-convention ``*_disp.npy``), then measures the
``ShardedLoader`` end-to-end (decode → depth-mask binning → paired aug →
stacking) at several worker counts. The verdict line compares against the
measured device step time: the pipeline is healthy when images/sec exceeds
the training step's consumption rate (bs8 / 0.127 s ≈ 63 imgs/s for the
bf16 step, `tools/bench_train.py`).

Usage: python tools/bench_input.py [--n 48] [--batches 12] [--workers 0 2 4]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

TRAIN_STEP_S = 0.127  # measured bf16-compute step at bs8 (BASELINE.md)


def build_dataset(root: str, n: int, lr: int = 128, scale: int = 8) -> None:
    import cv2

    gt = lr * scale
    rng = np.random.default_rng(0)
    for sub in ("HR", "LR", "depth"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    for i in range(n):
        hr_img = (rng.random((gt, gt, 3)) * 255).astype(np.uint8)
        lr_img = cv2.resize(hr_img, (lr, lr), interpolation=cv2.INTER_CUBIC)
        cv2.imwrite(os.path.join(root, "HR", f"img{i:03d}.png"), hr_img)
        cv2.imwrite(os.path.join(root, "LR", f"img{i:03d}.png"), lr_img)
        np.save(os.path.join(root, "depth", f"img{i:03d}_disp.npy"),
                rng.random((1, 1, lr, lr)).astype(np.float32))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=48)
    ap.add_argument("--batches", type=int, default=12)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--workers", type=int, nargs="*", default=[0, 2, 4])
    ap.add_argument("--lmdb", action="store_true", default=True,
                    help="also bench the raw-LMDB decode-free path")
    args = ap.parse_args()

    from endosr.data import ShardedLoader, create_dataset

    with tempfile.TemporaryDirectory() as root:
        print(f"building synthetic Kvasir x8 dataset ({args.n} imgs) ...")
        build_dataset(root, args.n)
        base_opt = {
            "name": "bench", "mode": "LQGTker_Depth", "phase": "train",
            "dataroot_GT": os.path.join(root, "HR"),
            "dataroot_LQ": os.path.join(root, "LR"),
            "dataroot_depthMap": os.path.join(root, "depth"),
            "scale": 8, "GT_size": 1024, "LR_size": 128,
            "use_flip": True, "use_rot": True, "color": "RGB",
            "depthMaskNum": 10, "depthFixedRange": False,
            "data_type": "img", "use_shuffle": True,
        }

        variants = {}
        for nw in args.workers:
            variants[f"png workers={nw}"] = (dict(base_opt), nw)
        variants["png + cache_data"] = (dict(base_opt, cache_data=True), 0)
        variants["cache + u8_pipeline"] = (dict(base_opt, cache_data=True,
                                                u8_pipeline=True), 0)
        if args.lmdb:
            sys.path.insert(0, os.path.join(
                os.path.dirname(__file__), "..", "scripts"))
            from create_lmdb import create_lmdb

            for sub in ("HR", "LR"):
                create_lmdb(os.path.join(root, sub),
                            os.path.join(root, sub + ".lmdb"))
            variants["lmdb (raw, decode-free)"] = (dict(
                base_opt,
                dataroot_GT=os.path.join(root, "HR.lmdb"),
                dataroot_LQ=os.path.join(root, "LR.lmdb"),
                data_type="lmdb"), 0)

        results = {}
        for tag, (dataset_opt, nw) in variants.items():
            ds = create_dataset(dataset_opt)
            loader = ShardedLoader(
                ds, batch_size=args.batch_size, shuffle=True, seed=0,
                ratio=50, drop_last=True, num_workers=nw,
            )
            it = iter(loader)
            if "cache" in tag:
                # fill the RAM cache deterministically (shuffled warm batches
                # would leave holes that bill decode time to the steady state)
                for i in range(len(ds)):
                    ds[i]
            next(it)  # warm: worker spawn / page cache
            t0 = time.perf_counter()
            done = 0
            for _ in range(args.batches):
                b = next(it)
                assert b["LQ"].shape[0] == args.batch_size
                done += args.batch_size
            dt = time.perf_counter() - t0
            ips = done / dt
            results[tag] = ips
            bound = "NOT input-bound" if ips * TRAIN_STEP_S >= args.batch_size \
                else "INPUT-BOUND"
            print(f"{tag:26s}: {ips:7.1f} imgs/sec "
                  f"({dt / args.batches * 1e3:6.1f} ms/batch)  -> {bound} "
                  f"vs {args.batch_size / TRAIN_STEP_S:.0f} imgs/s device rate")

        best = max(results, key=results.get)
        print(f"best: {best} at {results[best]:.1f} imgs/sec; device training "
              f"consumes {args.batch_size / TRAIN_STEP_S:.0f} imgs/sec "
              f"(bf16 step)")


if __name__ == "__main__":
    main()
