"""Depth-trainer CLI — twin of ``codes/depth_estimation/train.py``.

    python -m endosr.depth.train --data_path <frames> --split endovis ...
"""

from __future__ import annotations

import os

from endosr.depth.options import MonodepthOptions


def build_dataset(opts, is_train=True):
    from endosr.depth.datasets import (
        EndovisDataset,
        SequenceFolderDataset,
        readlines,
    )

    split_file = os.path.join(
        os.path.dirname(__file__), "splits", opts.split,
        "train_files.txt" if is_train else "val_files.txt",
    )
    if os.path.exists(split_file):
        filenames = readlines(split_file)
    else:
        # fall back: every usable frame index in the folder
        names = sorted(
            f for f in os.listdir(opts.data_path)
            if f.lower().endswith((".jpg", ".png"))
        )
        idxs = sorted(int(os.path.splitext(n)[0]) for n in names)
        lo, hi = min(opts.frame_ids), max(opts.frame_ids)
        filenames = [str(i) for i in idxs if i + lo >= idxs[0] and i + hi <= idxs[-1]]

    cls = EndovisDataset if opts.dataset in ("endovis", "colondepth") else None
    if cls is None and opts.dataset.startswith("kitti"):
        from endosr.depth.kitti import (
            KITTIDepthDataset,
            KITTIOdomDataset,
            KITTIRAWDataset,
        )

        cls = {"kitti": KITTIRAWDataset, "kitti_odom": KITTIOdomDataset,
               "kitti_depth": KITTIDepthDataset}[opts.dataset]
    elif cls is None:
        cls = SequenceFolderDataset
    if not os.path.exists(split_file) and not opts.dataset.startswith("kitti"):
        cls = SequenceFolderDataset
    ext = ".png" if opts.png else ".jpg"
    return cls(opts.data_path, filenames, opts.height, opts.width,
               opts.frame_ids, num_scales=len(opts.scales),
               is_train=is_train, img_ext=ext)


def main():
    opts = MonodepthOptions().parse()
    from endosr.depth.trainer import Trainer

    dataset = build_dataset(opts, is_train=True)
    trainer = Trainer(opts, dataset=dataset)
    trainer.train()


if __name__ == "__main__":
    main()
