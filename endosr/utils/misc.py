"""Misc utilities: dirs, seeding, timestamps, logging setup.

Twins of the reference's ``codes/utils/util.py`` scaffolding
(mkdir_and_rename archive-on-collision :527-534, set_random_seed :537-541,
setup_logger :544-558, tensor/image converts :566-605).
"""

from __future__ import annotations

import logging
import os
import random
import sys
import time
from datetime import datetime

import numpy as np

__all__ = [
    "get_timestamp",
    "mkdir",
    "mkdirs",
    "mkdir_and_rename",
    "set_random_seed",
    "setup_logger",
    "tensor2img",
    "img2tensor",
    "save_img",
    "Timer",
]


def get_timestamp() -> str:
    return datetime.now().strftime("%y%m%d-%H%M%S")


def mkdir(path: str) -> None:
    os.makedirs(path, exist_ok=True)


def mkdirs(paths) -> None:
    if isinstance(paths, str):
        mkdir(paths)
    else:
        for path in paths:
            mkdir(path)


def mkdir_and_rename(path: str) -> None:
    """Archive an existing dir as ``<path>_archived_<ts>`` then create fresh."""
    if os.path.exists(path):
        new_name = path + "_archived_" + get_timestamp()
        logging.getLogger("base").info("Path already exists. Rename it to %s", new_name)
        os.rename(path, new_name)
    os.makedirs(path, exist_ok=True)


def set_random_seed(seed: int) -> None:
    random.seed(seed)
    np.random.seed(seed)


def setup_logger(logger_name: str, root: str, phase: str, level=logging.INFO,
                 screen: bool = False, tofile: bool = False) -> None:
    lg = logging.getLogger(logger_name)
    formatter = logging.Formatter(
        "%(asctime)s.%(msecs)03d - %(levelname)s: %(message)s",
        datefmt="%y-%m-%d %H:%M:%S",
    )
    lg.setLevel(level)
    if tofile:
        log_file = os.path.join(root, phase + f"_{get_timestamp()}.log")
        fh = logging.FileHandler(log_file, mode="w")
        fh.setFormatter(formatter)
        lg.addHandler(fh)
    if screen:
        sh = logging.StreamHandler(sys.stdout)
        sh.setFormatter(formatter)
        lg.addHandler(sh)


def tensor2img(arr, out_type=np.uint8, min_max=(0, 1)) -> np.ndarray:
    """NHWC (or HWC/HW) array in [0,1] RGB → HWC BGR uint8 image.

    Capability twin of ``utils/util.py:566-590`` for the NHWC world:
    squeezes a leading batch-1 axis, clamps, converts RGB→BGR for cv2 IO.
    """
    img = np.asarray(arr, dtype=np.float32)
    if img.ndim == 4:
        img = img[0]
    img = np.clip(img, min_max[0], min_max[1])
    img = (img - min_max[0]) / (min_max[1] - min_max[0])
    if img.ndim == 3 and img.shape[2] == 3:
        img = img[:, :, ::-1]  # RGB → BGR
    elif img.ndim == 3 and img.shape[2] == 1:
        img = img[..., 0]
    if out_type == np.uint8:
        img = (img * 255.0).round()
    return img.astype(out_type)


def img2tensor(img: np.ndarray) -> np.ndarray:
    """HWC BGR uint8 [0,255] → HWC RGB float32 [0,1] (NHWC world)."""
    img = img.astype(np.float32) / 255.0
    return np.ascontiguousarray(img[:, :, ::-1])


def save_img(img: np.ndarray, img_path: str) -> None:
    import cv2

    cv2.imwrite(img_path, img)


class Timer:
    """Context-managed wall-clock timer for profiling hooks."""

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.start


class ProgressBar:
    """Console progress bar (twin of ``utils/util.py:700-747``)."""

    def __init__(self, task_num: int = 0, bar_width: int = 50,
                 start: bool = True):
        self.task_num = task_num
        self.bar_width = bar_width
        self.completed = 0
        if start:
            self.start()

    def start(self):
        if self.task_num > 0:
            sys.stdout.write(
                f"[{' ' * self.bar_width}] 0/{self.task_num}, elapsed: 0s, ETA:\n"
            )
        else:
            sys.stdout.write("completed: 0, elapsed: 0s")
        sys.stdout.flush()
        self.start_time = time.time()

    def update(self, msg: str = "In progress..."):
        self.completed += 1
        elapsed = max(time.time() - self.start_time, 1e-9)
        fps = self.completed / elapsed
        if self.task_num > 0:
            percentage = self.completed / float(self.task_num)
            eta = int(elapsed * (1 - percentage) / max(percentage, 1e-9) + 0.5)
            mark_width = int(self.bar_width * percentage)
            bar = ">" * mark_width + "-" * (self.bar_width - mark_width)
            sys.stdout.write(
                f"\033[J[{bar}] {self.completed}/{self.task_num}, "
                f"{fps:.1f} task/s, elapsed: {int(elapsed + 0.5)}s, "
                f"ETA: {eta:5d}s\n{msg}\n\033[2A"
            )
        else:
            sys.stdout.write(
                f"completed: {self.completed}, elapsed: {int(elapsed + 0.5)}s,"
                f" {fps:.1f} tasks/s"
            )
        sys.stdout.flush()
