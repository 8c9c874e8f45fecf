"""KITTI loaders: velodyne projection + raw dataset on synthetic data.

Twins of ``codes/depth_estimation/kitti_utils.py`` and
``datasets/kitti_dataset.py`` exercised without real KITTI data.
"""

import os

import numpy as np
import pytest

from endosr.depth.kitti import (
    KITTIRAWDataset,
    generate_depth_map,
    read_calib_file,
)

RNG = np.random.default_rng(21)
W, H = 32, 16


def _write_calib(d):
    with open(os.path.join(d, "calib_cam_to_cam.txt"), "w") as f:
        f.write(f"S_rect_02: {W}.0 {H}.0\n")
        f.write("R_rect_00: 1 0 0 0 1 0 0 0 1\n")
        # fx=fy=10, principal point at image center
        f.write(f"P_rect_02: 10 0 {W / 2} 0 0 10 {H / 2} 0 0 0 1 0\n")
        f.write("some_text_key: not a number\n")
    with open(os.path.join(d, "calib_velo_to_cam.txt"), "w") as f:
        # velodyne (fwd,left,up) -> camera (right,down,fwd)
        f.write("R: 0 -1 0 0 0 -1 1 0 0\n")
        f.write("T: 0 0 0\n")


def _write_velo(path, pts_velo):
    arr = np.concatenate(
        [pts_velo, np.ones((len(pts_velo), 1), np.float32)], axis=1)
    arr.astype(np.float32).tofile(path)


def test_read_calib_file(tmp_path):
    _write_calib(tmp_path)
    c = read_calib_file(os.path.join(tmp_path, "calib_cam_to_cam.txt"))
    assert c["S_rect_02"].tolist() == [float(W), float(H)]
    assert c["some_text_key"] == "not a number"


def test_generate_depth_map_projection_and_dedup(tmp_path):
    _write_calib(tmp_path)
    # two points along the optical axis at depths 5 and 3 (same pixel —
    # closest wins), one off-axis point, one behind the camera (dropped)
    pts = np.array([
        [5.0, 0.0, 0.0],
        [3.0, 0.0, 0.0],
        [4.0, -0.8, 0.0],   # right of center: u = 10*0.8/4 + W/2
        [-1.0, 0.0, 0.0],
    ], np.float32)
    velo = os.path.join(tmp_path, "v.bin")
    _write_velo(velo, pts)
    depth = generate_depth_map(str(tmp_path), velo, cam=2)
    assert depth.shape == (H, W)
    # center pixel (matlab -1 rounding): (round(W/2)-1, round(H/2)-1)
    assert depth[H // 2 - 1, W // 2 - 1] == pytest.approx(3.0)
    assert depth[H // 2 - 1, W // 2 + 1] == pytest.approx(4.0)
    assert (depth > 0).sum() == 2


def test_kitti_raw_dataset_stereo(tmp_path):
    import cv2

    folder = "2011_01_01/drive_0001"
    for cam in (2, 3):
        d = tmp_path / folder / f"image_0{cam}" / "data"
        os.makedirs(d)
        for i in range(4):
            img = RNG.integers(0, 255, (H * 4, W * 4, 3), dtype=np.uint8)
            cv2.imwrite(str(d / f"{i:010d}.png"), img)
    _write_calib(tmp_path / "2011_01_01")
    vd = tmp_path / folder / "velodyne_points" / "data"
    os.makedirs(vd)
    for i in range(4):
        _write_velo(str(vd / f"{i:010d}.bin"),
                    np.array([[5.0, 0, 0]], np.float32))

    ds = KITTIRAWDataset(
        str(tmp_path), [f"{folder} 1 l", f"{folder} 2 r"], 32, 64,
        [0, -1, 1, "s"], num_scales=2, is_train=True, img_ext=".png",
    )
    item = ds[0]
    assert item[("color", 0, 0)].shape == (32, 64, 3)
    assert item[("color", "s", 0)].shape == (32, 64, 3)
    assert item["stereo_T"].shape == (4, 4)
    assert "depth_gt" in item
    assert item[("K", 0)][0, 0] == pytest.approx(0.58 * 64)
