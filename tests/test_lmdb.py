"""Pure-Python LMDB archive round-trips.

The reference reads training images from LMDB archives autodetected by
directory suffix (``codes/data/util.py:21-68``, ``codes/options/options.py:
31-45``). These tests cover the byte-level writer/reader pair and the
flagship dataset running in ``data_type: lmdb`` mode end-to-end.
"""

import os
import pickle

import numpy as np
import pytest

from endosr.data.lmdb_io import Reader, write_lmdb

RNG = np.random.default_rng(11)


def test_write_read_roundtrip_small(tmp_path):
    items = [(f"k{i:03d}".encode(), bytes(RNG.integers(0, 256, 50, dtype=np.uint8)))
             for i in range(5)]
    p = str(tmp_path / "small.lmdb")
    assert write_lmdb(p, items) == 5
    r = Reader(p)
    assert r.entries == 5
    with r.begin(write=False) as txn:
        for k, v in items:
            assert txn.get(k) == v
        assert txn.get(b"missing") is None
    assert r.keys() == sorted(k for k, _ in items)
    r.close()


def test_write_read_roundtrip_many_and_large(tmp_path):
    # enough keys for multiple leaf pages + a branch level; values spanning
    # several overflow pages
    items = []
    for i in range(700):
        size = 37 if i % 3 else 9000  # mix small and multi-page blobs
        items.append((f"key-{i:05d}".encode(),
                      bytes(RNG.integers(0, 256, size, dtype=np.uint8))))
    p = str(tmp_path / "big.lmdb")
    write_lmdb(p, items)
    r = Reader(p)
    assert r.entries == 700
    with r.begin() as txn:
        for k, v in items[:: 17]:
            assert txn.get(k) == v
        assert txn.get(b"zzz") is None
    assert len(r.keys()) == 700
    r.close()


@pytest.fixture
def lmdb_dataset_dirs(tmp_path):
    """Synthetic GT/LR LMDB archives + depth npys for the flagship dataset."""
    import importlib.util

    import cv2

    # load by file path: the reference repo also has a `scripts` package on
    # sys.path once the torch-oracle fixtures have run
    spec = importlib.util.spec_from_file_location(
        "endosr_create_lmdb",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "create_lmdb.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    create_lmdb = mod.create_lmdb

    gt_dir, lr_dir, depth_dir = (tmp_path / d for d in ("gt", "lr", "depth"))
    for d in (gt_dir, lr_dir, depth_dir):
        d.mkdir()
    n, scale, lr_size = 3, 4, 12
    for i in range(n):
        name = f"im{i}.png"
        gt = RNG.integers(0, 256, (lr_size * scale, lr_size * scale, 3),
                          dtype=np.uint8)
        lr = RNG.integers(0, 256, (lr_size, lr_size, 3), dtype=np.uint8)
        cv2.imwrite(str(gt_dir / name), gt)
        cv2.imwrite(str(lr_dir / name), lr)
        disp = RNG.random((1, 1, lr_size, lr_size)).astype(np.float32)
        np.save(depth_dir / f"im{i}_disp.npy", disp)

    gt_lmdb = str(tmp_path / "gt.lmdb")
    lr_lmdb = str(tmp_path / "lr.lmdb")
    create_lmdb(str(gt_dir), gt_lmdb)
    create_lmdb(str(lr_dir), lr_lmdb)
    meta = pickle.load(open(os.path.join(gt_lmdb, "meta_info.pkl"), "rb"))
    assert meta["keys"] == [f"im{i}" for i in range(n)]
    return dict(gt_dir=str(gt_dir), lr_dir=str(lr_dir), gt_lmdb=gt_lmdb,
                lr_lmdb=lr_lmdb, depth=str(depth_dir), scale=scale,
                lr_size=lr_size)


def test_flagship_dataset_lmdb_matches_img(lmdb_dataset_dirs):
    from endosr.data.datasets import LQGTKerDepthDataset

    d = lmdb_dataset_dirs
    common = dict(phase="val", scale=d["scale"], depthMaskNum=10,
                  dataroot_depthMap=d["depth"])
    ds_img = LQGTKerDepthDataset(dict(
        common, data_type="img", dataroot_GT=d["gt_dir"],
        dataroot_LQ=d["lr_dir"]))
    ds_lmdb = LQGTKerDepthDataset(dict(
        common, data_type="lmdb", dataroot_GT=d["gt_lmdb"],
        dataroot_LQ=d["lr_lmdb"]))
    assert len(ds_img) == len(ds_lmdb) == 3
    for i in range(3):
        a, b = ds_img[i], ds_lmdb[i]
        np.testing.assert_array_equal(a["GT"], b["GT"])
        np.testing.assert_array_equal(a["LQ"], b["LQ"])
        np.testing.assert_array_equal(a["DepthMaskList"], b["DepthMaskList"])
