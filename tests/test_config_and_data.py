"""Config system and loader tests."""

import os

import numpy as np
import pytest
import yaml

from endosr.config import options as option
from endosr.data import ShardedLoader


def test_parse_train_config():
    p = os.path.join(os.path.dirname(__file__), "..",
                     "options/train/train_depthNet_SEAN_depthMask_x8.yml")
    opt = option.parse(p, is_train=True, root="/tmp/endosr_test")
    assert opt["scale"] == 8
    assert opt["datasets"]["train"]["phase"] == "train"
    assert opt["datasets"]["train"]["scale"] == 8
    assert opt["datasets"]["train"]["data_type"] == "img"
    assert opt["network_G"]["scale"] == 8
    assert opt["path"]["models"].endswith("models")
    # debug-mode overrides
    opt2 = option.parse(p, is_train=True, root="/tmp/endosr_test")
    opt2["name"] = "debug_x8"
    # (debug rewiring happens inside parse; simulate by re-parsing a debug yml)


def test_debug_mode_overrides(tmp_path):
    p = os.path.join(os.path.dirname(__file__), "..",
                     "options/train/train_depthNet_SEAN_depthMask_x8.yml")
    with open(p) as f:
        cfg = yaml.safe_load(f)
    cfg["name"] = "debug_run"
    q = tmp_path / "debug.yml"
    q.write_text(yaml.dump(cfg))
    opt = option.parse(str(q), is_train=True, root=str(tmp_path))
    assert opt["train"]["val_freq"] == 8
    assert opt["logger"]["print_freq"] == 1
    assert opt["logger"]["save_checkpoint_freq"] == 8


def test_nonedict():
    d = option.dict_to_nonedict({"a": {"b": 1}})
    assert d["a"]["b"] == 1
    assert d["missing"] is None
    assert d["a"]["missing"] is None


def test_check_resume():
    opt = {"path": {"resume_state": "/x/training_state/500.state",
                    "models": "/x/models"}, "model": "sftmd_depthCond"}
    option.check_resume(opt, 500)
    assert opt["path"]["pretrain_model_G"] == "/x/models/500_G.ckpt"


class _FakeDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"x": np.full((2, 2), i, np.float32), "path": f"p{i}"}


def test_sharded_loader_epochs_and_shards():
    ds = _FakeDataset(10)
    loader = ShardedLoader(ds, batch_size=4, shuffle=True, seed=0, ratio=2,
                           drop_last=True, prefetch=0)
    batches = list(loader)
    assert len(batches) == len(loader) == 5  # 10*2 // 4
    assert batches[0]["x"].shape == (4, 2, 2)
    assert isinstance(batches[0]["path"], list)

    # epoch-seeded determinism
    loader.set_epoch(3)
    a = [b["x"].sum() for b in loader]
    loader.set_epoch(3)
    b = [b["x"].sum() for b in loader]
    assert a == b
    loader.set_epoch(4)
    c = [b["x"].sum() for b in loader]
    assert a != c

    # sharding partitions the index space
    shard0 = ShardedLoader(ds, 2, seed=0, ratio=1, num_shards=2, shard_index=0,
                           prefetch=0)
    shard1 = ShardedLoader(ds, 2, seed=0, ratio=1, num_shards=2, shard_index=1,
                           prefetch=0)
    shard0.set_epoch(0)
    shard1.set_epoch(0)
    n0 = sum(b["x"].shape[0] for b in shard0)
    n1 = sum(b["x"].shape[0] for b in shard1)
    assert n0 == n1 == 4  # 10/2=5 → drop_last at bs2 → 4


def test_loader_propagates_worker_errors():
    class Bad(_FakeDataset):
        def __getitem__(self, i):
            raise ValueError("boom")

    loader = ShardedLoader(Bad(4), 2, prefetch=2)
    with pytest.raises(ValueError, match="boom"):
        list(loader)


def test_sharded_loader_multiprocess_workers():
    """Fork-based decode workers deliver the same batches in the same order
    as the single-thread path (replaces DataLoader num_workers,
    ``codes/data/__init__.py:16-22``)."""
    from endosr.data import ShardedLoader

    class DS:
        def __len__(self):
            return 24

        def __getitem__(self, i):
            import numpy as np

            return {"x": np.full((2, 2), i, np.float32), "p": f"item{i}"}

    ds = DS()
    ds.rng = None  # reseeded per worker
    single = list(ShardedLoader(ds, 4, seed=3, prefetch=0))
    multi = list(ShardedLoader(ds, 4, seed=3, num_workers=3))
    assert len(single) == len(multi) == 6
    import numpy as np

    for a, b in zip(single, multi):
        np.testing.assert_array_equal(a["x"], b["x"])
        assert a["p"] == b["p"]


def test_loader_multiprocess_propagates_errors():
    from endosr.data import ShardedLoader

    class Bad:
        rng = None

        def __len__(self):
            return 8

        def __getitem__(self, i):
            if i == 5:
                raise RuntimeError("boom5")
            import numpy as np

            return {"x": np.zeros(1, np.float32)}

    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="boom5"):
        list(ShardedLoader(Bad(), 2, shuffle=False, num_workers=2))


def test_prefetch_to_device():
    import jax
    import numpy as np

    from endosr.data import ShardedLoader, prefetch_to_device
    from endosr.parallel.mesh import make_mesh

    class DS:
        rng = None

        def __len__(self):
            return 16

        def __getitem__(self, i):
            return {"x": np.full((4,), i, np.float32)}

    mesh = make_mesh(jax.devices()[:8])
    got = list(prefetch_to_device(
        ShardedLoader(DS(), 8, shuffle=False, prefetch=0), mesh))
    assert len(got) == 2
    assert isinstance(got[0]["x"], jax.Array)
    np.testing.assert_array_equal(
        np.asarray(got[0]["x"]), np.arange(8, dtype=np.float32)[:, None].repeat(4, 1).reshape(8, 4) * 0 + np.arange(8)[:, None]
    )


def test_resolve_resume_state_auto(tmp_path):
    from endosr.config.options import resolve_resume_state

    state_dir = tmp_path / "training_state"
    opt = {"path": {"resume_state": "auto",
                    "experiments_root": str(tmp_path),
                    "training_state": str(state_dir)}}
    # fresh run: no dir yet -> None
    assert resolve_resume_state(opt) is None
    assert opt["path"]["resume_state"] is None

    state_dir.mkdir()
    for it in (500, 1500, 1000):
        (state_dir / f"{it}.state").write_bytes(b"x")
    (state_dir / "junk.state.tmp").write_bytes(b"x")
    opt["path"]["resume_state"] = "auto"
    assert resolve_resume_state(opt).endswith("1500.state")
    assert opt["path"]["resume_state"].endswith("1500.state")

    # explicit paths pass through untouched
    opt["path"]["resume_state"] = str(state_dir / "500.state")
    assert resolve_resume_state(opt).endswith("500.state")


def test_cache_data_fast_path_bit_identical(tmp_path):
    """`cache_data: true` train samples must be BIT-identical to the
    decode-every-time path: the fast path caches RGB uint8 + prebinned
    masks and applies color reorder / the /255 normalization in an order
    that commutes exactly with the paired augmentation."""
    import cv2

    from endosr.data import create_dataset

    rng = np.random.default_rng(11)
    for sub in ("HR", "LR", "depth"):
        (tmp_path / sub).mkdir()
    for i in range(3):
        hr = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
        lr = cv2.resize(hr, (8, 8), interpolation=cv2.INTER_CUBIC)
        cv2.imwrite(str(tmp_path / "HR" / f"im{i}.png"), hr)
        cv2.imwrite(str(tmp_path / "LR" / f"im{i}.png"), lr)
        np.save(tmp_path / "depth" / f"im{i}_disp.npy",
                rng.random((1, 1, 8, 8)).astype(np.float32))
    base = {
        "name": "t", "mode": "LQGTker_Depth", "phase": "train",
        "dataroot_GT": str(tmp_path / "HR"), "dataroot_LQ": str(tmp_path / "LR"),
        "dataroot_depthMap": str(tmp_path / "depth"),
        "scale": 4, "GT_size": 32, "LR_size": 8,
        "use_flip": True, "use_rot": True, "color": "RGB",
        "depthMaskNum": 10, "depthFixedRange": True, "data_type": "img",
    }
    slow = create_dataset(dict(base))
    fast = create_dataset(dict(base, cache_data=True))
    for epoch in range(2):  # epoch 2 hits the warm cache
        for i in range(3):
            slow.rng.seed(100 * epoch + i)
            fast.rng.seed(100 * epoch + i)
            a, b = slow[i], fast[i]
            for k in ("LQ", "GT", "Depth", "DepthMaskList"):
                np.testing.assert_array_equal(a[k], b[k], err_msg=k)
                assert b[k].dtype == np.float32
                assert b[k].flags["C_CONTIGUOUS"]


def test_endoscene_cache_fast_path_bit_identical(tmp_path):
    """The EndoScene train fast path (RGB-u8 + prebinned masks + u8 one-hot
    seg) must be bit-identical to the decode-every-time path."""
    import cv2

    from endosr.data import create_dataset

    rng = np.random.default_rng(12)
    for sub in ("HR", "LR/x2", "depth", "seg"):
        (tmp_path / sub).mkdir(parents=True)
    for i in range(2):
        hr = (rng.random((24, 28, 3)) * 255).astype(np.uint8)
        lr = cv2.resize(hr, (14, 12), interpolation=cv2.INTER_CUBIC)
        cv2.imwrite(str(tmp_path / "HR" / f"im{i}.png"), hr)
        cv2.imwrite(str(tmp_path / "LR/x2" / f"im{i}.png"), lr)
        np.save(tmp_path / "depth" / f"im{i}_disp.npy",
                rng.random((1, 1, 12, 14)).astype(np.float32))
        cv2.imwrite(str(tmp_path / "seg" / f"im{i}.png"),
                    (rng.random((24, 28)) > 0.5).astype(np.uint8) * 255)
    base = {
        "name": "t", "mode": "EndoScene_Depth", "phase": "train",
        "dataroot_GT": str(tmp_path / "HR"), "dataroot_LQ": str(tmp_path / "LR"),
        "dataroot_depthMap": str(tmp_path / "depth"),
        "dataroot_seglabel": str(tmp_path / "seg"),
        "scale": 2, "use_flip": True, "use_rot": True,
        "depthMaskNum": 10, "depthFixedRange": True, "data_type": "img",
    }
    slow = create_dataset(dict(base))
    fast = create_dataset(dict(base, cache_data=True))
    for epoch in range(2):
        for i in range(2):
            slow.rng.seed(31 * epoch + i)
            fast.rng.seed(31 * epoch + i)
            a, b = slow[i], fast[i]
            for k in ("LQ", "GT", "Depth", "DepthMaskList", "SegLabel", "Seg"):
                np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_worker_loader_warms_parent_cache(tmp_path):
    """Fork workers are respawned every epoch, so the RAM cache must be
    warmed in the PARENT (inherited copy-on-write) — a cold parent would
    decode every image again each epoch in every worker."""
    import cv2

    from endosr.data import ShardedLoader, create_dataset

    rng = np.random.default_rng(13)
    for sub in ("HR", "LR", "depth"):
        (tmp_path / sub).mkdir()
    for i in range(4):
        hr = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(tmp_path / "HR" / f"im{i}.png"), hr)
        cv2.imwrite(str(tmp_path / "LR" / f"im{i}.png"),
                    cv2.resize(hr, (4, 4)))
        np.save(tmp_path / "depth" / f"im{i}_disp.npy",
                rng.random((1, 1, 4, 4)).astype(np.float32))
    ds = create_dataset({
        "name": "t", "mode": "LQGTker_Depth", "phase": "train",
        "dataroot_GT": str(tmp_path / "HR"), "dataroot_LQ": str(tmp_path / "LR"),
        "dataroot_depthMap": str(tmp_path / "depth"),
        "scale": 4, "GT_size": 16, "LR_size": 4, "depthMaskNum": 4,
        "data_type": "img", "cache_data": True,
    })
    loader = ShardedLoader(ds, batch_size=2, shuffle=True, seed=0, ratio=2,
                           drop_last=True, num_workers=2)
    it = iter(loader)
    next(it)
    assert getattr(ds, "_cache_warmed", False)
    assert all(("prep", i) in ds._cache for i in range(4))
