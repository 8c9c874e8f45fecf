"""Dataset classes — capability twins of ``codes/data/*_dataset.py``.

All datasets return NHWC-convention numpy dicts:
  'LQ'  HWC RGB float32 [0,1]     'GT'  HWC RGB float32 [0,1]
  'Depth' HW1 float32             'DepthMaskList' HWK float32
plus path strings. Depth maps follow the monodepth2 producer convention:
``<stem>_disp.npy`` of shape [1,1,H,W] (``LQGTker_Depth_dataset.py:151-154``).
"""

from __future__ import annotations

import os
import random

import numpy as np

from endosr.data import util
from endosr.ops.color import channel_convert, modcrop
from endosr.ops.masks import depth_masks_np
from endosr.ops.resize import imresize_np

__all__ = [
    "LQGTKerDepthDataset",
    "EndoSceneDepthDataset",
    "EndoSceneDepthnewDataset",
    "LQGTKerDataset",
    "LQDataset",
    "LQKerDataset",
    "SRKerDataset",
    "LRHRSegBGDataset",
]


class _Base:
    def __init__(self, opt):
        self.opt = opt
        self.rng = random.Random()
        # optional host-RAM cache of decoded images/arrays — on a 1-CPU host
        # PNG decode dominates step time; enable with `cache_data: true`
        self._cache = {} if opt.get("cache_data") else None
        self._envs: dict = {}  # lazily opened LMDB environments per root
        self.GT_sizes = self.LR_sizes = None

    def _img(self, root, paths, sizes, index):
        """Read image #index from plain files or an LMDB archive
        (autodetected via ``data_type``, ``codes/data/util.py:21-84``)."""
        if self.opt["data_type"] == "lmdb":
            from endosr.data.lmdb_io import open_lmdb

            env = self._envs.get(root)
            if env is None:
                env = self._envs[root] = open_lmdb(root)
            h, w, c = (int(s) for s in sizes[index].split("_"))
            return util.read_img(env, paths[index], (h, w, c))
        return self._read_img(paths[index])

    def _read_img(self, path):
        if self._cache is None:
            return util.read_img(None, path)
        img = self._cache.get(path)
        if img is None:
            img = util.read_img(None, path)
            self._cache[path] = img
        return img

    def _load_npy(self, path):
        if self._cache is None:
            return np.load(path)
        arr = self._cache.get(path)
        if arr is None:
            arr = np.load(path)
            self._cache[path] = arr
        return arr

    def __len__(self):
        return len(self.GT_paths)

    def _is_train(self):
        return self.opt["phase"] == "train"

    @staticmethod
    def _rgb_u8(img_f32_bgr):
        """Decoded f32 BGR [0,1] → RGB u8 iff exactly representable
        (u8 sources round-trip: (u/255)*255 == u in fp32); 16-bit
        sources keep fp32."""
        rgb = util.bgr_to_rgb_f32(img_f32_bgr)
        u8 = (rgb * 255.0).astype(np.uint8)
        if np.array_equal(u8.astype(np.float32) / 255.0, rgb):
            return u8
        return rgb


class LQGTKerDepthDataset(_Base):
    """Flagship: LR + GT pairs + depth map + K binary depth masks.

    Twin of ``LQGTKerDepthDataset`` (``LQGTker_Depth_dataset.py:19-226``)
    including the offline-augmentation double set (``*_DA.jpg``) and
    on-the-fly MATLAB-bicubic LR generation when no LR root is given.
    """

    def __init__(self, opt):
        super().__init__(opt)
        self.LR_paths = util.get_image_paths(opt["data_type"], opt.get("dataroot_LQ"))
        self.GT_paths = util.get_image_paths(opt["data_type"], opt.get("dataroot_GT"))
        if opt["data_type"] == "lmdb":
            # keys + "<h>_<w>_<c>" resolution strings from meta_info.pkl
            if self.LR_paths is not None:
                self.LR_paths, self.LR_sizes = self.LR_paths
            self.GT_paths, self.GT_sizes = self.GT_paths

        if self._is_train() and opt.get("data_num"):
            if self.LR_paths:
                self.LR_paths = self.LR_paths[: opt["data_num"]]
            self.GT_paths = self.GT_paths[: opt["data_num"]]

        origin_LR_paths = list(self.LR_paths or [])
        if self._is_train() and opt.get("data_augment"):
            aug_paths = []
            for imagepath in self.LR_paths:
                imgname = os.path.basename(imagepath).split(".")[0] + "_DA.jpg"
                aug_paths.append(os.path.join(opt["dataroot_LQ_Aug"], imgname))
            self.LR_paths = self.LR_paths + aug_paths
            self.GT_paths = self.GT_paths + self.GT_paths

        # depth maps by filename convention <stem>_disp.npy
        base = origin_LR_paths if (self._is_train() and opt.get("data_augment")) else (
            self.LR_paths or self.GT_paths
        )
        self.Depth_paths = [
            os.path.join(opt["dataroot_depthMap"],
                         os.path.basename(p).split(".")[0] + "_disp.npy")
            for p in base
        ]
        if self._is_train() and opt.get("data_augment"):
            self.Depth_paths = self.Depth_paths + self.Depth_paths

        assert self.GT_paths, "Error: GT paths are empty."
        if self.LR_paths:
            assert len(self.LR_paths) == len(self.GT_paths) == len(self.Depth_paths), (
                f"GT, LR and Depth datasets have different number of images - "
                f"{len(self.LR_paths)}, {len(self.GT_paths)}, {len(self.Depth_paths)}."
            )

    def _prepared_train(self, index):
        """RAM-cached fully-preprocessed sample (train fast path).

        Caches the POST-decode, POST-color-convert form — RGB uint8 images
        (4× smaller than fp32, 4× faster to flip), fp32 depth and uint8
        binned masks — so the per-sample work left in ``__getitem__`` is
        just the paired augmentation and the uint8→fp32 [0,1] convert.
        Channel reorder and the /255 normalization commute exactly with the
        flip/rot permutations, so batches are bit-identical to the uncached
        path (tests/test_config_and_data.py). Closes the round-1
        input-bound-training finding (loader 33.8 imgs/s vs 63 consumed;
        BASELINE.md) — the decode + mask binning + bgr→rgb cost is paid
        once per image instead of every epoch.
        """
        key = ("prep", index)
        if key in self._cache:
            return self._cache[key]
        opt = self.opt
        scale = opt["scale"]

        rgb_u8 = self._rgb_u8

        img_GT = util.read_img(None, self.GT_paths[index]) \
            if opt["data_type"] != "lmdb" else self._img(
                opt.get("dataroot_GT"), self.GT_paths, self.GT_sizes, index)
        if self.LR_paths:
            # plain read (no path-keyed cache): the prep tuple supersedes it
            img_LR = (util.read_img(None, self.LR_paths[index])
                      if opt["data_type"] != "lmdb" else self._img(
                          opt.get("dataroot_LQ"), self.LR_paths,
                          self.LR_sizes, index))
        else:
            img_LR = imresize_np(img_GT, 1 / scale, True)
            if img_LR.ndim == 2:
                img_LR = np.expand_dims(img_LR, axis=2)

        if (img_LR.ndim != 3 or img_LR.shape[2] != 3
                or img_GT.ndim != 3 or img_GT.shape[2] != 3):
            self._cache[key] = None  # channel_convert path: use slow route
            return None
        # np.load directly: the prep tuple supersedes the path-keyed cache
        depth_map = np.load(self.Depth_paths[index])
        depth_map = np.squeeze(depth_map, axis=1)[0]
        mask_list = depth_masks_np(
            depth_map, opt.get("depthFixedRange", True),
            opt.get("depthMaskNum", 10))
        got = (rgb_u8(img_LR), rgb_u8(img_GT),
               np.ascontiguousarray(depth_map[..., None], np.float32),
               mask_list.astype(np.uint8))
        self._cache[key] = got
        return got

    def __getitem__(self, index):
        opt = self.opt
        scale = opt["scale"]

        prep = (self._prepared_train(index)
                if (self._cache is not None and self._is_train()
                    and opt.get("color") in (None, "RGB")) else None)
        if prep is not None:
            lr, gt, dep, masks = prep
            lr, gt, dep, masks = util.augment(
                [lr, gt, dep, masks],
                opt.get("use_flip", False), opt.get("use_rot", False),
                self.rng,
            )
            if opt.get("u8_pipeline"):
                # device-normalize mode: ship uint8 over the host pipeline
                # and H2D (4× fewer bytes); the jitted train step applies
                # the identical ``astype(f32)/255`` (f_depthcond._u8_norm)
                return {
                    "LQ": np.ascontiguousarray(lr),
                    "GT": np.ascontiguousarray(gt),
                    "Depth": np.ascontiguousarray(dep, np.float32),
                    "DepthMaskList": np.ascontiguousarray(masks),
                    "LQ_path": (self.LR_paths or self.GT_paths)[index],
                    "GT_path": self.GT_paths[index],
                }
            return {
                "LQ": util.to_f32_01(lr),
                "GT": util.to_f32_01(gt),
                "Depth": np.ascontiguousarray(dep, np.float32),
                "DepthMaskList": np.ascontiguousarray(masks, np.float32),
                "LQ_path": (self.LR_paths or self.GT_paths)[index],
                "GT_path": self.GT_paths[index],
            }

        GT_path = self.GT_paths[index]
        img_GT = self._img(opt.get("dataroot_GT"), self.GT_paths, self.GT_sizes,
                           index)
        if not self._is_train():
            img_GT = modcrop(img_GT, scale)

        if self.LR_paths:
            LR_path = self.LR_paths[index]
            img_LR = self._img(opt.get("dataroot_LQ"), self.LR_paths,
                               self.LR_sizes, index)
        else:
            LR_path = GT_path
            img_LR = imresize_np(img_GT, 1 / scale, True)
            if img_LR.ndim == 2:
                img_LR = np.expand_dims(img_LR, axis=2)

        depth_map = self._load_npy(self.Depth_paths[index])
        depth_map = np.squeeze(depth_map, axis=1)[0]  # [1,1,H,W] → HW
        mask_list = depth_masks_np(
            depth_map, opt.get("depthFixedRange", True), opt.get("depthMaskNum", 10)
        )  # HWK
        depth_map = depth_map[..., None].astype(np.float32)  # HW1

        if self._is_train():
            assert opt["LR_size"] == opt["GT_size"] // scale, \
                "GT size does not match LR size"
            img_LR, img_GT, depth_map, mask_list = util.augment(
                [img_LR, img_GT, depth_map, mask_list],
                opt.get("use_flip", False), opt.get("use_rot", False), self.rng,
            )

        if opt.get("color"):
            img_LR = channel_convert(img_LR.shape[2], opt["color"], [img_LR])[0]
            img_GT = channel_convert(img_GT.shape[2], opt["color"], [img_GT])[0]

        # BGR → RGB (cv2 SIMD path for the contiguous 3-channel case)
        img_LR = util.bgr_to_rgb_f32(img_LR)
        img_GT = util.bgr_to_rgb_f32(img_GT)

        return {
            "LQ": img_LR,
            "GT": img_GT,
            "Depth": np.ascontiguousarray(depth_map, np.float32),
            "DepthMaskList": np.ascontiguousarray(mask_list, np.float32),
            "LQ_path": LR_path,
            "GT_path": GT_path,
        }


class EndoSceneDepthDataset(_Base):
    """EndoScene split-file dataset with optional segmentation labels.

    Twin of ``EndoSceneDepthDataset`` (``EndoScene_depth_dataset.py:20-239``):
    path list from ``dataset_split_list`` txt, per-scale subdirs ``x<scale>``,
    one-hot segmentation label support for seg co-training. Also fixes the
    reference's factory bug that never instantiated this class
    (SURVEY.md §2.9-1).
    """

    def __init__(self, opt):
        super().__init__(opt)
        scale = opt["scale"]
        split_list = opt.get("dataset_split_list")
        if split_list:
            with open(split_list) as f:
                names = [line.strip() for line in f if line.strip()]
        else:
            names = [os.path.basename(p)
                     for p in util.get_image_paths("img", opt["dataroot_GT"])]
        self.names = names
        self.GT_paths = [os.path.join(opt["dataroot_GT"], n) for n in names]
        lq_root = opt.get("dataroot_LQ")
        self.LR_paths = (
            [os.path.join(lq_root, f"x{scale}", n) for n in names] if lq_root else None
        )
        if self.LR_paths and not os.path.exists(self.LR_paths[0]):
            self.LR_paths = [os.path.join(lq_root, n) for n in names]
        self.Depth_paths = [
            os.path.join(opt["dataroot_depthMap"], n.split(".")[0] + "_disp.npy")
            for n in names
        ]
        self.Seg_paths = None
        if opt.get("dataroot_seglabel"):
            self.Seg_paths = [
                os.path.join(opt["dataroot_seglabel"], n) for n in names
            ]

    def _prepared_train(self, index):
        """RAM-cached preprocessed train sample (see LQGTKerDepthDataset):
        RGB-u8 images, fp32 depth, u8 masks, u8 one-hot seg."""
        key = ("prep", index)
        if key in self._cache:
            return self._cache[key]
        opt = self.opt
        scale = opt["scale"]
        img_GT = util.read_img(None, self.GT_paths[index])
        if self.LR_paths:
            img_LR = util.read_img(None, self.LR_paths[index])
        else:
            img_LR = imresize_np(img_GT, 1 / scale, True)
        if (img_LR.ndim != 3 or img_LR.shape[2] != 3
                or img_GT.ndim != 3 or img_GT.shape[2] != 3):
            self._cache[key] = None
            return None
        depth_map = np.load(self.Depth_paths[index])
        depth_map = np.squeeze(depth_map, axis=1)[0]
        mask_list = depth_masks_np(
            depth_map, opt.get("depthFixedRange", True),
            opt.get("depthMaskNum", 10))
        seg = None
        if self.Seg_paths is not None:
            import cv2

            seg_raw = cv2.imread(self.Seg_paths[index], cv2.IMREAD_GRAYSCALE)
            seg = util.get_one_hot((seg_raw > 127).astype(np.int64),
                                   2).astype(np.uint8)
        got = (self._rgb_u8(img_LR), self._rgb_u8(img_GT),
               np.ascontiguousarray(depth_map[..., None], np.float32),
               mask_list.astype(np.uint8), seg)
        self._cache[key] = got
        return got

    def __getitem__(self, index):
        opt = self.opt
        scale = opt["scale"]

        prep = (self._prepared_train(index)
                if self._cache is not None and self._is_train() else None)
        if prep is not None:
            lr, gt, dep, masks, seg = prep
            arrays = [lr, gt, dep, masks] + ([seg] if seg is not None else [])
            arrays = util.augment(arrays, opt.get("use_flip", False),
                                  opt.get("use_rot", False), self.rng)
            u8 = bool(opt.get("u8_pipeline"))

            def im(x):
                return np.ascontiguousarray(x) if u8 else util.to_f32_01(x)

            out = {
                "LQ": im(arrays[0]),
                "GT": im(arrays[1]),
                "Depth": np.ascontiguousarray(arrays[2], np.float32),
                "DepthMaskList": np.ascontiguousarray(
                    arrays[3]) if u8 else np.ascontiguousarray(
                        arrays[3], np.float32),
                "LQ_path": (self.LR_paths[index] if self.LR_paths
                            else self.GT_paths[index]),
                "GT_path": self.GT_paths[index],
            }
            if seg is not None:
                sa = np.ascontiguousarray(arrays[4], np.float32)
                out["SegLabel"] = sa
                out["Seg_onehot"] = sa
                out["Seg"] = np.ascontiguousarray(
                    np.argmax(sa, axis=-1), np.int64)
            return out

        img_GT = self._read_img(self.GT_paths[index])
        if not self._is_train():
            img_GT = modcrop(img_GT, scale)
        if self.LR_paths:
            img_LR = self._read_img(self.LR_paths[index])
        else:
            img_LR = imresize_np(img_GT, 1 / scale, True)

        depth_map = self._load_npy(self.Depth_paths[index])
        depth_map = np.squeeze(depth_map, axis=1)[0]
        mask_list = depth_masks_np(
            depth_map, opt.get("depthFixedRange", True), opt.get("depthMaskNum", 10)
        )
        depth_map = depth_map[..., None].astype(np.float32)

        seg = None
        if self.Seg_paths is not None:
            import cv2

            seg_raw = cv2.imread(self.Seg_paths[index], cv2.IMREAD_GRAYSCALE)
            seg = (seg_raw > 127).astype(np.int64)
            seg = util.get_one_hot(seg, 2)  # HW2

        arrays = [img_LR, img_GT, depth_map, mask_list] + (
            [seg] if seg is not None else []
        )
        if self._is_train():
            arrays = util.augment(arrays, opt.get("use_flip", False),
                                  opt.get("use_rot", False), self.rng)
        img_LR, img_GT, depth_map, mask_list = arrays[:4]
        if seg is not None:
            seg = arrays[4]

        img_LR = util.bgr_to_rgb_f32(img_LR)
        img_GT = util.bgr_to_rgb_f32(img_GT)

        out = {
            "LQ": img_LR,
            "GT": img_GT,
            "Depth": np.ascontiguousarray(depth_map, np.float32),
            "DepthMaskList": np.ascontiguousarray(mask_list, np.float32),
            "LQ_path": self.LR_paths[index] if self.LR_paths else self.GT_paths[index],
            "GT_path": self.GT_paths[index],
        }
        if seg is not None:
            # one-hot + integer labels, reference key names (``Seg_onehot``/
            # ``Seg``, F_model_depthSeg.feed_data) plus the NHWC alias
            out["SegLabel"] = np.ascontiguousarray(seg, np.float32)
            out["Seg_onehot"] = out["SegLabel"]
            out["Seg"] = np.ascontiguousarray(np.argmax(seg, axis=-1), np.int64)
        return out


class EndoSceneDepthnewDataset(EndoSceneDepthDataset):
    """Variant with ``.tif → .png`` name mapping and x2-depth rescaling
    (``EndoScene_depthnew_dataset.py:20-249``)."""

    def __init__(self, opt):
        super().__init__(opt)
        self.Depth_paths = [
            os.path.join(
                opt["dataroot_depthMap"],
                n.split(".")[0] + "_disp.npy",
            )
            for n in self.names
        ]

    def __getitem__(self, index):
        import cv2

        item = super().__getitem__(index)
        # depth comes from the x2 producer; resize to LR resolution if needed
        lr_h, lr_w = item["LQ"].shape[:2]
        d = item["Depth"][..., 0]
        if d.shape != (lr_h, lr_w):
            d = cv2.resize(d, (lr_w, lr_h), interpolation=cv2.INTER_LINEAR)
            mask_list = depth_masks_np(
                d, self.opt.get("depthFixedRange", True),
                self.opt.get("depthMaskNum", 10),
            )
            item["Depth"] = d[..., None].astype(np.float32)
            item["DepthMaskList"] = mask_list
        return item


class LQGTKerDataset(_Base):
    """LR + GT pairs, no depth (legacy SFTMD path, ``LQGTker_dataset.py``)."""

    def __init__(self, opt):
        super().__init__(opt)
        self.LR_paths = util.get_image_paths(opt["data_type"], opt.get("dataroot_LQ"))
        self.GT_paths = util.get_image_paths(opt["data_type"], opt.get("dataroot_GT"))

    def __getitem__(self, index):
        opt = self.opt
        scale = opt["scale"]
        GT_path = self.GT_paths[index]
        img_GT = self._read_img(GT_path)
        if not self._is_train():
            img_GT = modcrop(img_GT, scale)
        if self.LR_paths:
            LR_path = self.LR_paths[index]
            img_LR = self._read_img(LR_path)
        else:
            LR_path = GT_path
            img_LR = imresize_np(img_GT, 1 / scale, True)
        if self._is_train():
            img_LR, img_GT = util.augment(
                [img_LR, img_GT], opt.get("use_flip", False),
                opt.get("use_rot", False), self.rng,
            )
        img_LR = util.bgr_to_rgb_f32(img_LR)
        img_GT = util.bgr_to_rgb_f32(img_GT)
        return {
            "LQ": img_LR,
            "GT": img_GT,
            "LQ_path": LR_path,
            "GT_path": GT_path,
        }


class LQDataset(_Base):
    """LR-only (kernel Predictor input, ``LQ_dataset.py:9-80``)."""

    def __init__(self, opt):
        super().__init__(opt)
        self.LR_paths = util.get_image_paths(opt["data_type"], opt["dataroot_LQ"])
        self.GT_paths = self.LR_paths

    def __getitem__(self, index):
        LR_path = self.LR_paths[index]
        img_LR = self._read_img(LR_path)
        return {"LQ": util.bgr_to_rgb_f32(img_LR), "LQ_path": LR_path}


class LQKerDataset(LQDataset):
    """LR + ground-truth kernel-map list (``LQker_dataset.py:9-77``)."""

    def __init__(self, opt, ker_map_list=None):
        super().__init__(opt)
        self.ker_map_list = ker_map_list

    def __getitem__(self, index):
        item = super().__getitem__(index)
        if self.ker_map_list is not None:
            item["real_ker"] = np.asarray(self.ker_map_list[index], np.float32)
        return item


class SRKerDataset(_Base):
    """SR image + estimated kernel map (Corrector input, ``SRker_dataset.py``)."""

    def __init__(self, opt, est_ker_map_list=None):
        super().__init__(opt)
        self.SR_paths = util.get_image_paths(opt["data_type"], opt["dataroot_SR"])
        self.GT_paths = self.SR_paths
        self.est_ker_map_list = est_ker_map_list

    def __getitem__(self, index):
        SR_path = self.SR_paths[index]
        img_SR = util.read_img(None, SR_path)
        item = {"SR": util.bgr_to_rgb_f32(img_SR), "SR_path": SR_path}
        if self.est_ker_map_list is not None:
            item["est_ker_map"] = np.asarray(self.est_ker_map_list[index], np.float32)
        return item


class LRHRSegBGDataset(_Base):
    """LR/HR/segmentation/category dataset for SFT-GAN.

    Capability twin of ``codes/data/LRHR_seg_bg_dataset.py``: HR images with
    per-image 8-channel segmentation probability maps (stored as ``.npy``
    HWC files beside a ``seg/`` root here, vs the reference's torch ``.pth``
    under ``/bicseg/``), a 1-in-10 chance of sampling a background image with
    an all-background seg map, on-the-fly MATLAB-bicubic LR generation with
    random rescale, paired random crop + flip/rot, and the OST category-from-
    path convention (building/plant/mountain/water/sky/grass/animal).
    """

    CATEGORIES = ("building", "plant", "mountain", "water", "sky", "grass",
                  "animal")

    def __init__(self, opt):
        super().__init__(opt)
        self.HR_paths = util.get_image_paths("img", opt["dataroot_GT"])
        self.GT_paths = self.HR_paths
        self.LR_paths = (util.get_image_paths("img", opt["dataroot_LR"])
                         if opt.get("dataroot_LR") else None)
        self.BG_paths = (util.get_image_paths("img", opt["dataroot_GT_bg"])
                         if opt.get("dataroot_GT_bg") else None)
        self.seg_root = opt.get("dataroot_seg")
        self.random_scale_list = [1, 0.9, 0.8, 0.7, 0.6, 0.5]
        self.ratio = 10

    def _load_seg(self, hr_path, shape):
        if self.seg_root:
            p = os.path.join(
                self.seg_root,
                os.path.basename(hr_path).rsplit(".", 1)[0] + ".npy")
            if os.path.exists(p):
                return np.load(p).astype(np.float32)
        seg = np.zeros((shape[0], shape[1], 8), np.float32)
        seg[..., 0] = 1.0
        return seg

    def __getitem__(self, index):
        import cv2

        opt = self.opt
        scale = opt["scale"]
        hr_size = opt.get("HR_size") or opt.get("GT_size")

        use_bg = (self._is_train() and self.BG_paths
                  and self.rng.randrange(self.ratio) == 0)
        if use_bg:
            HR_path = self.BG_paths[self.rng.randrange(len(self.BG_paths))]
            img_HR = util.read_img(None, HR_path)
            seg = np.zeros((img_HR.shape[0], img_HR.shape[1], 8), np.float32)
            seg[..., 0] = 1.0
        else:
            HR_path = self.HR_paths[index]
            img_HR = util.read_img(None, HR_path)
            seg = self._load_seg(HR_path, img_HR.shape)

        if not self._is_train():
            img_HR = modcrop(img_HR, 8)
            seg = seg[: img_HR.shape[0], : img_HR.shape[1]]

        LR_path = None
        if self.LR_paths and not use_bg:
            LR_path = self.LR_paths[index]
            img_LR = self._read_img(LR_path)
        else:
            if self._is_train():
                rs = self.rng.choice(self.random_scale_list)
                h_s, w_s = img_HR.shape[:2]

                def _mod(n):
                    r = int(n * rs)
                    r = (r // scale) * scale
                    return hr_size if r < hr_size else r

                h_s, w_s = _mod(h_s), _mod(w_s)
                img_HR = cv2.resize(np.copy(img_HR), (w_s, h_s),
                                    interpolation=cv2.INTER_LINEAR)
                seg = cv2.resize(np.copy(seg), (w_s, h_s),
                                 interpolation=cv2.INTER_NEAREST)
            img_LR = imresize_np(img_HR, 1 / scale, True)
            if img_LR.ndim == 2:
                img_LR = np.expand_dims(img_LR, axis=2)

        if self._is_train():
            lr_size = hr_size // scale
            h, w = img_LR.shape[:2]
            rnd_h = self.rng.randint(0, max(0, h - lr_size))
            rnd_w = self.rng.randint(0, max(0, w - lr_size))
            img_LR = img_LR[rnd_h:rnd_h + lr_size, rnd_w:rnd_w + lr_size]
            rh, rw = rnd_h * scale, rnd_w * scale
            img_HR = img_HR[rh:rh + hr_size, rw:rw + hr_size]
            seg = seg[rh:rh + hr_size, rw:rw + hr_size]
            img_LR, img_HR, seg = util.augment(
                [img_LR, img_HR, seg], opt.get("use_flip", False),
                opt.get("use_rot", False), self.rng)
            category = 0
            for i, name in enumerate(self.CATEGORIES, start=1):
                if name in HR_path:
                    category = i
                    break
        else:
            category = -1

        img_HR = util.bgr_to_rgb_f32(img_HR)
        img_LR = util.bgr_to_rgb_f32(img_LR)
        return {
            "LR": img_LR,
            "HR": img_HR,
            "GT": img_HR.copy(),
            "seg": np.ascontiguousarray(seg, np.float32),
            "category": np.int64(category),
            "LR_path": LR_path or HR_path,
            "HR_path": HR_path,
        }
