"""One-command SR serving pipeline: LR frames → depth maps → masks → SR PNGs.

The reference requires running monodepth2's ``test_simple.py`` by hand to
produce ``*_disp.npy`` files and then ``test.py`` with a YAML
(``README.md:34-45``). This tool chains the whole flow:

    python scripts/sr_pipeline.py --input LR_dir --output out_dir \\
        --model latest_G.ckpt  (or the released .pth — auto-ported) \\
        --scale 8 [--depth_weights weights_19_dir | --depth_dir npy_dir] \\
        [--precision bf16] [--batch 8] [--mask_num 10]

If ``--depth_weights`` is given, depth maps are produced on-device with the
monodepth2-equivalent; with ``--depth_dir`` existing ``<stem>_disp.npy``
files are used. Same-shape frames are batched for throughput.
"""

from __future__ import annotations

import argparse
import collections
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_model(args):
    from endosr.config.options import dict_to_nonedict
    from endosr.models.f_depthcond import FModelDepthCond

    opt = dict_to_nonedict({
        "is_train": False,
        "model": "sftmd_depthCond",
        "scale": args.scale,
        "precision": args.precision,
        "eval_bucket_multiple": args.bucket,  # 0 = per-shape compiles
        "datasets": {"test": {"phase": "test", "depthMaskNum": args.mask_num,
                              "LR_size": 32}},
        "network_G": {
            "which_model_G": "DepthNet", "in_nc": 3, "out_nc": 3,
            "nf": args.nf, "nb": args.nb, "depth_latent_ch": args.latent,
            "use_trainable_params": True,
            "which_ResBlk_depth": list(range(14)),
        },
        "path": {"pretrain_model_G": args.model, "strict_load": True},
    })
    return FModelDepthCond(opt)


def ensure_depth(args, names):
    """Return {stem: disp npy path}, producing maps if needed."""
    if args.depth_dir:
        out = {}
        for n in names:
            stem = os.path.splitext(os.path.basename(n))[0]
            p = os.path.join(args.depth_dir, stem + "_disp.npy")
            if not os.path.exists(p):
                sys.exit(f"missing depth map: {p}")
            out[stem] = p
        return out
    if not args.depth_weights:
        sys.exit("need --depth_weights or --depth_dir")
    from endosr.depth.infer import run_folder

    depth_out = os.path.join(args.output, "depth")
    os.makedirs(depth_out, exist_ok=True)
    run_folder(args.input, args.depth_weights, output_dir=depth_out,
               save_colormap=False)
    return {os.path.splitext(os.path.basename(n))[0]:
            os.path.join(depth_out,
                         os.path.splitext(os.path.basename(n))[0] + "_disp.npy")
            for n in names}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="LR image folder")
    ap.add_argument("--output", required=True)
    ap.add_argument("--model", required=True, help="generator .ckpt or .pth")
    ap.add_argument("--scale", type=int, default=8)
    ap.add_argument("--depth_weights", help="monodepth2 weights folder")
    ap.add_argument("--depth_dir", help="folder with existing *_disp.npy")
    ap.add_argument("--precision", default=None, choices=[None, "bf16"])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--mask_num", type=int, default=10)
    ap.add_argument("--bucket", type=int, default=0,
                    help="pad eval shapes to this multiple (0 = exact)")
    ap.add_argument("--nf", type=int, default=64)
    ap.add_argument("--nb", type=int, default=16)
    ap.add_argument("--latent", type=int, default=256)
    ap.add_argument("--fixed_range", action="store_true", default=True)
    ap.add_argument("--spatial", action="store_true",
                    help="shard each frame's height across all devices "
                         "(XLA SPMD halo exchange; for frames too large "
                         "for one chip — needs H >= 4x device count)")
    args = ap.parse_args(argv)

    import cv2

    from endosr.data import util as dutil
    from endosr.ops.masks import depth_masks_np
    from endosr.utils.misc import save_img, tensor2img

    os.makedirs(args.output, exist_ok=True)
    names = dutil.get_image_paths("img", args.input)
    depth_paths = ensure_depth(args, names)
    model = build_model(args)

    # group same-shape frames into batches (one compile per shape bucket)
    groups: dict = collections.defaultdict(list)
    for p in names:
        img = dutil.read_img(None, p)  # HWC BGR [0,1]
        stem = os.path.splitext(os.path.basename(p))[0]
        disp = np.load(depth_paths[stem])
        dm = np.squeeze(disp, axis=1)[0]
        masks = depth_masks_np(dm, args.fixed_range, args.mask_num)
        groups[img.shape].append(
            (stem, img[:, :, ::-1], dm[..., None], masks))  # RGB

    count = 0
    for shape, items in groups.items():
        for i in range(0, len(items), args.batch):
            chunk = items[i:i + args.batch]
            batch = {
                "LQ": np.stack([c[1] for c in chunk]).astype(np.float32),
                "Depth": np.stack([c[2] for c in chunk]).astype(np.float32),
                "DepthMaskList": np.stack([c[3] for c in chunk]).astype(np.float32),
            }
            if args.spatial:
                import jax

                from endosr.parallel.mesh import make_mesh
                from endosr.parallel.spatial import spatial_forward

                out = spatial_forward(
                    model.netG, model.state.params["netG"], batch["LQ"],
                    batch["Depth"], batch["DepthMaskList"],
                    mesh=make_mesh(),
                )
                model.fake_SR = np.asarray(jax.device_get(out))
            else:
                model.feed_data(batch)
                model.test()
            for j, (stem, *_rest) in enumerate(chunk):
                sr = tensor2img(model.fake_SR[j])
                save_img(sr, os.path.join(args.output, stem + ".png"))
                count += 1
    print(f"wrote {count} SR frames to {args.output}")


if __name__ == "__main__":
    main()
