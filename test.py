"""Inference/eval driver — twin of ``codes/test.py``.

Usage: python test.py -opt_F options/test/test_depthNet.yml

Loads the pretrained generator, runs every test image, saves SR PNGs under
``results/<name>/x<scale>/`` and writes a per-image TSV of PSNR/SSIM.
Unlike the reference — which stubs the TSV metrics to zero
(``test.py:112-113,126-127``, SURVEY.md §2.9-3) — real MATLAB-conformant
RGB and Y-channel scores are computed inline.
"""

from __future__ import annotations

import argparse
import logging
import os
import os.path as osp


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-opt_F", type=str, required=True,
                        help="Path to options YAML file.")
    args = parser.parse_args()

    from endosr.config import options as option
    from endosr.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    opt_F = option.parse(args.opt_F, is_train=False)

    from endosr.utils import misc as util

    util.mkdirs(
        path for key, path in opt_F["path"].items()
        if not key == "experiments_root" and "pretrain_model" not in key
        and "resume" not in key and isinstance(path, str)
    )
    util.setup_logger("base", opt_F["path"]["log"], "test_" + opt_F["name"],
                      level=logging.INFO, screen=True, tofile=True)
    logger = logging.getLogger("base")
    logger.info(option.dict2str(opt_F))
    util.set_random_seed(0)

    opt_F = option.dict_to_nonedict(opt_F)

    # Serving-precision auto-select (BASELINE.md quality budget): ×4/×8
    # serve in bf16 (certified ≥60 dB vs fp32 at the ×8 flagship); ×2/×3
    # serve in bf16c3 — 3-pass mean-compensated centered convs, ≥50 dB
    # where plain bf16 fails the 0.05 dB budget
    # (tests/test_bf16_quality.py, endosr/nn/layers.py:centered_conv).
    # Set ``precision`` in the YAML to override (``fp32`` = reference-exact).
    if opt_F.get("precision") is None:
        opt_F["precision"] = "bf16" if int(opt_F["scale"]) >= 4 else "bf16c3"
        logger.info("precision auto-selected: %s (x%d serving)",
                    opt_F["precision"], int(opt_F["scale"]))

    from endosr.data import create_dataloader, create_dataset
    from endosr.metrics import calculate_psnr, calculate_ssim
    from endosr.models import create_model
    from endosr.ops.color import bgr2ycbcr

    test_loaders = []
    for phase, dataset_opt in sorted(opt_F["datasets"].items()):
        test_set = create_dataset(dataset_opt)
        test_loaders.append((dataset_opt, create_dataloader(test_set, dataset_opt)))
        logger.info("Number of test images in [%s]: %d",
                    dataset_opt["name"], len(test_set))

    model = create_model(opt_F)

    for dataset_opt, test_loader in test_loaders:
        test_set_name = dataset_opt["name"]
        logger.info("Testing [%s]...", test_set_name)
        dataset_dir = osp.join(opt_F["path"]["results_root"],
                               f'x{opt_F["scale"]}')
        util.mkdir(dataset_dir)
        tsv_path = osp.join(opt_F["path"]["results_root"],
                            f"result_x{opt_F['scale']}.tsv")
        sums = {"psnr": 0.0, "ssim": 0.0, "psnr_y": 0.0, "ssim_y": 0.0}
        count = 0
        with open(tsv_path, "w") as tsv:
            tsv.write("Name\tPSNR\tSSIM\tPSNR_Y\tSSIM_Y\n")
            for data in test_loader:
                need_gt = data.get("GT") is not None
                model.feed_data(data)
                model.test()
                visuals = model.get_current_visuals()
                sr_img = util.tensor2img(visuals["SR"])  # HWC BGR uint8

                img_name = osp.splitext(osp.basename(data["LQ_path"][0]))[0]
                suffix = opt_F.get("suffix") or ""
                save_path = osp.join(dataset_dir, img_name + suffix + ".png")
                util.save_img(sr_img, save_path)

                line = [img_name]
                if need_gt:
                    gt_img = util.tensor2img(visuals["GT"])
                    crop = opt_F["scale"]
                    sr_c = sr_img[crop:-crop, crop:-crop]
                    gt_c = gt_img[crop:-crop, crop:-crop]
                    psnr = calculate_psnr(sr_c, gt_c)
                    ssim = calculate_ssim(sr_c, gt_c)
                    sr_y = bgr2ycbcr(sr_img.astype("float64") / 255.0, only_y=True) * 255
                    gt_y = bgr2ycbcr(gt_img.astype("float64") / 255.0, only_y=True) * 255
                    psnr_y = calculate_psnr(sr_y[crop:-crop, crop:-crop],
                                            gt_y[crop:-crop, crop:-crop])
                    ssim_y = calculate_ssim(sr_y[crop:-crop, crop:-crop],
                                            gt_y[crop:-crop, crop:-crop])
                    sums["psnr"] += psnr
                    sums["ssim"] += ssim
                    sums["psnr_y"] += psnr_y
                    sums["ssim_y"] += ssim_y
                    count += 1
                    line += [f"{psnr:.6f}", f"{ssim:.6f}",
                             f"{psnr_y:.6f}", f"{ssim_y:.6f}"]
                    logger.info("%s - PSNR: %.6f dB; SSIM: %.6f; "
                                "PSNR_Y: %.6f dB; SSIM_Y: %.6f.",
                                img_name, psnr, ssim, psnr_y, ssim_y)
                else:
                    line += ["0", "0", "0", "0"]
                    logger.info("%s (no GT)", img_name)
                tsv.write("\t".join(line) + "\n")

            if count:
                tsv.write("\t".join([
                    "Average",
                    f"{sums['psnr'] / count:.6f}",
                    f"{sums['ssim'] / count:.6f}",
                    f"{sums['psnr_y'] / count:.6f}",
                    f"{sums['ssim_y'] / count:.6f}",
                ]) + "\n")
                logger.info(
                    "----Average PSNR/SSIM results for %s----\n\t"
                    "PSNR: %.6f dB; SSIM: %.6f; PSNR_Y: %.6f dB; SSIM_Y: %.6f.",
                    test_set_name, sums["psnr"] / count, sums["ssim"] / count,
                    sums["psnr_y"] / count, sums["ssim_y"] / count)


if __name__ == "__main__":
    main()
