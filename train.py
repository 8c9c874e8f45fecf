"""Training driver — twin of ``codes/train.py``.

Usage (same surface as the reference):
    python train.py -opt_F options/train/train_depthNet_SEAN_depthMask_x8.yml

Differences from the reference, by design:
  * distributed init is ``jax.distributed`` + a device mesh, not NCCL/DDP;
    the per-host data shard replaces ``DistIterSampler``
  * the dead 30k-kernel PCA precompute at startup (``train.py:63-70``,
    SURVEY.md §2.9-4) is dropped
  * LR scheduling is a closed-form function of the step
"""

from __future__ import annotations

import argparse
import logging
import math
import os
import random

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-opt_F", type=str, required=True,
                        help="Path to option YAML file of the SR model.")
    parser.add_argument("--launcher", choices=["none", "pytorch", "jax"],
                        default="none", help="accepted for CLI parity")
    parser.add_argument("--local_rank", type=int, default=0)
    args = parser.parse_args()

    from endosr.config import options as option
    from endosr.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from endosr.parallel.mesh import is_main_process, maybe_init_distributed

    maybe_init_distributed()
    import jax

    opt_F = option.parse(args.opt_F, is_train=True)

    # random seed
    seed = opt_F["train"].get("manual_seed")
    if seed is None:
        seed = random.randint(1, 10000)
        opt_F["train"]["manual_seed"] = seed
    from endosr.utils import misc as util

    util.set_random_seed(seed)

    opt_F["dist"] = jax.process_count() > 1
    rank = jax.process_index()

    # resume state
    resume_iter = 0
    start_epoch = 0
    resume_path = option.resolve_resume_state(opt_F)
    if resume_path:
        resume_iter = int(os.path.basename(resume_path).split(".")[0])
        option.check_resume(opt_F, resume_iter)

    from endosr.config.options import setup_experiment_dirs

    if is_main_process():
        setup_experiment_dirs(opt_F)
        util.setup_logger("base", opt_F["path"]["log"], "train_" + opt_F["name"],
                          level=logging.INFO, screen=True, tofile=True)
        util.setup_logger("val", opt_F["path"]["log"], "val_" + opt_F["name"],
                          level=logging.INFO, screen=False, tofile=True)
    else:
        util.setup_logger("base", opt_F["path"]["log"], "train", level=logging.INFO,
                          screen=True)
    logger = logging.getLogger("base")
    logger.info(option.dict2str(opt_F))

    tb_logger = None
    if opt_F.get("use_tb_logger") and "debug" not in opt_F["name"] and is_main_process():
        try:
            from tensorboardX import SummaryWriter

            tb_logger = SummaryWriter(log_dir=os.path.join(
                opt_F["path"]["root"], "tb_logger", opt_F["name"]))
        except ImportError:
            logger.warning("tensorboardX unavailable; scalar logs go to file only")

    opt_F = option.dict_to_nonedict(opt_F)

    # datasets
    from endosr.data import create_dataloader, create_dataset

    train_loader = None
    val_loader = None
    total_iters = int(opt_F["train"]["niter"])
    total_epochs = 0
    for phase, dataset_opt in opt_F["datasets"].items():
        if phase == "train":
            train_set = create_dataset(dataset_opt)
            train_loader = create_dataloader(train_set, dataset_opt, opt_F)
            train_size = len(train_loader)
            total_epochs = int(math.ceil(total_iters / max(1, train_size)))
            logger.info("Number of train images: %d, iters per epoch: %d",
                        len(train_set), train_size)
            logger.info("Total epochs needed: %d for iters %d",
                        total_epochs, total_iters)
        elif phase == "val":
            val_set = create_dataset(dataset_opt)
            val_loader = create_dataloader(val_set, dataset_opt, opt_F)
            logger.info("Number of val images in [%s]: %d",
                        dataset_opt["name"], len(val_set))

    assert train_loader is not None

    # model
    from endosr.models import create_model

    model = create_model(opt_F)

    current_step = 0
    if resume_path:
        logger.info("Resuming training from epoch: %d, iter: %d.",
                    start_epoch, resume_iter)
        start_epoch, current_step = model.resume_training(resume_path)

    from endosr.metrics import calculate_psnr, ssim_jax
    from endosr.ops.color import bgr2ycbcr  # noqa: F401  (Y-channel option)

    logger.info("Start training from epoch: %d, iter: %d", start_epoch, current_step)
    print_freq = int(opt_F["logger"]["print_freq"])
    val_freq = int(opt_F["train"]["val_freq"])
    save_freq = int(opt_F["logger"]["save_checkpoint_freq"])
    # logger.profile_iter: N — capture a device trace over steps N..N+2
    # into <experiment>/profile (inspect with tools/profile_forward.py
    # --parse-only or TensorBoard). The python tracer is disabled so host
    # events can't evict device events from the trace cap.
    profile_iter = int(opt_F["logger"].get("profile_iter") or 0)
    profile_dir = os.path.join(opt_F["path"]["experiments_root"], "profile")
    trace_active = False

    from endosr.data import prefetch_to_device

    try:
      for epoch in range(start_epoch, total_epochs + 1):
        train_loader.set_epoch(epoch)
        # double-buffered device placement: upcoming batches are device_put
        # with their mesh shardings while the current step runs
        for batch in prefetch_to_device(train_loader, model.mesh):
            current_step += 1
            if current_step > total_iters:
                break

            if profile_iter and rank == 0:
                if current_step == profile_iter:
                    popts = jax.profiler.ProfileOptions()
                    popts.python_tracer_level = 0
                    jax.profiler.start_trace(profile_dir,
                                             profiler_options=popts)
                    trace_active = True
                elif trace_active and current_step >= profile_iter + 3:
                    jax.profiler.stop_trace()
                    trace_active = False
                    logger.info("device trace written to %s", profile_dir)

            model.feed_data(batch)
            model.optimize_parameters(current_step)

            if current_step % print_freq == 0:
                logs = model.get_current_log()
                lr = model.get_current_learning_rate(current_step)
                message = f"<epoch:{epoch:3d}, iter:{current_step:8,d}, lr:{lr:.3e}> "
                for k, v in logs.items():
                    message += f"{k:s}: {v:.4e} "
                    if tb_logger is not None:
                        tb_logger.add_scalar(k, v, current_step)
                if tb_logger is not None:
                    tb_logger.add_scalar("lr", lr, current_step)
                if rank == 0:
                    logger.info(message)

            # validation
            if val_loader is not None and current_step % val_freq == 0 and rank == 0:
                avg_psnr = 0.0
                avg_ssim = 0.0
                idx = 0
                for val_data in val_loader:
                    idx += 1
                    model.feed_data(val_data)
                    model.test()
                    visuals = model.get_current_visuals()
                    sr_img = util.tensor2img(visuals["SR"])
                    gt_img = util.tensor2img(visuals["GT"])
                    img_name = os.path.splitext(
                        os.path.basename(val_data["LQ_path"][0]))[0]
                    img_dir = os.path.join(opt_F["path"]["val_images"], img_name)
                    util.mkdir(img_dir)
                    util.save_img(sr_img, os.path.join(
                        img_dir, f"{img_name}_{current_step}.png"))
                    crop = opt_F["scale"]
                    avg_psnr += calculate_psnr(
                        sr_img[crop:-crop, crop:-crop], gt_img[crop:-crop, crop:-crop]
                    )
                    avg_ssim += float(np.mean(np.asarray(ssim_jax(
                        visuals["SR"][None], visuals["GT"][None]))))
                    # reference validates the full set (codes/train.py:219-271);
                    # val_max_images optionally bounds it for debug runs
                    val_cap = (opt_F["datasets"].get("val") or {}).get(
                        "val_max_images")
                    if val_cap and idx >= int(val_cap):
                        break
                avg_psnr /= max(1, idx)
                avg_ssim /= max(1, idx)
                logger.info("# Validation # PSNR: %.4e SSIM: %.4e", avg_psnr, avg_ssim)
                logging.getLogger("val").info(
                    "<epoch:%3d, iter:%8d> psnr: %.4e ssim: %.4e",
                    epoch, current_step, avg_psnr, avg_ssim)
                if tb_logger is not None:
                    tb_logger.add_scalar("val_psnr", avg_psnr, current_step)
                    tb_logger.add_scalar("val_ssim", avg_ssim, current_step)

            if current_step % save_freq == 0 and rank == 0:
                logger.info("Saving models and training states.")
                model.save(current_step)
                model.save_training_state(epoch, current_step)

        if current_step > total_iters:
            break
    finally:
        # flush a still-open device trace on ANY exit (exception, break at
        # total_iters, epoch exhaustion) so start_trace never leaks
        if trace_active:
            jax.profiler.stop_trace()
            logger.info("device trace written to %s", profile_dir)

    if rank == 0:
        logger.info("Saving the final model.")
        model.save("latest")
        logger.info("End of training.")


if __name__ == "__main__":
    main()
