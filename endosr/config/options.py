"""YAML option system — schema-compatible with the reference.

Twin of ``codes/options/options.py``: ordered-YAML parse, scale/phase
propagation into dataset blocks, data-type autodetect, experiment directory
layout with archive-on-collision, debug-mode overrides, ``NoneDict``
missing-key→None semantics, and ``check_resume`` path rewriting.

Differences from the reference (deliberate):
  * no ``CUDA_VISIBLE_DEVICES`` mangling — device selection is JAX's
  * ``gpu_ids`` is accepted and ignored (TPU chips come from ``jax.devices()``)
"""

from __future__ import annotations

import logging
import os
import os.path as osp
from collections import OrderedDict

import yaml

__all__ = ["parse", "dict2str", "NoneDict", "dict_to_nonedict", "check_resume",
           "ordered_yaml"]

logger = logging.getLogger("base")


def ordered_yaml():
    """Ordered-mapping YAML Loader/Dumper (``utils/util.py:32-44``)."""
    try:
        from yaml import CDumper as Dumper
        from yaml import CLoader as Loader
    except ImportError:
        from yaml import Dumper, Loader

    _mapping_tag = yaml.resolver.BaseResolver.DEFAULT_MAPPING_TAG

    def dict_representer(dumper, data):
        return dumper.represent_dict(data.items())

    def dict_constructor(loader, node):
        return OrderedDict(loader.construct_pairs(node))

    Dumper.add_representer(OrderedDict, dict_representer)
    Loader.add_constructor(_mapping_tag, dict_constructor)
    return Loader, Dumper


def parse(opt_path: str, is_train: bool = True, root: str | None = None) -> dict:
    """Parse a train/test YAML into the option dict (``options.py:12-81``)."""
    with open(opt_path, mode="r") as f:
        loader, _ = ordered_yaml()
        opt = yaml.load(f, Loader=loader)

    opt["is_train"] = is_train
    scale = opt.get("scale")

    # datasets: propagate phase/scale, expand paths, autodetect data_type
    for phase, dataset in (opt.get("datasets") or {}).items():
        phase = phase.split("_")[0]
        dataset["phase"] = phase
        dataset["scale"] = scale
        is_lmdb = False
        for key in ("dataroot_GT", "dataroot_LQ"):
            if dataset.get(key) is not None:
                dataset[key] = osp.expanduser(dataset[key])
                if dataset[key].endswith("lmdb"):
                    is_lmdb = True
        dataset["data_type"] = "lmdb" if is_lmdb else "img"
        if dataset.get("mode", "").endswith("mc"):
            dataset["data_type"] = "mc"
            dataset["mode"] = dataset["mode"].replace("_mc", "")

    # paths
    opt.setdefault("path", {})
    for key, path in list(opt["path"].items()):
        if path and ("resume" in key or "pretrain" in key or "root" in key):
            opt["path"][key] = osp.expanduser(path)
    if root is None:
        # the YAML may pin the workspace root (path.root); otherwise the
        # repo root, like the reference (``options/options.py:49-51``)
        root = opt["path"].get("root") or osp.abspath(
            osp.join(osp.dirname(osp.abspath(__file__)), "..", ".."))
    opt["path"]["root"] = root

    if is_train:
        experiments_root = osp.join(root, "experiments", opt["name"])
        opt["path"]["experiments_root"] = experiments_root
        opt["path"]["models"] = osp.join(experiments_root, "models")
        opt["path"]["training_state"] = osp.join(experiments_root, "training_state")
        opt["path"]["log"] = experiments_root
        opt["path"]["val_images"] = osp.join(experiments_root, "val_images")

        # debug mode: fast feedback overrides (``options.py:68-71``)
        if "debug" in opt["name"]:
            opt["train"]["val_freq"] = 8
            opt["logger"]["print_freq"] = 1
            opt["logger"]["save_checkpoint_freq"] = 8
    else:
        results_root = osp.join(root, "results", opt["name"])
        opt["path"]["results_root"] = results_root
        opt["path"]["log"] = results_root

    # network scale propagation
    if "network_G" in opt and opt["network_G"] is not None:
        opt["network_G"]["scale"] = scale

    return opt


def dict2str(opt: dict, indent_l: int = 1) -> str:
    """Dict → readable string (``options.py:84-95``)."""
    msg = ""
    for k, v in opt.items():
        if isinstance(v, dict):
            msg += " " * (indent_l * 2) + k + ":[\n"
            msg += dict2str(v, indent_l + 1)
            msg += " " * (indent_l * 2) + "]\n"
        else:
            msg += " " * (indent_l * 2) + k + ": " + str(v) + "\n"
    return msg


class NoneDict(dict):
    """dict whose missing keys read as None (``options.py:97-100``)."""

    def __missing__(self, key):
        return None


def dict_to_nonedict(opt):
    """Recursively convert to NoneDict (``options.py:103-112``)."""
    if isinstance(opt, dict):
        new_opt = {key: dict_to_nonedict(sub_opt) for key, sub_opt in opt.items()}
        return NoneDict(**new_opt)
    if isinstance(opt, list):
        return [dict_to_nonedict(sub_opt) for sub_opt in opt]
    return opt


def resolve_resume_state(opt: dict):
    """Resolve ``path.resume_state``, expanding the ``auto`` convenience.

    ``resume_state: auto`` picks the newest ``<iter>.state`` in the
    experiment's ``training_state`` dir (no-op on a fresh run) — the
    crash-recovery restart loop the reference lacks (its resume is a
    manual path, ``codes/options/options.py:115-129``). Returns the
    resolved path (or None) and writes it back into the opt dict.
    """
    resume_path = opt["path"].get("resume_state")
    if resume_path == "auto":
        state_dir = opt["path"].get("training_state") or osp.join(
            opt["path"]["experiments_root"], "training_state")
        states = sorted(
            (f for f in os.listdir(state_dir) if f.endswith(".state")
             and f.split(".")[0].isdigit()),
            key=lambda f: int(f.split(".")[0]),
        ) if osp.isdir(state_dir) else []
        resume_path = osp.join(state_dir, states[-1]) if states else None
        opt["path"]["resume_state"] = resume_path
    return resume_path


def check_resume(opt: dict, resume_iter: int) -> None:
    """Rewrite pretrain paths when resuming (``options.py:115-129``)."""
    if opt["path"].get("resume_state"):
        if opt["path"].get("pretrain_model_G") or opt["path"].get("pretrain_model_D"):
            logger.warning(
                "pretrain_model path will be ignored when resuming training."
            )
        opt["path"]["pretrain_model_G"] = osp.join(
            opt["path"]["models"], f"{resume_iter}_G.ckpt"
        )
        logger.info("Set [pretrain_model_G] to %s", opt["path"]["pretrain_model_G"])
        if "gan" in opt.get("model", ""):
            opt["path"]["pretrain_model_D"] = osp.join(
                opt["path"]["models"], f"{resume_iter}_D.ckpt"
            )
            logger.info("Set [pretrain_model_D] to %s", opt["path"]["pretrain_model_D"])


def setup_experiment_dirs(opt: dict) -> None:
    """Create the experiment tree, archiving an existing one (``options.py:52-66``)."""
    from endosr.utils.misc import mkdir_and_rename, mkdirs

    if opt["is_train"]:
        if not opt["path"].get("resume_state"):
            mkdir_and_rename(opt["path"]["experiments_root"])
        mkdirs(
            path for key, path in opt["path"].items()
            if key not in ("experiments_root", "root", "pretrain_model_G",
                           "pretrain_model_D", "resume_state", "strict_load")
            and isinstance(path, str)
        )
    else:
        mkdir_and_rename(opt["path"]["results_root"])
