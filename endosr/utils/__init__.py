from endosr.utils.misc import (
    Timer,
    get_timestamp,
    img2tensor,
    mkdir,
    mkdir_and_rename,
    mkdirs,
    save_img,
    set_random_seed,
    setup_logger,
    tensor2img,
)

__all__ = [
    "Timer",
    "get_timestamp",
    "img2tensor",
    "mkdir",
    "mkdir_and_rename",
    "mkdirs",
    "save_img",
    "set_random_seed",
    "setup_logger",
    "tensor2img",
]
