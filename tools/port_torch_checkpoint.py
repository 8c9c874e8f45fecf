"""CLI: port a released torch ``.pth`` generator checkpoint to a flax ``.ckpt``.

Usage:
    python tools/port_torch_checkpoint.py \
        --pth latest_G.pth --opt options/test/test_depthNet.yml --out latest_G.ckpt

Builds the generator from the YAML, ports the state dict through
``endosr.utils.port_torch``, verifies every parameter was mapped, and writes
the msgpack checkpoint that ``pretrain_model_G`` can point at.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pth", required=True)
    ap.add_argument("--opt", required=True, help="train or test YAML")
    ap.add_argument("--out", required=True)
    ap.add_argument("--is_train", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from endosr.config import options as option
    from endosr.nn import networks
    from endosr.utils.checkpoint import save_pytree
    from endosr.utils.port_torch import load_torch_state_dict, port_state_dict

    opt = option.dict_to_nonedict(option.parse(args.opt, is_train=args.is_train))
    net = networks.define_G(opt)

    ds = next(iter(opt["datasets"].values()))
    lr = ds.get("LR_size") or 32
    mask_num = ds.get("depthMaskNum") or 10
    dummy = [jnp.zeros((1, lr, lr, 3), jnp.float32)]
    if opt["network_G"]["which_model_G"] == "DepthNet":
        dummy += [jnp.zeros((1, lr, lr, 1), jnp.float32),
                  jnp.zeros((1, lr, lr, mask_num), jnp.float32)]
    params = net.init(jax.random.PRNGKey(0), *dummy)["params"]

    sd = load_torch_state_dict(args.pth)
    ported = port_state_dict(sd, params, strict=True)
    save_pytree(ported, args.out)
    n = sum(1 for _ in jax.tree_util.tree_leaves(ported))
    print(f"ported {n} tensors → {args.out}")


if __name__ == "__main__":
    main()
