"""Dump the optimized HLO of the flagship ×8 serving step (dev tool).

Compilation happens server-side through the axon tunnel, so local
XLA_FLAGS dumps don't work; ``.compile().as_text()`` fetches the
optimized module instead. The text makes fusion bodies inspectable
offline (profile_fusions only shows each fusion's root).

Usage: python tools/dump_hlo.py [out.hlo] [batch]
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/flagship_x8.hlo"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from endosr.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from endosr.nn.depthnet import DepthNet

    lr = 128
    rng = np.random.default_rng(0)
    lq = jnp.asarray(rng.random((batch, lr, lr, 3), dtype=np.float32))
    depth = jnp.asarray(rng.random((batch, lr, lr, 1), dtype=np.float32))
    masks_np = np.zeros((batch, lr, lr, 10), np.float32)
    bins = rng.integers(0, 10, (batch, lr, lr))
    for k in range(10):
        masks_np[..., k] = bins == k
    masks = jnp.asarray(masks_np)

    extra = json.loads(os.environ.get("NET_KW", "{}"))
    net = DepthNet(dtype=jnp.bfloat16, which_resblk_depth=tuple(range(14)),
                   scale=8, depth_latent_ch=256, depth_range_num=10, **extra)
    params = net.init(jax.random.PRNGKey(0), lq, depth, masks)["params"]

    @jax.jit
    def step(params, lq, depth, masks, acc):
        out = net.apply({"params": params}, lq + acc * 0.0, depth, masks)
        return out, acc + jnp.sum(out[:, ::64, ::64, :]) * 1e-12

    txt = step.lower(params, lq, depth, masks,
                     jnp.float32(0.0)).compile().as_text()
    with open(out_path, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)} bytes to {out_path}")


if __name__ == "__main__":
    main()
