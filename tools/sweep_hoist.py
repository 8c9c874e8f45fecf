"""Sweep hoist_chunk x batch for DepthNet x8 inference on the real TPU.

For VERDICT r1 item 1(a): at bs>=16 the single-shot hoisted modulation maps
([B,H,W,26*128] >= 1.7 GB) defeat HBM locality and fps/chip regresses.
hoist_chunk=G keeps only one group of G blocks' maps live at a time.

Usage: python tools/sweep_hoist.py [--batches 8,16,32] [--chunks 0,2,4]
Prints one JSON line per config: {"batch", "chunk", "fps_per_chip", "ms"}.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="8,16,32")
    ap.add_argument("--chunks", default="0,2,4")
    ap.add_argument("--lr", type=int, default=128)
    args = ap.parse_args()

    from endosr.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from endosr.nn.depthnet import DepthNet

    lr = args.lr
    rng = np.random.default_rng(0)
    results = []
    for batch in [int(b) for b in args.batches.split(",")]:
        lq = jnp.asarray(rng.random((batch, lr, lr, 3), dtype=np.float32))
        depth = jnp.asarray(rng.random((batch, lr, lr, 1), dtype=np.float32))
        masks_np = np.zeros((batch, lr, lr, 10), np.float32)
        bins = rng.integers(0, 10, (batch, lr, lr))
        for k in range(10):
            masks_np[..., k] = bins == k
        masks = jnp.asarray(masks_np)
        for chunk in [int(c) for c in args.chunks.split(",")]:
            net = DepthNet(dtype=jnp.bfloat16, hoist_chunk=chunk,
                           which_resblk_depth=tuple(range(14)), scale=8,
                           depth_latent_ch=256, depth_range_num=10)
            params = net.init(jax.random.PRNGKey(0), lq, depth, masks)["params"]

            @jax.jit
            def step(params, lq, depth, masks, acc):
                out = net.apply({"params": params}, lq + acc * 0.0, depth,
                                masks)
                return acc + jnp.mean(out) * 1e-12

            def run(n):
                acc = jnp.float32(0.0)
                t0 = time.perf_counter()
                for _ in range(n):
                    acc = step(params, lq, depth, masks, acc)
                v = jax.device_get(acc)
                assert np.isfinite(v)
                return time.perf_counter() - t0

            try:
                run(2)
                n1, n2 = 3, 23 if batch <= 8 else 13
                t1 = min(run(n1) for _ in range(3))
                t2 = min(run(n2) for _ in range(3))
                per_step = (t2 - t1) / (n2 - n1)
                rec = {"batch": batch, "chunk": chunk,
                       "fps_per_chip": round(batch / per_step, 2),
                       "ms": round(per_step * 1e3, 2)}
            except Exception as e:  # OOM at large batch is informative too
                rec = {"batch": batch, "chunk": chunk,
                       "error": repr(e)[:200]}
            print(json.dumps(rec), flush=True)
            results.append(rec)
    best = max((r for r in results if "fps_per_chip" in r),
               key=lambda r: r["fps_per_chip"], default=None)
    print(json.dumps({"best": best}), flush=True)


if __name__ == "__main__":
    main()
