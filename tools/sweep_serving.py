"""Serving-configuration sweep for the ×8 north-star (VERDICT r1 item 1).

One command on the real TPU walks the whole serving-knob space —
batch × {lazy branches + style_chunk} ∪ {monolithic hoist + hoist_chunk} —
for the flagship ×8 inference shape and prints one JSON line per config
plus the best. The knobs (see endosr/nn/depthnet.py):

  lazy_branches  hoist only the shared branch prefixes; per-block second
                 convs/dots run next to their consumers (round-2 default)
  style_chunk    group G blocks' style matmuls into one dot (lazy mode)
  hoist_chunk    group G blocks' full modulation maps (non-lazy mode) —
                 bounds live HBM at large batch

Usage: python tools/sweep_serving.py [--batches 8,16,32] \
           [--style-chunks 2,4,7,13] [--hoist-chunks 0,2,4]
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
    ap.add_argument("--style-chunks", default="2,4,7,13")
    ap.add_argument("--lazy-o-chunks", default="0,2,4")
    ap.add_argument("--hoist-chunks", default="0,2,4")
    ap.add_argument("--lr", type=int, default=128)
    ap.add_argument("--scale", type=int, default=8)
    args = ap.parse_args()

    from endosr.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from endosr.nn.depthnet import DepthNet

    lr = args.lr
    rng = np.random.default_rng(0)
    configs = []
    for sc in [int(c) for c in args.style_chunks.split(",") if c]:
        for oc in [int(c) for c in args.lazy_o_chunks.split(",") if c != ""]:
            configs.append(dict(lazy_branches=True, style_chunk=sc,
                                lazy_o_chunk=oc))
    for hc in [int(c) for c in args.hoist_chunks.split(",") if c != ""]:
        configs.append(dict(lazy_branches=False, hoist_chunk=hc))

    results = []
    for batch in [int(b) for b in args.batches.split(",")]:
        lq = jnp.asarray(rng.random((batch, lr, lr, 3), dtype=np.float32))
        depth = jnp.asarray(rng.random((batch, lr, lr, 1), dtype=np.float32))
        masks_np = np.zeros((batch, lr, lr, 10), np.float32)
        bins = rng.integers(0, 10, (batch, lr, lr))
        for k in range(10):
            masks_np[..., k] = bins == k
        masks = jnp.asarray(masks_np)
        for cfg in configs:
            net = DepthNet(dtype=jnp.bfloat16,
                           which_resblk_depth=tuple(range(14)),
                           scale=args.scale, depth_latent_ch=256,
                           depth_range_num=10, **cfg)
            params = net.init(jax.random.PRNGKey(0), lq, depth, masks)[
                "params"]

            # honest serving step: the SR frame is a root of the jitted
            # program so it MATERIALIZES in HBM every iteration (a pure
            # scalar-reduce consumer lets XLA elide the output layout work,
            # which round-1 sweeps under-counted — see bench.py)
            @jax.jit
            def step(params, lq, depth, masks, acc, net=net):
                out = net.apply({"params": params}, lq + acc * 0.0, depth,
                                masks)
                return out, acc + jnp.sum(out[:, ::64, ::64, :]) * 1e-12

            def run(n):
                acc = jnp.float32(0.0)
                t0 = time.perf_counter()
                for _ in range(n):
                    _, acc = step(params, lq, depth, masks, acc)
                v = jax.device_get(acc)
                assert np.isfinite(v)
                return time.perf_counter() - t0

            try:
                run(2)
                n1, n2 = 3, 23 if batch <= 8 else 13
                t1 = min(run(n1) for _ in range(3))
                t2 = min(run(n2) for _ in range(3))
                per_step = (t2 - t1) / (n2 - n1)
                rec = {"batch": batch, **cfg,
                       "fps_per_chip": round(batch / per_step, 2),
                       "ms": round(per_step * 1e3, 2)}
            except Exception as e:  # OOM at large batch is informative too
                rec = {"batch": batch, **cfg, "error": repr(e)[:200]}
            print(json.dumps(rec), flush=True)
            results.append(rec)
    best = max((r for r in results if "fps_per_chip" in r),
               key=lambda r: r["fps_per_chip"], default=None)
    print(json.dumps({"best": best}), flush=True)


if __name__ == "__main__":
    main()
