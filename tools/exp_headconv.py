"""Isolated A/B of the ×8 packed-tail HEAD conv (dev tool).

profile_fusions attributes 3.2 ms/step (24% MFU) to the folded-head conv
``[8,257,257,512] ⊛ [3,3,512,64] → [8,256,256,64]`` (fusion.162) while the
neighbouring 2×2 packed conv runs at 95% MFU. Candidate explanations:
the gate·leaky producer fused into the conv (recomputed per window tap),
the 64-lane output (half the MXU lanes), or window re-reads.

Each variant runs in THIS process (callers isolate variants via
``--variant``) with the chained-difference-quotient timing of bench.py.

Variants:
  prodfused   leaky+gate producer feeding the conv (mirrors the model graph)
  barrier     same, with an optimization_barrier before the head conv
  plain       conv on a materialized input (conv-only roofline)
  out128      plain with 128 output channels (full output lanes)
  hwnc        plain emitting HWNC (conv-natural bytes, no relayout)
  prodbar128  barrier + 128 output channels

Usage: python tools/exp_headconv.py [--variant NAME] [--batch 8]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build(variant, batch, n):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    g3 = jnp.asarray(rng.standard_normal((batch, n + 1, n + 1, 128)),
                     dt) * 0.1
    w2 = jnp.asarray(rng.standard_normal((2, 2, 128, 512)), dt) * 0.05
    b2 = jnp.asarray(rng.standard_normal((512,)), dt) * 0.1
    cout = 128 if variant in ("out128", "prodbar128") else 64
    wh = jnp.asarray(rng.standard_normal((3, 3, 512, cout)), dt) * 0.05
    bh = jnp.asarray(rng.standard_normal((cout,)), dt) * 0.1
    row = jnp.asarray((np.arange(n + 1) < n), dt)
    g4m = jnp.asarray(
        rng.standard_normal((batch, n + 1, n + 1, 512)), dt) * 0.1

    def producer(x):
        g4 = jax.lax.conv_general_dilated(
            x, w2, (1, 1), [(0, 1), (0, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b2
        g4 = jnp.maximum(g4, 0.1 * g4)
        return g4 * row[None, :, None, None] * row[None, None, :, None]

    def head(g4, dl="NHWC"):
        return jax.lax.conv_general_dilated(
            g4, wh, (1, 1), [(1, 0), (1, 0)],
            dimension_numbers=("NHWC", "HWIO", dl)) + bh

    if variant == "prodfused":
        f = lambda x: head(producer(x))  # noqa: E731
        arg = g3
    elif variant in ("barrier", "prodbar128"):
        def f(x):
            g4 = jax.lax.optimization_barrier(producer(x))
            return head(g4)
        arg = g3
    elif variant == "plain":
        f, arg = lambda x: head(x), g4m
    elif variant == "out128":
        f, arg = lambda x: head(x), g4m
    elif variant == "hwnc":
        f, arg = lambda x: head(x, "HWNC"), g4m
    elif variant == "producer":
        f, arg = producer, g3
    else:
        raise SystemExit(f"unknown variant {variant}")
    return f, arg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="plain")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n", type=int, default=256)
    args = ap.parse_args()

    from endosr.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    f, arg = build(args.variant, args.batch, args.n)

    @jax.jit
    def step(x, acc):
        y = f(x + (acc * 0).astype(x.dtype))
        return acc + jnp.sum(y[:, ::64, ::64].astype(jnp.float32)) * 1e-12

    t0 = time.time()
    acc = jnp.float32(0.0)
    for _ in range(3):
        acc = step(arg, acc)
    assert np.isfinite(jax.device_get(acc))
    compile_s = time.time() - t0

    def run(n):
        a = jnp.float32(0.0)
        t = time.perf_counter()
        for _ in range(n):
            a = step(arg, a)
        jax.device_get(a)
        return time.perf_counter() - t

    t1 = min(run(3) for _ in range(3))
    t2 = min(run(23) for _ in range(3))
    print(json.dumps({"variant": args.variant, "batch": args.batch,
                      "ms": round((t2 - t1) / 20 * 1e3, 3),
                      "compile_s": round(compile_s, 1)}), flush=True)


if __name__ == "__main__":
    main()
