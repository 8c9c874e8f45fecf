"""Isolated A/B of style-dot Pallas kernel variants (dev tool).

The shipped kernel (endosr/kernels/style_dot.py) emits conv-layout bytes
but its per-batch-item sublane-masked stores run at 27% of the HBM write
roofline (890 µs vs ~350 µs at [8,128,128,90]×[8,90,1024]). Variants:

  loop     shipped kernel (per-b dot + masked store)
  batched  one batched dot + in-VMEM [B,TH,W,M]→[TH,W,B,M] transpose
  einsum   XLA einsum + relayout copy (the pre-kernel baseline)

Each runs in THIS process; isolate variants via --variant so one
pathological Mosaic compile can't take down the rest.

Usage: python tools/exp_styledot.py --variant batched [--th 8] [--mblk 256]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def make_kernel(variant, B, H, W, J, M, TH, MBLK):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern_loop(s_ref, v_ref, o_ref):
        b, th, w = s_ref.shape[0], s_ref.shape[1], s_ref.shape[2]
        for bb in range(b):
            flat = s_ref[bb].reshape(th * w, s_ref.shape[3])
            y = jax.lax.dot_general(
                flat, v_ref[bb],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(o_ref.dtype)
            o_ref[:, :, bb, :] = y.reshape(th, w, v_ref.shape[2])

    def kern_batched(s_ref, v_ref, o_ref):
        b, th, w, j = s_ref.shape
        y = jax.lax.dot_general(
            s_ref[...].reshape(b, th * w, j), v_ref[...],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        o_ref[...] = jnp.transpose(
            y.reshape(b, th, w, -1).astype(o_ref.dtype), (1, 2, 0, 3))

    kern = {"loop": kern_loop, "batched": kern_batched}[variant]
    return pl.pallas_call(
        kern, grid=(H // TH, M // MBLK),
        in_specs=[
            pl.BlockSpec((B, TH, W, J), lambda hh, mm: (0, hh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, J, MBLK), lambda hh, mm: (0, 0, mm),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TH, W, B, MBLK),
                               lambda hh, mm: (hh, 0, 0, mm),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, W, B, M), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="batched")
    ap.add_argument("--th", type=int, default=8)
    ap.add_argument("--mblk", type=int, default=256)
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()

    from endosr.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    B, H, W, J, M = 8, 128, 128, 90, 1024
    rng = np.random.default_rng(0)
    s = jnp.asarray(rng.standard_normal((B, H, W, J)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, J, M)), jnp.bfloat16)

    if args.variant == "einsum":
        fn = lambda a, b: jnp.transpose(  # noqa: E731
            jnp.einsum("bhwj,bjm->bhwm", a, b), (1, 2, 0, 3))
    else:
        call = make_kernel(args.variant, B, H, W, J, M, args.th, args.mblk)
        fn = lambda a, b: call(a, b)  # noqa: E731

    t0 = time.time()
    if args.check:
        @jax.jit
        def chk(a, b):
            d = fn(a, b).astype(jnp.float32) - jnp.einsum(
                "bhwj,bjm->hwbm", a.astype(jnp.float32),
                b.astype(jnp.float32))
            return jnp.max(jnp.abs(d))
        err = float(chk(s, v))
    else:
        err = None

    @jax.jit
    def step(a, b, acc):
        o = fn(a + (acc * 0).astype(a.dtype), b)
        return acc + jnp.sum(o[::64, ::64].astype(jnp.float32)) * 1e-12

    acc = jnp.float32(0.0)
    for _ in range(3):
        acc = step(s, v, acc)
    assert np.isfinite(jax.device_get(acc))
    compile_s = time.time() - t0

    def run(n):
        a = jnp.float32(0.0)
        t = time.perf_counter()
        for _ in range(n):
            a = step(s, v, a)
        jax.device_get(a)
        return time.perf_counter() - t

    t1 = min(run(3) for _ in range(3))
    t2 = min(run(23) for _ in range(3))
    print(json.dumps({"variant": args.variant, "th": args.th,
                      "mblk": args.mblk, "err": err,
                      "ms": round((t2 - t1) / 20 * 1e3, 3),
                      "compile_s": round(compile_s, 1)}), flush=True)


if __name__ == "__main__":
    main()
