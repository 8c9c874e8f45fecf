"""Per-component device timing for the flagship forward (dev tool).

Uses the chained difference-quotient method from bench.py on isolated ops to
find where the milliseconds go. Run on the TPU: python tools/bench_breakdown.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timer(fn, args, n1=5, n2=25, reps=3):
    import jax

    @__import__("jax").jit
    def chained(acc, *a):
        out = fn(*(x + (acc * 0).astype(x.dtype) if i == 0 else x
                   for i, x in enumerate(a)))
        leaf = jax.tree_util.tree_leaves(out)[0]
        return acc + jnp.mean(leaf.astype(jnp.float32)) * 1e-12

    import jax.numpy as jnp

    def run(n):
        acc = jnp.float32(0.0)
        t0 = time.perf_counter()
        for _ in range(n):
            acc = chained(acc, *args)
        jax.device_get(acc)
        return time.perf_counter() - t0

    run(2)
    t1 = min(run(n1) for _ in range(reps))
    t2 = min(run(n2) for _ in range(reps))
    return (t2 - t1) / (n2 - n1)


def main():
    import jax
    import jax.numpy as jnp

    global_dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    B = 8

    def arr(*shape):
        return jnp.asarray(rng.random(shape, dtype=np.float32), global_dtype)

    results = {}

    # 3x3 conv 64->64 @128^2 (the trunk conv) x26
    w = arr(3, 3, 64, 64)
    x = arr(B, 128, 128, 64)
    conv = lambda x, w: jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    results["conv3x3_64_128sq (x1)"] = timer(lambda x: conv(x, w), (x,))

    # SEAN o-branch: conv1->128 + 2x conv128->64
    wm = arr(3, 3, 1, 128)
    wo = arr(3, 3, 128, 64)
    d = arr(B, 128, 128, 1)
    def o_branch(d):
        a = jax.nn.relu(conv(d, wm))
        return conv(a, wo), conv(a, wo)
    results["sean_o_branch (x1)"] = timer(o_branch, (d,))

    # style grouped conv: feature_group_count=B, 10ch -> 128
    v = arr(3, 3, 10, B * 128)
    mask = arr(1, 128, 128, B * 10)
    def style(mask):
        return jax.lax.conv_general_dilated(
            mask, v, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=B)
    results["style_maskconv (x1)"] = timer(style, (mask,))

    # instance norm fp32 @128^2x64
    from endosr.nn.layers import instance_norm
    results["instance_norm (x1)"] = timer(instance_norm, (x,))

    # upscale tail convs
    x256 = arr(B, 256, 256, 64)
    w256 = arr(3, 3, 64, 128)
    results["conv3x3_64_256sq->128"] = timer(lambda x: conv(x, w256), (x256,))
    x512 = arr(B, 512, 512, 32)
    w512 = arr(3, 3, 32, 128)
    results["conv3x3_32_512sq->128"] = timer(lambda x: conv(x, w512), (x512,))
    x1024 = arr(B, 1024, 1024, 32)
    w9 = arr(9, 9, 32, 3)
    conv9 = lambda x: jax.lax.conv_general_dilated(
        x, w9, (1, 1), [(4, 4), (4, 4)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    results["conv9x9_32->3_1024sq"] = timer(conv9, (x1024,))

    from endosr.nn.layers import pixel_shuffle
    x_ps = arr(B, 512, 512, 128)
    results["pixel_shuffle_512sq"] = timer(lambda x: pixel_shuffle(x, 2), (x_ps,))

    # full forward for reference
    from endosr.nn.depthnet import DepthNet

    net = DepthNet(which_resblk_depth=tuple(range(14)), scale=8,
                   depth_latent_ch=256, dtype=global_dtype)
    lq = arr(B, 128, 128, 3).astype(jnp.float32)
    dep = arr(B, 128, 128, 1).astype(jnp.float32)
    mk = (np.asarray(rng.random((B, 128, 128, 10))) > 0.9).astype(np.float32)
    mk = jnp.asarray(mk)
    params = net.init(jax.random.PRNGKey(0), lq, dep, mk)["params"]
    results["FULL forward"] = timer(
        lambda lq: net.apply({"params": params}, lq, dep, mk), (lq,),
        n1=3, n2=13)

    for k, v_ in results.items():
        print(f"{k:32s} {v_ * 1e3:8.3f} ms")


if __name__ == "__main__":
    main()


def kernels_ab():
    """A/B the Pallas kernels against their XLA twins on the real chip."""
    import time

    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    def timer1(fn, args, n1=5, n2=30):
        @jax.jit
        def step(acc, *a):
            out = fn(*(x + (acc * 0).astype(x.dtype) if i == 0 else x
                       for i, x in enumerate(a)))
            return acc + jnp.sum(out.ravel()[:2].astype(jnp.float32)) * 1e-12

        def run(n):
            acc = jnp.float32(0.0)
            t0 = time.perf_counter()
            for _ in range(n):
                acc = step(acc, *args)
            jax.device_get(acc)
            return time.perf_counter() - t0

        run(2)
        t1 = min(run(n1) for _ in range(3))
        t2 = min(run(n2) for _ in range(3))
        return (t2 - t1) / (n2 - n1) * 1e3

    # fused modulation kernel vs its XLA twin (kernel is OFF by default:
    # XLA's grouped-conv schedule wins the production two-hoist form)
    from endosr.kernels.fused_mod import (
        _pallas_forward, fused_modulation_reference)

    B, H, W, K, N, C2 = 8, 128, 128, 10, 26, 128
    f = lambda *s: jnp.asarray(rng.random(s, dtype=np.float32) - 0.5, dt)
    args = (jnp.asarray(rng.random((B, H, W, 1), np.float32), dt),
            jnp.asarray((rng.random((B, H, W, K)) > 0.7).astype(np.float32), dt),
            f(N, 9, C2), f(N, C2), f(N, 9 * C2, C2), f(B, N, 9 * K, C2),
            f(N, C2))
    print(f"fused_mod pallas       {timer1(_pallas_forward, args):8.3f} ms")
    print(f"fused_mod xla twin     {timer1(fused_modulation_reference, args):8.3f} ms")

    # output stage kernel (ON by default): isolated timing is misleading —
    # a reduction consumer lets XLA elide the twin's layout copies entirely —
    # so A/B the full flagship forward with the output actually materialized
    # (two jits: forward, then a separate reducer).
    from endosr.nn.depthnet import DepthNet

    lq = jnp.asarray(rng.random((8, 128, 128, 3), np.float32))
    dep = jnp.asarray(rng.random((8, 128, 128, 1), np.float32))
    mk = jnp.asarray((rng.random((8, 128, 128, 10)) > 0.9).astype(np.float32))

    def net_ab(pallas_out):
        net = DepthNet(which_resblk_depth=tuple(range(14)), scale=8,
                       depth_latent_ch=256, depth_range_num=10,
                       dtype=jnp.bfloat16, pallas_output=pallas_out)
        params = net.init(jax.random.PRNGKey(0), lq, dep, mk)["params"]
        fwd = jax.jit(lambda p, x: net.apply({"params": p}, x, dep, mk))
        reduce = jax.jit(lambda out, acc: acc + jnp.mean(out) * 1e-12)

        def run(n):
            acc = jnp.float32(0.0)
            t0 = time.perf_counter()
            for _ in range(n):
                acc = reduce(fwd(params, lq + acc * 0.0), acc)
            jax.device_get(acc)
            return time.perf_counter() - t0

        run(2)
        t1 = min(run(5) for _ in range(3))
        t2 = min(run(30) for _ in range(3))
        return (t2 - t1) / 25 * 1e3

    print(f"fwd+materialize pallas output {net_ab(True):8.3f} ms")
    print(f"fwd+materialize xla output    {net_ab(False):8.3f} ms")


if __name__ == "__main__" and os.environ.get("BENCH_KERNELS"):
    kernels_ab()
