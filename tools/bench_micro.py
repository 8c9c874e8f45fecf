"""Micro-benchmarks for TPU implementation choices (dev tool, ad hoc).

Compares candidate lowerings for the SEAN o-branch and the folded tail on
the attached chip with the chained difference-quotient timer.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timer(fn, args, n1=5, n2=25, reps=3):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(acc, *a):
        out = fn(*(x + (acc * 0).astype(x.dtype) if i == 0 else x
                   for i, x in enumerate(a)))
        leaf = jax.tree_util.tree_leaves(out)[0]
        return acc + jnp.mean(leaf.astype(jnp.float32)) * 1e-12

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

    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    B, H, W = 8, 128, 128
    N, C2 = 26, 128  # instances, 2C

    def arr(*shape):
        return jnp.asarray(rng.random(shape, dtype=np.float32), dt)

    conv = lambda x, w, g=1: jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=g)

    d = arr(B, H, W, 1)
    wm_wide = arr(3, 3, 1, N * C2)
    w2_grp = arr(3, 3, C2, N * C2)
    res = {}

    # A: wide conv1 (current)
    res["o1: wide conv 1->3328"] = timer(lambda d: conv(d, wm_wide), (d,))

    # B: 9-shift matmul conv1
    wm_mat = wm_wide.reshape(9, N * C2)
    def o1_mat(d):
        dp = jnp.pad(d, ((0, 0), (1, 1), (1, 1), (0, 0)))
        d9 = jnp.concatenate(
            [dp[:, y:y + H, x:x + W, :] for y in range(3) for x in range(3)],
            axis=-1)
        return jax.nn.relu(jnp.einsum("bhwt,tn->bhwn", d9, wm_mat))
    res["o1: 9-shift matmul"] = timer(o1_mat, (d,))

    # conv2 candidates on the [B,H,W,N*C2] activation
    actv = jnp.asarray(rng.random((B, H, W, N * C2), np.float32), dt)
    res["o2: grouped conv g=26"] = timer(lambda a: conv(a, w2_grp, N), (actv,))

    w2_sep = [arr(3, 3, C2, C2) for _ in range(N)]
    def o2_sep(a):
        outs = [conv(a[..., i * C2:(i + 1) * C2], w2_sep[i]) for i in range(N)]
        return jnp.concatenate(outs, -1)
    res["o2: 26 separate convs"] = timer(o2_sep, (actv,))

    w2_stk = arr(N, 3, 3, C2, C2)
    def o2_vmap(a):
        a5 = a.reshape(B, H, W, N, C2).transpose(3, 0, 1, 2, 4)
        return jax.vmap(lambda ai, wi: conv(ai, wi))(a5, w2_stk)
    res["o2: vmap conv"] = timer(o2_vmap, (actv,))

    # whole o-branch fused alternatives
    def o_full_cur(d):
        a = jax.nn.relu(conv(d, wm_wide))
        return conv(a, w2_grp, N)
    res["o: wideconv+grouped (current)"] = timer(o_full_cur, (d,))

    def o_full_mat(d):
        a = o1_mat(d)
        return conv(a, w2_grp, N)
    res["o: matmul+grouped"] = timer(o_full_mat, (d,))

    # tail candidates: conv 32->32 @512^2 vs folded 128->128 @256^2
    x512 = arr(B, 512, 512, 32)
    w32 = arr(3, 3, 32, 32)
    res["tail: conv 32->32 @512^2"] = timer(lambda x: conv(x, w32), (x512,))
    x256 = arr(B, 256, 256, 128)
    w128 = arr(3, 3, 128, 128)
    res["tail: conv 128->128 @256^2"] = timer(lambda x: conv(x, w128), (x256,))
    x128 = arr(B, 128, 128, 512)
    w512c = arr(3, 3, 512, 512)
    res["tail: conv 512->512 @128^2"] = timer(lambda x: conv(x, w512c), (x128,))
    # upscale3_0 folded: 512->2048 @128^2 vs 32->128 @512^2
    w2048 = arr(3, 3, 512, 2048)
    res["tail: conv 512->2048 @128^2"] = timer(lambda x: conv(x, w2048), (x128,))
    wu3 = arr(3, 3, 32, 128)
    res["tail: conv 32->128 @512^2"] = timer(lambda x: conv(x, wu3), (x512,))
    # folded head: 3x3 2048->192 @128^2 vs 5x5 128->12 @512^2
    x128w = arr(B, 128, 128, 2048)
    wh = arr(3, 3, 2048, 192)
    res["head: conv 2048->192 @128^2"] = timer(lambda x: conv(x, wh), (x128w,))
    x512w = arr(B, 512, 512, 128)
    wh5 = jnp.asarray(rng.random((5, 5, 128, 12), np.float32), dt)
    conv5 = lambda x: jax.lax.conv_general_dilated(
        x, wh5, (1, 1), [(2, 2), (2, 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    res["head: conv5x5 128->12 @512^2"] = timer(conv5, (x512w,))

    for k, v in res.items():
        print(f"{k:34s} {v * 1e3:8.3f} ms")


if __name__ == "__main__":
    main()
