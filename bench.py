"""Flagship benchmark: frames/sec/chip for DepthNet ×8 inference on Kvasir
shapes (LR 128×128 → SR 1024×1024, batch 1 — the BASELINE.json north-star
config).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

``vs_baseline`` is measured fps divided by 15 fps — our documented estimate
of the reference PyTorch 1.6 DepthNet's single-GPU (V100-class) inference
throughput at this shape; the repo publishes no number (BASELINE.md), so
this anchor is explicit here and can be replaced the moment a real
measurement of the released checkpoint exists. The >10× north-star target
therefore corresponds to vs_baseline ≥ 10.
"""

from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_FPS_ESTIMATE = 15.0


def main():
    import jax
    import jax.numpy as jnp

    from endosr.nn.depthnet import DepthNet

    # bf16 compute for the conv/matmul path; IN statistics and the clamp
    # stay fp32 inside the model (see endosr/nn/layers.py).
    net = DepthNet(
        which_resblk_depth=tuple(range(14)), scale=8,
        depth_latent_ch=256, depth_range_num=10,
        dtype=jnp.bfloat16,
    )

    lr = 128
    rng = np.random.default_rng(0)
    lq = jnp.asarray(rng.random((1, lr, lr, 3), dtype=np.float32))
    depth = jnp.asarray(rng.random((1, lr, lr, 1), dtype=np.float32))
    masks_np = np.zeros((1, lr, lr, 10), np.float32)
    bins = rng.integers(0, 10, (1, lr, lr))
    for k in range(10):
        masks_np[..., k] = bins == k
    masks = jnp.asarray(masks_np)

    params = net.init(jax.random.PRNGKey(0), lq, depth, masks)["params"]

    @jax.jit
    def forward(params, lq, depth, masks):
        return net.apply({"params": params}, lq, depth, masks)

    # warmup / compile
    forward(params, lq, depth, masks).block_until_ready()

    n_iters = 50
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = forward(params, lq, depth, masks)
    out.block_until_ready()
    dt = time.perf_counter() - t0

    fps = n_iters / dt
    print(json.dumps({
        "metric": "frames/sec/chip, DepthNet x8 Kvasir inference (128->1024, bs1)",
        "value": round(fps, 3),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / REFERENCE_FPS_ESTIMATE, 3),
    }))


if __name__ == "__main__":
    main()
