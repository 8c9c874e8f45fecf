"""Measure the reference PyTorch DepthNet's throughput on this host.

Round 1 divided the TPU fps by an invented 15 fps "reference GPU estimate".
This tool replaces that with a measurement + documented extrapolation:

1. Runs the reference torch DepthNet (``/root/reference/codes/models/
   modules/sftmd_arch.py``, random init, eval, fp32 — the repo publishes no
   benchmarks and its checkpoint is an external download) at the flagship
   Kvasir ×8 shape (LR 128² → SR 1024²) on this host's CPU.
2. Runs our JAX DepthNet on the same CPU for an apples-to-apples host
   number.
3. Derives a documented reference-GPU estimate: the reference targets
   2× V100-class CUDA GPUs (torch 1.6, ``requirements.txt``). Per-frame
   work is ~0.24 TFLOP (fp32). A V100 peaks at 15.7 TF/s fp32; cuDNN convs
   at 32–128 channels typically reach 25–50% of that, giving 16–33 fps per
   GPU. We publish the optimistic end (33 fps/GPU) as the denominator so
   ``vs_baseline`` understates rather than flatters the TPU result, and we
   record the CPU measurements that anchor the efficiency assumption.

Writes ``BASELINE_MEASURED.json`` at the repo root; ``bench.py`` consumes it.
"""

from __future__ import annotations

import json
import os
import platform
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

LR, SCALE, ITERS = 128, 8, 3
FLOP_PER_FRAME = 0.24e12  # fp32 reference math (no fold densification)
V100_FP32_PEAK = 15.7e12
CUDNN_EFF_OPTIMISTIC = 0.50  # upper end for 32-128ch convs => min denominator


def measure_torch_cpu():
    import torch

    sys.path.insert(0, "/root/reference/codes")
    from models.modules.sftmd_arch import DepthNet as TorchDepthNet

    torch.manual_seed(0)
    net = TorchDepthNet(
        which_ResBlk_depth=list(range(14)), in_nc=3, out_nc=3, nf=64, nb=16,
        scale=SCALE, depth_latent_ch=256, depthRangeNum=10,
        norm_type="weight_norm", use_trainable_params=True,
    ).eval()
    rng = np.random.default_rng(0)
    lq = torch.from_numpy(rng.random((1, 3, LR, LR), dtype=np.float32))
    dep = torch.from_numpy(rng.random((1, 1, LR, LR), dtype=np.float32))
    mask = torch.from_numpy(
        (rng.random((1, 10, LR, LR)) > 0.9).astype(np.float32))
    with torch.no_grad():
        net(lq, dep, mask)  # warm
        t0 = time.perf_counter()
        for _ in range(ITERS):
            net(lq, dep, mask)
        dt = (time.perf_counter() - t0) / ITERS
    return 1.0 / dt


def measure_jax_cpu():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from endosr.nn.depthnet import DepthNet

    net = DepthNet(which_resblk_depth=tuple(range(14)), scale=SCALE,
                   depth_latent_ch=256, depth_range_num=10)
    rng = np.random.default_rng(0)
    lq = jnp.asarray(rng.random((1, LR, LR, 3), dtype=np.float32))
    dep = jnp.asarray(rng.random((1, LR, LR, 1), dtype=np.float32))
    mask = jnp.asarray((rng.random((1, LR, LR, 10)) > 0.9).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), lq, dep, mask)["params"]
    f = jax.jit(lambda lq: net.apply({"params": params}, lq, dep, mask))
    f(lq).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(ITERS):
        f(lq).block_until_ready()
    dt = (time.perf_counter() - t0) / ITERS
    return 1.0 / dt


def main():
    out = {
        "shape": f"{LR}x{LR} -> {LR * SCALE}x{LR * SCALE}, bs1, fp32",
        "host": platform.processor() or platform.machine(),
        "cpu_count": os.cpu_count(),
        "flop_per_frame_est": FLOP_PER_FRAME,
        "reference_gpu_fps_estimate": round(
            V100_FP32_PEAK * CUDNN_EFF_OPTIMISTIC / FLOP_PER_FRAME, 2),
        "reference_gpu_assumptions": (
            "V100 fp32 peak 15.7 TF/s x 50% cuDNN efficiency (optimistic for "
            "32-128ch convs) / 0.24 TFLOP per frame"),
    }
    out["torch_cpu_fps"] = round(measure_torch_cpu(), 4)
    out["torch_cpu_achieved_tflops"] = round(
        out["torch_cpu_fps"] * FLOP_PER_FRAME / 1e12, 4)
    # subprocess for the JAX CPU run: this process may have the TPU attached
    import subprocess

    code = ("import sys; sys.path.insert(0, %r); "
            "from tools.measure_reference_baseline import measure_jax_cpu; "
            "print('JAXFPS', measure_jax_cpu())" %
            os.path.join(os.path.dirname(__file__), ".."))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True)
    for line in r.stdout.splitlines():
        if line.startswith("JAXFPS"):
            out["jax_cpu_fps"] = round(float(line.split()[1]), 4)

    path = os.path.join(os.path.dirname(__file__), "..",
                        "BASELINE_MEASURED.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
