"""Flagship training-step benchmark: samples/sec/chip for the full jitted
SPMD step (DepthNet ×8 forward at GT 1024², L1 + dynamic depth-mask loss,
backward, Adam — the ``train_depthNet_SEAN_depthMask_x8.yml`` recipe).

Methodology: the batch is device-resident (the host pipeline's
``prefetch_to_device`` overlaps H2D in real training) and the step is the
production donated-buffer program, chained through its state. Timing is the
difference quotient between two chain lengths (the bench.py method): the
tunnel's per-fetch round trip is hundreds of ms with large variance, so
per-step synchronization would measure the tunnel, not the chip.

Prints one JSON line. Reference anchor: the recipe targets batch 8 across
2× V100-class GPUs; at ~0.72 TFLOP fwd+bwd per frame and 25–50% cuDNN
efficiency that is ~5–11 samples/s per GPU.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    from endosr.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    from __graft_entry__ import _flagship_opt
    from endosr.config.options import dict_to_nonedict
    from endosr.models.f_depthcond import FModelDepthCond
    from endosr.parallel.mesh import shard_batch

    b = 8
    rng = np.random.default_rng(0)
    batch = {
        "LQ": rng.random((b, 128, 128, 3)).astype(np.float32),
        "GT": rng.random((b, 1024, 1024, 3)).astype(np.float32),
        "Depth": rng.random((b, 128, 128, 1)).astype(np.float32),
        "DepthMaskList": (rng.random((b, 128, 128, 10)) > 0.9).astype(np.float32),
    }

    def measure(precision):
        o = _flagship_opt(lr_size=128, mask_num=10, scale=8)
        if precision:
            o["precision"] = precision
        model = FModelDepthCond(dict_to_nonedict(o))
        # TRAIN_NET_KW: DepthNet override A/Bs for the training program
        # (e.g. '{"packed_tail": false}' — the packed chains' per-step
        # weight prep + twin-VJP recompute may price differently in
        # training than in fixed-weight serving). Overrides are merged into
        # the opt's network_G block and the MODEL IS REBUILT, so overrides
        # that change the parameter set (nb, depth_latent_ch, …) re-init
        # params consistently instead of mis-binding a cloned net to the
        # old state (ADVICE r4).
        kw = json.loads(os.environ.get("TRAIN_NET_KW", "{}"))
        if kw:
            o["network_G"].update(kw)
            model = FModelDepthCond(dict_to_nonedict(o))
        dev_batch = shard_batch(dict(batch, mask_bin=np.int32(3)), model.mesh)
        state = model.state
        # XLA's own FLOP count of the whole step program (fwd+bwd+Adam)
        # for the MFU figure — same method as bench.py
        flops = 0.0
        try:
            ca = model._train_step.lower(state, dev_batch).compile()                 .cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            flops = float(ca.get("flops", 0.0))
        except Exception:
            pass
        state, logs = model._train_step(state, dev_batch)  # compile + warm
        assert np.isfinite(float(jax.device_get(logs["l_all"])))

        def chain(state, n):
            t0 = time.perf_counter()
            logs = None
            for _ in range(n):
                state, logs = model._train_step(state, dev_batch)
            assert np.isfinite(float(jax.device_get(logs["l_all"])))
            return time.perf_counter() - t0, state

        n1, n2 = 3, 13
        t1 = t2 = 1e9
        for _ in range(3):
            t, state = chain(state, n1)
            t1 = min(t1, t)
            t, state = chain(state, n2)
            t2 = min(t2, t)
        return (t2 - t1) / (n2 - n1), flops

    # bf16 peak TFLOP/s per chip (the MFU denominator, as in bench.py)
    peaks = {"TPU v4": 275.0, "TPU v5 lite": 197.0, "TPU v5e": 197.0,
             "TPU v5p": 459.0, "TPU v6": 918.0}
    kind = jax.devices()[0].device_kind
    peak = next((v for k, v in peaks.items() if k in kind), None)

    def mfu(flops, dt):
        return round(flops / dt / 1e12 / peak, 4) if (peak and flops) else None

    dt32, fl32 = measure(None)     # reference recipe precision
    dt16, fl16 = measure("bf16")   # bf16 compute, fp32 params + IN statistics

    rec = {
        "metric": "samples/sec/chip, DepthNet x8 Kvasir training step "
                  "(bs8, GT 1024^2, L1+dynamic mask)",
        "value": round(b / dt32, 3),
        "unit": "samples/sec/chip",
        "ms_per_step_fp32": round(dt32 * 1e3, 1),
        "ms_per_step_bf16_compute": round(dt16 * 1e3, 1),
        "samples_per_sec_bf16_compute": round(b / dt16, 3),
        "step_tflop_fp32": round(fl32 / 1e12, 3),
        "step_tflop_bf16": round(fl16 / 1e12, 3),
        "train_mfu_fp32": mfu(fl32, dt32),
        "train_mfu_bf16": mfu(fl16, dt16),
        "net_kw": json.loads(os.environ.get("TRAIN_NET_KW", "{}")),
        "device_kind": kind,
    }
    print(json.dumps(rec))
    # committed evidence trail (same contract as quick_fps / bench.py)
    logdir = os.path.join(os.path.dirname(__file__), "..", "bench_logs")
    os.makedirs(logdir, exist_ok=True)
    with open(os.path.join(logdir, "train_runs.jsonl"), "a") as f:
        f.write(json.dumps({"ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
                            **rec}) + "\n")


if __name__ == "__main__":
    main()
