"""Trace the flagship forward on the real TPU and print per-fusion device
times (dev tool).

Usage: python tools/profile_forward.py [--train] [--outdir /tmp/endosr_prof]

Parses the xplane trace that ``jax.profiler.trace`` writes (works through
the axon tunnel) and aggregates device-side op durations by HLO fusion name,
so optimization work targets measured milliseconds, not guesses.
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _trace_ctx(outdir):
    """jax.profiler.trace with the python tracer off — the host-side python
    events otherwise flood the 1M-event trace cap and evict every device
    event on long programs (observed on the train step)."""
    import jax

    opts = jax.profiler.ProfileOptions()
    opts.python_tracer_level = 0
    return jax.profiler.trace(outdir, profiler_options=opts)


def run_traced(outdir: str, train: bool):
    from endosr.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    B = 8
    lq = jnp.asarray(rng.random((B, 128, 128, 3), dtype=np.float32))
    dep = jnp.asarray(rng.random((B, 128, 128, 1), dtype=np.float32))
    mk = jnp.asarray((rng.random((B, 128, 128, 10)) > 0.9).astype(np.float32))

    if train:
        from __graft_entry__ import _flagship_opt
        from endosr.config.options import dict_to_nonedict
        from endosr.models.f_depthcond import FModelDepthCond
        from endosr.parallel.mesh import shard_batch

        opt = _flagship_opt(128, 10, 8)
        if os.environ.get("ENDOSR_PROFILE_BF16"):
            opt["precision"] = "bf16"
        model = FModelDepthCond(dict_to_nonedict(opt))
        batch = shard_batch({
            "LQ": np.asarray(lq), "GT": rng.random(
                (B, 1024, 1024, 3)).astype(np.float32),
            "Depth": np.asarray(dep), "DepthMaskList": np.asarray(mk),
            "mask_bin": np.int32(3),
        }, model.mesh)
        state = model.state
        state, logs = model._train_step(state, batch)  # compile
        float(jax.device_get(logs["l_all"]))
        with _trace_ctx(outdir):
            for _ in range(6):
                state, logs = model._train_step(state, batch)
            float(jax.device_get(logs["l_all"]))
        return 6

    from endosr.nn.depthnet import DepthNet

    net = DepthNet(which_resblk_depth=tuple(range(14)), scale=8,
                   depth_latent_ch=256, depth_range_num=10,
                   dtype=jnp.bfloat16)
    params = net.init(jax.random.PRNGKey(0), lq, dep, mk)["params"]

    @jax.jit
    def step(params, lq, acc):
        out = net.apply({"params": params}, lq + acc * 0.0, dep, mk)
        return acc + jnp.mean(out) * 1e-12

    acc = jnp.float32(0.0)
    acc = step(params, lq, acc)  # compile
    float(jax.device_get(acc))
    with _trace_ctx(outdir):
        for _ in range(6):
            acc = step(params, lq, acc)
        float(jax.device_get(acc))
    return 6


def parse_trace(outdir: str, nsteps: int, top: int = 40):
    paths = glob.glob(os.path.join(
        outdir, "plugins", "profile", "*", "*.trace.json.gz"))
    if not paths:
        print("no trace found under", outdir)
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # Aggregate device-side op events (ph == 'X') by fusion name. The
    # "Steps" / "XLA Modules" tracks carry whole-program spans (the true
    # per-step device time) — report those separately, not in the op table.
    durs = defaultdict(float)
    counts = defaultdict(int)
    pids_meta, tids_meta = {}, {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids_meta[e.get("pid")] = e.get("args", {}).get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tids_meta[(e.get("pid"), e.get("tid"))] = e.get(
                "args", {}).get("name", "")
    device_pids = {p for p, n in pids_meta.items()
                   if "TPU" in n or "/device" in n.lower()}
    step_total = 0.0
    step_count = 0
    for e in events:
        if e.get("ph") != "X":
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        track = str(tids_meta.get((e.get("pid"), e.get("tid")), ""))
        if track == "Steps":
            step_total += float(e.get("dur", 0.0))
            step_count += 1
            continue
        if track == "XLA Modules":
            continue
        name = e.get("name", "?")
        durs[name] += float(e.get("dur", 0.0))
        counts[name] += 1
    total = sum(durs.values())
    print(f"trace: {path}")
    if step_count:
        print(f"device step time: {step_total / 1e3 / step_count:.3f} ms "
              f"({step_count} steps)")
    print(f"op total: {total / 1e3 / nsteps:.3f} ms/step over {nsteps} steps")
    print(f"{'us/step':>10s} {'count':>6s}  name")
    for name, d in sorted(durs.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{d / nsteps:10.1f} {counts[name]:6d}  {name[:110]}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--outdir", default="/tmp/endosr_prof")
    ap.add_argument("--parse-only", action="store_true")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()
    if not args.parse_only:
        n = run_traced(args.outdir, args.train)
    else:
        n = 6
    parse_trace(args.outdir, n, args.top)
