"""Real per-fusion device timings for the flagship forward (dev tool).

Traces N chained flagship forwards with jax.profiler.trace (works through
the axon tunnel) and aggregates on-device op durations from the captured
.trace.json.gz, printing the top fusions by total time. This is the ground
truth the isolated-op breakdown (bench_breakdown.py) approximates.

Envelope events (the jit_step region itself) are excluded from the
totals so percentages are over real op time; a category rollup over ALL
ops (convolution / copy / custom-call / elementwise fusion / other)
quantifies the tail that the top-N table truncates.

Usage: python tools/profile_fusions.py [N_iters] [TOP_N]
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    n_iters = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    import jax
    import jax.numpy as jnp

    from endosr.nn.depthnet import DepthNet

    lr, batch = 128, 8
    rng = np.random.default_rng(0)
    lq = jnp.asarray(rng.random((batch, lr, lr, 3), dtype=np.float32))
    depth = jnp.asarray(rng.random((batch, lr, lr, 1), dtype=np.float32))
    masks_np = np.zeros((batch, lr, lr, 10), np.float32)
    bins = rng.integers(0, 10, (batch, lr, lr))
    for k in range(10):
        masks_np[..., k] = bins == k
    masks = jnp.asarray(masks_np)

    kw = dict(which_resblk_depth=tuple(range(14)), scale=8,
              depth_latent_ch=256, depth_range_num=10)
    extra = json.loads(os.environ.get("NET_KW", "{}"))
    net = DepthNet(dtype=jnp.bfloat16, **kw, **extra)
    params = net.init(jax.random.PRNGKey(0), lq, depth, masks)["params"]

    @jax.jit
    def step(lq, depth, masks, acc):
        out = net.apply({"params": params}, lq + acc * 0.0, depth, masks)
        # chain scalar reads one contiguous output row — same program as
        # bench.py (a strided ::64 sample adds a 0.4 ms relayout the real
        # serving program never pays)
        return out, acc + jnp.sum(out[:, 0]) * 1e-12

    acc = jnp.float32(0.0)
    for _ in range(3):  # compile + warm
        _, acc = step(lq, depth, masks, acc)
    jax.device_get(acc)

    tdir = "/tmp/fusion_trace"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        for _ in range(n_iters):
            _, acc = step(lq, depth, masks, acc)
        jax.device_get(acc)

    paths = glob.glob(f"{tdir}/plugins/profile/*/*.trace.json.gz")
    if not paths:
        print("no trace captured", file=sys.stderr)
        sys.exit(1)
    with gzip.open(paths[0], "rt") as f:
        trace = json.load(f)

    # device-lane complete events: aggregate by op name
    durs = defaultdict(float)
    cnts = defaultdict(int)
    pid_names = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev.get("args", {}).get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "/device" in n.lower() or "XLA" in n}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        if dev_pids and ev.get("pid") not in dev_pids:
            continue
        name = ev.get("name", "?")
        durs[name] += ev.get("dur", 0.0)
        cnts[name] += 1
    if not durs:
        print("no complete events; pids seen:", pid_names, file=sys.stderr)
        sys.exit(1)

    # map trace op names (fusion.N / copy.N / ...) to their HLO definition:
    # root instruction + operand shapes, from the compiled module text
    hlo = step.lower(lq, depth, masks, acc).compile().as_text()
    defs: dict[str, str] = {}
    cur = None
    body: list[str] = []
    for line in hlo.splitlines():
        ls = line.strip()
        if ls.startswith("%fused_computation") or (
                " fusion(" in ls or " copy(" in ls or " convolution(" in ls
                or " custom-call(" in ls or " dot(" in ls):
            # top-level entry instruction: "%name = type op(...)"
            if ls.startswith("%") and "=" in ls:
                nm = ls.split("=", 1)[0].strip().lstrip("%")
                defs[nm] = ls.split("=", 1)[1].strip()
        if ls.startswith("ROOT ") and cur:
            body.append(ls)
    # fusion roots: second pass, track computation blocks
    comp_root: dict[str, str] = {}
    cur = None
    for line in hlo.splitlines():
        ls = line.strip()
        if ls.startswith("%fused_computation") and "{" in ls:
            cur = ls.split()[0].lstrip("%").split("(")[0]
        elif ls.startswith("ROOT ") and cur:
            comp_root[cur] = ls[5:]
            cur = None

    def describe(name: str) -> str:
        d = defs.get(name, "")
        if "calls=" in d:
            comp = d.split("calls=")[1].split(",")[0].split(")")[0].strip("%")
            root = comp_root.get(comp, "")
            if root:
                # strip metadata for readability
                root = root.split(", metadata=")[0]
                return root[:240]
        return d.split(", metadata=")[0][:240]

    # drop envelope events (the jit region itself) so totals are real op
    # time, not region + ops double-counted
    env = {n for n in durs if n.startswith("jit_") or n.startswith("pjit")}
    envelope = max((durs[n] / n_iters for n in env), default=0.0)
    for n in env:
        durs.pop(n), cnts.pop(n)

    def category(name: str) -> str:
        d = defs.get(name, "")
        if "custom-call" in d or "custom-call" in describe(name):
            return "custom-call (pallas)"
        if name.startswith("copy") or " copy(" in d:
            return "copy/relayout"
        if "convolution" in d or "convolution" in describe(name) \
                or name.startswith("conv"):
            return "convolution"
        if name.startswith(("fusion", "add", "multiply", "maximum", "select",
                            "convert", "reduce", "subtract", "divide",
                            "broadcast", "concatenate", "slice", "bitcast",
                            "transpose", "pad", "tuple", "rsqrt", "exp")):
            return "elementwise/fusion"
        return "other"

    total = sum(durs.values())
    cats = defaultdict(float)
    for n, d in durs.items():
        cats[category(n)] += d
    rows = sorted(durs.items(), key=lambda kv: -kv[1])
    print(f"{'us/iter':>10} {'%':>6} {'count':>6}  op")
    shown = 0.0
    for name, d in rows[:top_n]:
        print(f"{d / n_iters:10.1f} {100 * d / total:6.2f} "
              f"{cnts[name]:6d}  {name[:110]}")
        desc = describe(name)
        if desc:
            print(f"{'':24}↳ {desc}")
        shown += d
    print(f"total device op us/iter: {total / n_iters:.1f} "
          f"(envelope {envelope:.1f}; top-{top_n} covers "
          f"{100 * shown / total:.1f}%)")
    print("category rollup (all ops):")
    for c, d in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"  {d / n_iters:10.1f} us/iter {100 * d / total:6.2f}%  {c}")


if __name__ == "__main__":
    main()
