"""Shared per-fusion device-trace profiling (dev tools).

Captures a ``jax.profiler.trace`` of a caller-driven loop (works through the
axon tunnel), aggregates on-device op durations from the .trace.json.gz,
maps trace op names to their HLO definition (fusion root + operand shapes)
from the compiled module text, and prints the top ops + a category rollup.
Factored out of ``profile_fusions.py`` so the train-step profiler
(``profile_train.py``) shares one implementation.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
from collections import defaultdict


def profile_loop(run_iters, n_iters, hlo_text, top_n=40,
                 tdir="/tmp/traceprof"):
    """Trace ``run_iters(n_iters)`` and print the per-op profile.

    ``run_iters``: callable that executes the program n times and blocks on
    the result (chained-dependency style). ``hlo_text``: compiled HLO of the
    profiled program for op descriptions. Returns (total_us_per_iter, rows).
    """
    import jax

    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        run_iters(n_iters)

    paths = glob.glob(f"{tdir}/plugins/profile/*/*.trace.json.gz")
    if not paths:
        raise RuntimeError("no trace captured")
    with gzip.open(paths[0], "rt") as f:
        trace = json.load(f)

    durs, cnts = defaultdict(float), defaultdict(int)
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
        raise RuntimeError(f"no complete events; pids seen: {pid_names}")

    defs: dict[str, str] = {}
    for line in hlo_text.splitlines():
        ls = line.strip()
        if ls.startswith("%") and "=" in ls and (
                " fusion(" in ls or " copy(" in ls or " convolution(" in ls
                or " custom-call(" in ls or " dot(" in ls):
            nm = ls.split("=", 1)[0].strip().lstrip("%")
            defs[nm] = ls.split("=", 1)[1].strip()
    comp_root: dict[str, str] = {}
    cur = None
    for line in hlo_text.splitlines():
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
                return root.split(", metadata=")[0][:240]
        return d.split(", metadata=")[0][:240]

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
    return total / n_iters, rows
