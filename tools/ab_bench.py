"""Interleaved bench.py A/B runner — the round-5 perf-decision court.

Round 4's lesson (VERDICT r4 items 1-2): single bench runs on this tunnel
are not trustworthy — the same tree measured 328.7, 326.4, 286.5 and 285.1
fps across a morning depending on host load and tunnel health. This runner
de-noises A/Bs the only way that works on a shared/flaky device:

* each arm is a full ``python bench.py`` subprocess (BENCH_NET_KW set) —
  the exact program the driver measures, nothing else;
* arms run INTERLEAVED (A,B,C,…,A,B,C,…) for ``--reps`` rounds so a slow
  window hits all arms equally instead of biasing one;
* a failed run (dead tunnel, deadline) is recorded and excluded; the
  arm's statistic is the MAX over its successful reps (the best run is the
  least-contended one — fps noise on this setup is one-sided slowdown);
* every rep already lands in bench_logs/bench_runs.jsonl via bench.py's
  own evidence trail, tagged with its net_kw.

Usage:
  python tools/ab_bench.py --reps 3 \
      '{"obranch_body":"conv"}' '{"obranch_body":"dot"}'
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time


def run_arm(arm: str, deadline: int) -> dict | None:
    env = dict(os.environ, BENCH_NET_KW=arm,
               BENCH_DEADLINE_SEC=str(deadline))
    try:
        r = subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(__file__), "..", "bench.py")],
            env=env, capture_output=True, text=True, timeout=deadline + 120)
    except subprocess.TimeoutExpired:
        return None
    for line in r.stdout.splitlines():
        if line.startswith("{"):
            rec = json.loads(line)
            if rec.get("value"):
                return rec  # first (headline) record is enough
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("arms", nargs="+", help="BENCH_NET_KW JSON per arm")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--deadline", type=int, default=700)
    args = ap.parse_args()

    results: dict[str, list[float]] = {a: [] for a in args.arms}
    for rep in range(args.reps):
        for arm in args.arms:
            t0 = time.time()
            rec = run_arm(arm, args.deadline)
            fps = rec["value"] if rec else None
            print(json.dumps({"rep": rep, "arm": json.loads(arm),
                              "fps": fps,
                              "wall_s": round(time.time() - t0, 1)}),
                  flush=True)
            if fps:
                results[arm].append(fps)

    print("\n=== A/B summary (max over successful reps) ===")
    best = None
    for arm, vals in results.items():
        stat = max(vals) if vals else 0.0
        print(json.dumps({"arm": json.loads(arm), "n_ok": len(vals),
                          "fps_max": stat,
                          "fps_all": [round(v, 1) for v in vals]}))
        if best is None or stat > best[1]:
            best = (arm, stat)
    if best:
        print(f"WINNER: {best[0]} at {best[1]:.1f} fps/chip")


if __name__ == "__main__":
    main()
