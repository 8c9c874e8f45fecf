"""Flagship benchmark: frames/sec/chip for DepthNet ×8 inference on Kvasir
shapes (LR 128×128 → SR 1024×1024 — the BASELINE.json north-star config).

Prints the headline JSON line ``{"metric", "value", "unit", "vs_baseline",
...}`` AS SOON AS the fps is measured; the fp32-vs-bf16 quality
certification and MFU accounting run afterwards and re-print the same
schema enriched (both lines are complete, parseable records — a consumer
may take either). Round-2 lesson: the old ordering ran two full-net
certification compiles BEFORE producing any output and a driver-side
timeout recorded nothing (VERDICT r2 item 2).

Robustness contract:
* a bounded tunnel probe (subprocess with hard timeout, a few retries)
  runs before anything touches the device; on a dead tunnel a failure
  JSON is printed instead of hanging;
* a deadline watchdog (``BENCH_DEADLINE_SEC``, default 1500 s) prints a
  failure JSON and exits if the headline line hasn't been produced in
  time — and exits silently (keeping the printed headline) if only the
  enrichment phase is slow;
* phase progress goes to stderr for post-mortems;
* the persistent XLA compile cache (endosr/utils/cache.py) makes repeat
  invocations start hot — chip sessions pre-warm it (tools/chip_*.sh).

Timing methodology: the attached TPU is reached through a tunnel whose
``block_until_ready`` does not wait for remote completion, so naive host
timing is meaningless. Instead N forwards are chained through a scalar data
dependency (each call's input depends on the previous call's output, forcing
serial device execution) and a single scalar is fetched at the end; the
per-frame time is the difference quotient between two chain lengths, which
cancels the dispatch and fetch constants and measures on-device compute.

Baseline denominator: ``BASELINE_MEASURED.json`` (produced by
``tools/measure_reference_baseline.py``) — the reference repo publishes no
numbers (BASELINE.md), so the denominator is a documented V100-class
estimate anchored by a measured CPU run of the reference torch model:
V100 fp32 peak × 50% cuDNN efficiency / 0.24 TFLOP per frame ≈ 33 fps.
The >10× north-star target corresponds to vs_baseline ≥ 10.

Quality certification: the benched precision is bfloat16 (fp32 InstanceNorm
statistics). After the headline line, one fp32 forward runs on identical
inputs and the enriched line reports PSNR(bf16, fp32); at a ≥45 dB
mismatch-PSNR and a ~30 dB operating point, the PSNR-vs-GT impact is
≤0.05 dB under independent-error accounting (MSE_b ≈ MSE_f + MSE_bf),
inside the BASELINE.md budget.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time

import numpy as np

FALLBACK_REF_FPS = 32.71  # documented estimate (see module docstring)

# bf16 peak TFLOP/s per chip by device kind (for the MFU figure)
_PEAK_TFLOPS = {
    "TPU v4": 275.0, "TPU v5 lite": 197.0, "TPU v5e": 197.0,
    "TPU v5p": 459.0, "TPU v5": 459.0, "TPU v6 lite": 918.0,
    "TPU v6e": 918.0, "TPU7x": 2307.0,
}

_METRIC = ("frames/sec/chip, DepthNet x8 Kvasir inference "
           "(128->1024, bs8, bf16)")


def _ref_fps():
    p = os.path.join(os.path.dirname(__file__), "BASELINE_MEASURED.json")
    if os.path.exists(p):
        with open(p) as f:
            return float(json.load(f)["reference_gpu_fps_estimate"])
    return FALLBACK_REF_FPS


def _note(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def _emit(obj):
    print(json.dumps(obj), flush=True)
    try:  # committed evidence trail (VERDICT r2 item 9)
        logdir = os.path.join(os.path.dirname(__file__), "bench_logs")
        os.makedirs(logdir, exist_ok=True)
        with open(os.path.join(logdir, "bench_runs.jsonl"), "a") as f:
            f.write(json.dumps({"ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
                                **obj}) + "\n")
    except OSError:
        pass


def _probe_device(tries, probe_timeout, sleep_s):
    """Bounded device/tunnel probe in a subprocess (an in-process stalled
    PJRT call cannot be timed out). Returns True when a trivial jit runs."""
    code = ("import jax, jax.numpy as jnp; "
            "print(float(jax.jit(lambda a: (a @ a).sum())"
            "(jnp.ones((128, 128)))))")
    for i in range(tries):
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               capture_output=True, timeout=probe_timeout)
            if r.returncode == 0:
                return True
            _note(f"probe {i + 1}/{tries} rc={r.returncode}: "
                  f"{r.stderr.decode(errors='replace')[-200:]}")
        except subprocess.TimeoutExpired:
            _note(f"probe {i + 1}/{tries} timed out after {probe_timeout}s")
        if i + 1 < tries:
            time.sleep(sleep_s)
    return False


def main():
    deadline = float(os.environ.get("BENCH_DEADLINE_SEC", "1500"))
    t_start = time.time()
    state = {"phase": "probe", "headline_printed": False}
    ref = _ref_fps()

    def fail_json(reason):
        return {"metric": _METRIC, "value": 0.0, "unit": "frames/sec/chip",
                "vs_baseline": 0.0, "baseline_fps": ref, "error": reason}

    done = threading.Event()

    def watchdog():
        remaining = deadline - (time.time() - t_start)
        if done.wait(max(5.0, remaining)):
            return
        if not state["headline_printed"]:
            _emit(fail_json(
                f"deadline {deadline:.0f}s hit during phase "
                f"'{state['phase']}'"))
            os._exit(1)  # no valid headline — fail the process too
        _note(f"deadline hit during enrichment phase "
              f"'{state['phase']}' — keeping the printed headline")
        os._exit(0)

    threading.Thread(target=watchdog, daemon=True).start()

    if not _probe_device(
            tries=int(os.environ.get("BENCH_PROBE_TRIES", "5")),
            probe_timeout=float(os.environ.get("BENCH_PROBE_TIMEOUT", "240")),
            sleep_s=30.0):
        _emit(fail_json("device/tunnel probe never came up"))
        return

    state["phase"] = "imports"
    from endosr.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from endosr.nn.depthnet import DepthNet

    kind = jax.devices()[0].device_kind
    _note(f"device: {kind}, backend: {jax.default_backend()}")

    state["phase"] = "inputs"
    lr = 128
    batch = 8  # serving throughput config; dispatch overhead amortized
    smoke = bool(os.environ.get("BENCH_SMOKE"))
    if smoke:  # plumbing self-test only (tests/test_eval_cli.py) — NOT the
        lr, batch = 16, 1  # benchmark; the metric line is tagged
    rng = np.random.default_rng(0)
    lq = jnp.asarray(rng.random((batch, lr, lr, 3), dtype=np.float32))
    depth = jnp.asarray(rng.random((batch, lr, lr, 1), dtype=np.float32))
    nbins = 4 if smoke else 10
    masks_np = np.zeros((batch, lr, lr, nbins), np.float32)
    bins = rng.integers(0, nbins, (batch, lr, lr))
    for k in range(nbins):
        masks_np[..., k] = bins == k
    masks = jnp.asarray(masks_np)

    kw = dict(which_resblk_depth=tuple(range(14)), scale=8,
              depth_latent_ch=256, depth_range_num=10)
    if smoke:
        kw.update(which_resblk_depth=(0,), nb=4, depth_latent_ch=16,
                  depth_range_num=4)
    # A/B instrumentation: BENCH_NET_KW (JSON DepthNet overrides) makes
    # bench.py itself the court for perf-default decisions (VERDICT r4
    # item 1 — never flip a default on quick_fps's word again). A non-empty
    # override tags every emitted record with "net_kw" so bench_runs.jsonl
    # A/B arms are distinguishable from headline runs.
    net_kw = json.loads(os.environ.get("BENCH_NET_KW", "{}"))
    kw.update(net_kw)
    net = DepthNet(dtype=jnp.bfloat16, **kw)
    state["phase"] = "params-init"
    params = net.init(jax.random.PRNGKey(0), lq, depth, masks)["params"]

    # The SR image is a root of the jitted step, so it MATERIALIZES in HBM
    # every iteration (honest serving cost — and it keeps XLA from fusing
    # the folded 9×9 head conv into a scalar-reduce epilogue, which runs
    # the conv off the MXU: measured 3.2 ms vs 0.9 ms for conv+write).
    # The chain scalar reads a strided sample of the output so each call
    # still depends on the previous call's full forward.
    # Params are CLOSED OVER (compile-time constants): serving runs fixed
    # weights, and with params as constants XLA folds the weight-norm
    # normalizations, packed-kernel builds and bias tiles at compile time
    # instead of re-preparing them every frame (~2.5 ms/step at this
    # shape, round-3 profile). The serving model layer does the same
    # (FModelDepthCond._refresh_serving_jits).
    @jax.jit
    def step(lq, depth, masks, acc):
        out = net.apply({"params": params}, lq + acc * 0.0, depth, masks)
        # chain scalar reads one contiguous output row: a strided
        # ::64 sample made XLA relayout the 100 MB fp32 output for the
        # slice (0.4 ms/step) — a cost real serving (D2H of the dense
        # rows) never pays. out is a root either way, so every call
        # still materializes the full frame.
        return out, acc + jnp.sum(out[:, 0]) * 1e-12

    def run(n):
        acc = jnp.float32(0.0)
        t0 = time.perf_counter()
        for _ in range(n):
            _, acc = step(lq, depth, masks, acc)
        v = jax.device_get(acc)
        assert np.isfinite(v)
        return time.perf_counter() - t0

    state["phase"] = "compile+warm"
    t_c = time.time()
    run(2)
    _note(f"bf16 step compiled+warm in {time.time() - t_c:.1f}s")

    state["phase"] = "measure"
    est = run(3) / 3
    if est > 0.5:  # non-TPU fallback (e.g. CPU smoke) — keep it bounded
        n1, n2, reps = 1, 3, 1
    else:
        n1, n2, reps = 5, 45, 3
    t1 = min(run(n1) for _ in range(reps))
    t2 = min(run(n2) for _ in range(reps))
    per_step = (t2 - t1) / (n2 - n1)
    fps = batch / per_step

    headline = {
        "metric": _METRIC + (" [SMOKE]" if smoke else ""),
        "value": round(fps, 3),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / ref, 3),
        "baseline_fps": ref,
        # the denominator is a documented V100-class ESTIMATE anchored by
        # a measured CPU run of the reference torch model (the reference
        # publishes no numbers) — see module docstring / BASELINE.md
        "baseline_basis": "V100-class estimate (BASELINE_MEASURED.json)",
        "device_kind": kind,
    }
    if net_kw:
        headline["net_kw"] = net_kw
    # Regression floor (VERDICT r4 item 4): compare against the newest
    # committed BENCH_r*.json headline; a >3% drop gets a loud field in the
    # emitted record so a silent slip can never ship again. A/B arms
    # (net_kw set) still get the field — informational, per-arm.
    if not smoke:
        try:
            import glob
            prior = sorted(glob.glob(os.path.join(
                os.path.dirname(__file__) or ".", "BENCH_r*.json")))
            best_prior = 0.0
            for p in prior:
                with open(p) as f:
                    rec = json.load(f).get("parsed") or {}
                if isinstance(rec, dict):
                    best_prior = max(best_prior,
                                     float(rec.get("value") or 0.0))
            if best_prior and fps < 0.97 * best_prior:
                pct = 100.0 * (fps / best_prior - 1.0)
                headline["regression_vs_committed"] = (
                    f"{pct:+.1f}% vs best committed BENCH_r*.json "
                    f"({best_prior:.1f} fps)")
                _note(f"REGRESSION: {headline['regression_vs_committed']}")
        except Exception as e:  # noqa: BLE001 — guard must never kill it
            _note(f"regression-floor check failed: {e}")
    _emit(headline)
    state["headline_printed"] = True
    _note("headline printed; running enrichment (MFU + fp32 cert)")

    # --- enrichment: MFU + quality certification (headline already out) ---
    state["phase"] = "cost-analysis"
    try:
        compiled = step.lower(lq, depth, masks,
                              jnp.float32(0.0)).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        device_flops = float(ca.get("flops", 0.0))
    except Exception as e:  # noqa: BLE001 — enrichment must never kill it
        _note(f"cost analysis failed: {e}")
        device_flops = 0.0
    peak = next((v for k, v in _PEAK_TFLOPS.items() if k in kind), None)
    mfu = (device_flops / per_step / 1e12 / peak) \
        if peak and device_flops else None

    state["phase"] = "fp32-cert"
    try:
        net32 = DepthNet(dtype=jnp.float32, **kw)
        out16 = np.asarray(step(lq, depth, masks,
                                jnp.float32(0.0))[0], dtype=np.float64)
        out32 = np.asarray(jax.jit(
            lambda p, a: net32.apply({"params": p}, a, depth, masks))(
                params, lq))
        mse = float(np.mean((out16 - out32) ** 2))
        bf16_psnr = float("inf") if mse == 0 else 10 * np.log10(1.0 / mse)
    except Exception as e:  # noqa: BLE001
        _note(f"fp32 certification failed: {e}")
        bf16_psnr = None

    _emit({
        **headline,
        "bf16_vs_fp32_psnr_db":
            round(bf16_psnr, 2) if bf16_psnr is not None else None,
        "device_tflop_per_frame":
            round(device_flops / batch / 1e12, 4) if device_flops else None,
        "mfu": round(mfu, 4) if mfu is not None else None,
    })
    done.set()


if __name__ == "__main__":
    main()
