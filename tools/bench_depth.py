"""Depth-subsystem benchmark: monodepth2 training step + disparity producer.

The SR pipeline's stage 1 (``codes/depth_estimation``): self-supervised
monodepth2 training and the ``*_disp.npy`` inference producer. Measures, on
the attached TPU at the endovis feed size (256×320, the reference default,
``options.py:37-48``):

  * the full jitted training step (depth+pose forwards for 3 frames,
    per-scale backproject→project→grid-sample view synthesis,
    min-reprojection + automask + smoothness, Adam) — samples/sec/chip
  * the jitted encoder→decoder disparity forward — disparity maps/sec/chip

Timing: chained difference-quotient (see bench.py docstring — the tunnel's
per-fetch latency makes per-step sync meaningless). Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
import types

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    from endosr.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from endosr.depth.options import MonodepthOptions
    from endosr.depth.trainer import Trainer, encode_inputs

    h, w, b = 256, 320, 12  # endovis feed size, monodepth2 default batch
    with tempfile.TemporaryDirectory() as root:
        opts = MonodepthOptions().parse([
            "--data_path", root, "--log_dir", os.path.join(root, "logs"),
            "--height", str(h), "--width", str(w), "--batch_size", str(b),
        ])
        trainer = Trainer(opts)
        trainer.opt = types.SimpleNamespace(**vars(opts))
        trainer.schedule_epoch_steps = 1000

    rng = np.random.default_rng(0)
    K = np.array([[0.92, 0, 0.5, 0], [0, 1.92, 0.5, 0],
                  [0, 0, 1, 0], [0, 0, 0, 1]], np.float32)
    inputs = {}
    for fid in trainer.frame_ids:
        base = rng.random((b, h, w, 3)).astype(np.float32)
        for s in trainer.opt.scales:
            img = base[:, ::2 ** s, ::2 ** s] if s else base
            inputs[("color", fid, s)] = np.ascontiguousarray(img)
            inputs[("color_aug", fid, s)] = inputs[("color", fid, s)]
    for s in trainer.opt.scales:
        Ks = K.copy()
        Ks[0] *= w // (2 ** s)
        Ks[1] *= h // (2 ** s)
        inputs[("K", s)] = np.broadcast_to(Ks, (b, 4, 4)).copy()
        inputs[("inv_K", s)] = np.broadcast_to(
            np.linalg.inv(Ks), (b, 4, 4)).copy()
    inputs = encode_inputs(inputs)
    inputs = {k: jnp.asarray(v) for k, v in inputs.items()}

    # ---- inference producer: encoder→decoder disparity forward ----------
    enc, dec = trainer.encoder, trainer.depth
    enc_vars, dec_vars = trainer.variables["encoder"], trainer.variables["depth"]
    img = jnp.asarray(rng.random((b, h, w, 3)).astype(np.float32))

    @jax.jit
    def fwd(ev, dv, x, acc):
        feats = enc.apply(ev, x + acc * 0.0, train=False)
        disp = dec.apply(dv, feats)[("disp", 0)]
        return acc + jnp.mean(disp) * 1e-12

    acc = jnp.float32(0.0)
    acc = fwd(enc_vars, dec_vars, img, acc)
    float(jax.device_get(acc))

    def chain_f(n):
        a = jnp.float32(0.0)
        t0 = time.perf_counter()
        for _ in range(n):
            a = fwd(enc_vars, dec_vars, img, a)
        assert np.isfinite(float(jax.device_get(a)))
        return time.perf_counter() - t0

    f1 = min(chain_f(4) for _ in range(3))
    f2 = min(chain_f(24) for _ in range(3))
    dt_inf = (f2 - f1) / 20

    step_fn = trainer._build_train_step()
    params = {k: v["params"] for k, v in trainer.variables.items()}
    opt_state = trainer.opt_state
    key = jax.random.PRNGKey(0)

    params, opt_state, losses = step_fn(params, opt_state, inputs, key)
    l0 = float(jax.device_get(losses["loss"]))
    assert np.isfinite(l0), losses

    def chain(params, opt_state, n):
        t0 = time.perf_counter()
        losses = None
        for i in range(n):
            params, opt_state, losses = step_fn(
                params, opt_state, inputs, jax.random.fold_in(key, i))
        assert np.isfinite(float(jax.device_get(losses["loss"])))
        return time.perf_counter() - t0, params, opt_state

    t1 = t2 = 1e9
    for _ in range(3):
        t, params, opt_state = chain(params, opt_state, 3)
        t1 = min(t1, t)
        t, params, opt_state = chain(params, opt_state, 13)
        t2 = min(t2, t)
    dt_train = (t2 - t1) / 10

    print(json.dumps({
        "metric": "monodepth2 endovis 256x320 bs12 on TPU",
        "train_ms_per_step": round(dt_train * 1e3, 1),
        "train_samples_per_sec_chip": round(b / dt_train, 1),
        "infer_ms_per_batch": round(dt_inf * 1e3, 2),
        "disp_maps_per_sec_chip": round(b / dt_inf, 1),
        "loss0": round(l0, 4),
    }))


if __name__ == "__main__":
    main()
