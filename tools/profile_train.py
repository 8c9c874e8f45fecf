"""Per-fusion device profile of the FULL flagship training step.

The training twin of ``profile_fusions.py``: traces N chained
``FModelDepthCond._train_step`` executions (forward + L1 + dynamic mask
loss + backward + Adam at the ``train_depthNet_SEAN_depthMask_x8.yml``
shapes) and prints the top device ops + category rollup — the ground truth
for the backward-pass optimization candidates (VERDICT r3 item 3).

Usage: [PRECISION=bf16] python tools/profile_train.py [N_iters] [TOP_N]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    n_iters = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    from endosr.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    from __graft_entry__ import _flagship_opt
    from endosr.config.options import dict_to_nonedict
    from endosr.models.f_depthcond import FModelDepthCond
    from endosr.parallel.mesh import shard_batch
    from tools._traceprof import profile_loop

    b = 8
    rng = np.random.default_rng(0)
    batch = {
        "LQ": rng.random((b, 128, 128, 3)).astype(np.float32),
        "GT": rng.random((b, 1024, 1024, 3)).astype(np.float32),
        "Depth": rng.random((b, 128, 128, 1)).astype(np.float32),
        "DepthMaskList": (rng.random((b, 128, 128, 10)) > 0.9)
        .astype(np.float32),
    }
    o = _flagship_opt(lr_size=128, mask_num=10, scale=8)
    prec = os.environ.get("PRECISION")
    if prec:
        o["precision"] = prec
    model = FModelDepthCond(dict_to_nonedict(o))
    dev_batch = shard_batch(dict(batch, mask_bin=np.int32(3)), model.mesh)

    state = model.state
    state, logs = model._train_step(state, dev_batch)  # compile + warm
    assert np.isfinite(float(jax.device_get(logs["l_all"])))
    holder = {"state": state}

    def run_iters(n):
        st = holder["state"]
        logs = None
        for _ in range(n):
            st, logs = model._train_step(st, dev_batch)
        assert np.isfinite(float(jax.device_get(logs["l_all"])))
        holder["state"] = st

    run_iters(2)  # warm pass outside the trace
    hlo = model._train_step.lower(holder["state"], dev_batch) \
        .compile().as_text()
    profile_loop(run_iters, n_iters, hlo, top_n)


if __name__ == "__main__":
    main()
