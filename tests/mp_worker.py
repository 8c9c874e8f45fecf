"""Worker process for tests/test_multiprocess.py.

Runs as one of two `jax.distributed` processes (4 virtual CPU devices
each → an 8-device global mesh), exercising the real multi-host surfaces:
`maybe_init_distributed`, the per-host loader shard split
(`endosr/data/__init__.py::create_dataloader` with `dist: true`), a
sharded train step over the global mesh, rank-gated checkpoint save, and
resume. Mirrors the reference's DDP contract (`train.py:19-27`,
`data/data_sampler.py:12-65`) as a 2-process integration check.

Usage: python tests/mp_worker.py <pid> <nproc> <coordinator> <outdir>
"""

import json
import os
import sys


def main() -> None:
    pid, nproc, coord, outdir = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4])
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "").replace(
            "--xla_force_host_platform_device_count=8", "").strip()
        + " --xla_force_host_platform_device_count=4"
    ).strip()
    os.environ["JAX_COORDINATOR_ADDRESS"] = coord
    os.environ["JAX_NUM_PROCESSES"] = str(nproc)
    os.environ["JAX_PROCESS_ID"] = str(pid)

    import jax

    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    from endosr.parallel.mesh import (
        is_main_process,
        make_mesh,
        maybe_init_distributed,
        replicate,
        shard_batch,
    )

    maybe_init_distributed()
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.local_device_count() == 4
    assert jax.device_count() == 4 * nproc

    import numpy as np
    import jax.numpy as jnp

    # --- per-host loader shard split (dist path of create_dataloader) ---
    from endosr.data import create_dataloader

    class IdxDataset:
        def __len__(self):
            return 16

        def __getitem__(self, i):
            return {"LQ": np.full((4, 4, 3), i, np.float32), "idx": np.int64(i)}

    opt = {"dist": True, "train": {"manual_seed": 7}}
    dopt = {"phase": "train", "batch_size": 8, "use_shuffle": True,
            "dataset_enlarge_ratio": 1, "n_workers": 0}
    loader = create_dataloader(IdxDataset(), dopt, opt)
    assert loader.batch_size == 8 // nproc  # per-host split
    batch = next(iter(loader))
    my_indices = [int(v) for v in batch["idx"]]

    # --- one sharded train step over the GLOBAL mesh ---
    import optax

    mesh = make_mesh()
    assert mesh.devices.size == 4 * nproc

    w0 = jnp.zeros((3, 1), jnp.float32)
    opt_tx = optax.adam(1e-2)

    def loss_fn(w, x):
        pred = x.reshape(-1, 3) @ w
        return jnp.mean((pred - 1.0) ** 2)

    @jax.jit
    def train_step(w, st, x):
        loss, g = jax.value_and_grad(loss_fn)(w, x)
        upd, st = opt_tx.update(g, st, w)
        return optax.apply_updates(w, upd), st, loss

    # global [8, 4, 4, 3] batch assembled from the per-host [4, ...] halves:
    # each host device_puts only its own loader shard
    local = batch["LQ"]
    from jax.sharding import NamedSharding, PartitionSpec as P

    global_shape = (8, 4, 4, 3)
    sharding = NamedSharding(mesh, P("data"))
    arrs = [jax.device_put(local[i % len(local)][None], d)
            for i, d in enumerate(mesh.local_devices)]
    gx = jax.make_array_from_single_device_arrays(global_shape, sharding, arrs)

    w = replicate(w0, mesh)
    st = replicate(opt_tx.init(w0), mesh)
    w, st, loss = train_step(w, st, gx)
    loss = float(loss)

    # --- rank-gated checkpoint save + resume ---
    from endosr.utils.checkpoint import load_pytree, save_pytree

    ckpt = os.path.join(outdir, "ckpt.msgpack")
    if is_main_process():
        save_pytree({"w": np.asarray(w)}, ckpt, backend="msgpack")
    # all hosts wait for rank 0's write, then everyone resumes
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("ckpt_written")
    restored = load_pytree(ckpt, {"w": np.zeros((3, 1), np.float32)})
    np.testing.assert_allclose(restored["w"], np.asarray(w), atol=1e-7)

    with open(os.path.join(outdir, f"result_{pid}.json"), "w") as f:
        json.dump({
            "pid": pid,
            "indices": my_indices,
            "loss": loss,
            "w": np.asarray(w).ravel().tolist(),
        }, f)
    multihost_utils.sync_global_devices("done")


if __name__ == "__main__":
    main()
