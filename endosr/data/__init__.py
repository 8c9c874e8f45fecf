"""Dataset/loader factory — twin of ``codes/data/__init__.py``.

``create_dataset`` maps the YAML ``mode`` string to a dataset class
(fixing the reference's EndoScene_Depth instantiation bug, SURVEY.md §2.9-1).
``create_dataloader`` builds a host-side sharded, thread-prefetching batch
iterator: the TPU-native replacement for DataLoader + ``DistIterSampler``
(per-host batch slice = batch_size // process_count; ×ratio epoch
enlargement with epoch-seeded shuffle, ``data/data_sampler.py:43-59``).
"""

from __future__ import annotations

import logging
import queue
import threading

import numpy as np

__all__ = ["create_dataset", "create_dataloader", "ShardedLoader"]


def create_dataset(dataset_opt):
    mode = dataset_opt["mode"]
    if mode == "LQ":
        from endosr.data.datasets import LQDataset as D
    elif mode == "LQGTker":
        from endosr.data.datasets import LQGTKerDataset as D
    elif mode == "SRker":
        from endosr.data.datasets import SRKerDataset as D
    elif mode == "LQGTker_Depth":
        from endosr.data.datasets import LQGTKerDepthDataset as D
    elif mode == "EndoScene_Depth":
        from endosr.data.datasets import EndoSceneDepthDataset as D
    elif mode == "EndoScene_Depthnew":
        from endosr.data.datasets import EndoSceneDepthnewDataset as D
    elif mode == "LQker":
        from endosr.data.datasets import LQKerDataset as D
    elif mode == "LRHR_seg_bg":
        from endosr.data.datasets import LRHRSegBGDataset as D
    else:
        raise NotImplementedError(f"Dataset [{mode}] is not recognized.")
    dataset = D(dataset_opt)
    logging.getLogger("base").info(
        "Dataset [%s - %s] is created.", dataset.__class__.__name__,
        dataset_opt.get("name"),
    )
    return dataset


def _stack(items: list[dict]) -> dict:
    out = {}
    for k in items[0]:
        v0 = items[0][k]
        if isinstance(v0, np.ndarray):
            out[k] = np.stack([it[k] for it in items])
        else:
            out[k] = [it[k] for it in items]
    return out


class ShardedLoader:
    """Deterministic, sharded, thread-prefetched batch iterator.

    * iteration-oriented epochs: index space is ``len(dataset) × ratio``
      shuffled with a seed of ``seed + epoch`` (DistIterSampler semantics)
    * sharding: rank-strided slice of the shuffled index space
    * batches are stacked numpy dicts (NHWC), ``drop_last`` for train
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 seed: int = 0, ratio: int = 1, drop_last: bool = True,
                 num_shards: int = 1, shard_index: int = 0,
                 prefetch: int = 2, num_workers: int = 0):
        self.dataset = dataset
        self.batch_size = max(1, batch_size)
        self.shuffle = shuffle
        self.seed = seed
        self.ratio = max(1, ratio)
        self.drop_last = drop_last
        self.num_shards = num_shards
        self.shard_index = shard_index
        self.prefetch = prefetch
        self.num_workers = num_workers
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _indices(self) -> np.ndarray:
        n = len(self.dataset)
        total = n * self.ratio
        # pad so every shard sees the same count (DistributedSampler style)
        per_shard = -(-total // self.num_shards)
        padded = per_shard * self.num_shards
        if self.shuffle:
            g = np.random.default_rng(self.seed + self.epoch)
            idx = g.permutation(total)
        else:
            idx = np.arange(total)
        idx = np.concatenate([idx, idx[: padded - total]])
        idx = idx[self.shard_index::self.num_shards]
        return idx % n

    def __len__(self):
        per_shard = -(-len(self.dataset) * self.ratio // self.num_shards)
        if self.drop_last:
            return per_shard // self.batch_size
        return -(-per_shard // self.batch_size)

    def __iter__(self):
        idx = self._indices()
        nb = len(idx) // self.batch_size if self.drop_last else -(-len(idx) // self.batch_size)
        batches = [idx[i * self.batch_size:(i + 1) * self.batch_size] for i in range(nb)]

        if self.num_workers > 0:
            yield from self._iter_multiprocess(batches)
            return

        if self.prefetch <= 0:
            for b in batches:
                yield _stack([self.dataset[int(i)] for i in b])
            return

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = object()
        abandoned = threading.Event()

        def put(item) -> bool:
            while not abandoned.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for b in batches:
                    if not put(_stack([self.dataset[int(i)] for i in b])):
                        return  # consumer abandoned the iterator
            except Exception as e:  # surface loader errors to the consumer
                put(e)
            finally:
                put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is stop:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            # unblock + drain the producer so an abandoned iterator doesn't
            # leave a thread parked on a full queue into interpreter exit
            abandoned.set()
            try:
                t.join(timeout=5)
            except TypeError:  # interpreter teardown: threading internals gone
                pass


    def _iter_multiprocess(self, batches):
        """Fork-based decode workers with in-order delivery.

        Replaces the reference's ``DataLoader(num_workers=…)`` processes
        (``codes/data/__init__.py:16-22``): each worker owns a task slice,
        decodes+stacks whole batches, and the parent reorders results while
        keeping ``prefetch`` batches in flight per worker. Worker
        augmentation RNGs are reseeded per (seed, epoch, worker) like
        torch's per-worker seeding.
        """
        import multiprocessing as mp

        # warm the dataset's RAM cache ONCE in the parent before forking:
        # workers are re-forked every epoch, so a cold parent cache would be
        # rebuilt per worker per epoch (decode-every-epoch, duplicated RAM);
        # a warm parent cache is inherited copy-on-write at zero extra cost
        ds = self.dataset
        if (getattr(ds, "_cache", None) is not None
                and not getattr(ds, "_cache_warmed", False)):
            prep = getattr(ds, "_prepared_train", None)
            for i in range(len(ds)):
                prep(i) if prep is not None else ds[i]
            ds._cache_warmed = True

        ctx = mp.get_context("fork")
        nw = min(self.num_workers, len(batches)) or 1
        task_q = ctx.Queue()
        result_q = ctx.Queue(maxsize=max(2, self.prefetch) * nw)

        for bid, b in enumerate(batches):
            task_q.put((bid, b))
        for _ in range(nw):
            task_q.put(None)

        def worker(wid):
            self.dataset.rng = __import__("random").Random(
                (self.seed + self.epoch) * 1000003 + wid)
            while True:
                task = task_q.get()
                if task is None:
                    result_q.put(None)
                    return
                bid, b = task
                try:
                    result_q.put((bid, _stack([self.dataset[int(i)] for i in b])))
                except Exception as e:  # surface to the consumer
                    result_q.put((bid, e))

        procs = [ctx.Process(target=worker, args=(w,), daemon=True)
                 for w in range(nw)]
        for p in procs:
            p.start()
        try:
            pending: dict[int, dict] = {}
            next_bid, done = 0, 0
            while done < nw or pending or next_bid < len(batches):
                if next_bid in pending:
                    yield pending.pop(next_bid)
                    next_bid += 1
                    continue
                if done == nw and not pending:
                    break
                item = result_q.get()
                if item is None:
                    done += 1
                    continue
                bid, payload = item
                if isinstance(payload, Exception):
                    raise payload
                pending[bid] = payload
        finally:
            for p in procs:
                p.terminate()
            for p in procs:
                p.join(timeout=5)


def prefetch_to_device(iterator, mesh=None, lookahead: int = 2):
    """Device-side double buffering: device_put upcoming batches with their
    mesh shardings while the current step runs (the grain/tf.data-style
    prefetch the reference's DataLoader pipeline lacked)."""
    import collections

    from endosr.parallel.mesh import shard_batch

    buf = collections.deque()
    it = iter(iterator)
    try:
        while True:
            while len(buf) < max(1, lookahead):
                buf.append(shard_batch(next(it), mesh))
            yield buf.popleft()
    except StopIteration:
        while buf:
            yield buf.popleft()


def create_dataloader(dataset, dataset_opt, opt=None, sampler=None):
    """Factory with the reference's signature (``data/__init__.py:7-26``)."""
    phase = dataset_opt["phase"]
    if phase == "train":
        import jax

        num_shards = jax.process_count() if opt and opt.get("dist") else 1
        shard_index = jax.process_index() if opt and opt.get("dist") else 0
        batch_size = dataset_opt["batch_size"] // max(1, num_shards)
        ratio = dataset_opt.get("dataset_enlarge_ratio", 200 if opt and opt.get("dist") else 1)
        seed = 0
        if opt and opt.get("train") and opt["train"].get("manual_seed") is not None:
            seed = int(opt["train"]["manual_seed"])
        return ShardedLoader(
            dataset, batch_size,
            shuffle=dataset_opt.get("use_shuffle", True),
            seed=seed, ratio=ratio, drop_last=True,
            num_shards=num_shards, shard_index=shard_index,
            num_workers=int(dataset_opt.get("n_workers") or 0),
        )
    return ShardedLoader(dataset, 1, shuffle=False, ratio=1, drop_last=False,
                         prefetch=1)
