"""Batched data loading with background prefetch.

Replaces the reference's torch DataLoader + mmcv collate
(dmb/data/loaders/builder.py:17-52) with a thread-pool loader: worker
threads decode/transform samples (PNG/PFM decode releases the GIL in
imageio/PIL), batches are collated as stacked numpy arrays, and a small
prefetch queue keeps the accelerator fed. The per-sample transform RNG is
derived from (seed, epoch, index) so any shard is reproducible in isolation.
"""

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from .sampler import EpochSampler, GroupedEpochSampler

_BATCH_KEYS = ("leftImage", "rightImage", "leftDisp", "rightDisp", "flow")


def collate(samples):
    batch = {}
    for k in _BATCH_KEYS:
        if samples[0].get(k) is not None:
            batch[k] = np.stack([s[k] for s in samples]).astype(np.float32)
    batch["original_size"] = samples[0]["original_size"]
    return batch


class DataLoader:
    def __init__(self, dataset, global_batch, shuffle=True, num_shards=1,
                 shard_id=0, seed=0, num_workers=8, prefetch=2,
                 group_flags=None):
        self.dataset = dataset
        if group_flags is not None:
            # aspect-group batching (reference DistributedGroupSampler)
            self.sampler = GroupedEpochSampler(
                len(dataset), global_batch, group_flags, shuffle,
                num_shards, shard_id, seed)
        else:
            self.sampler = EpochSampler(len(dataset), global_batch, shuffle,
                                        num_shards, shard_id, seed)
        self.seed = seed
        self.num_workers = num_workers
        self.prefetch = prefetch

    def steps_per_epoch(self):
        return self.sampler.steps_per_epoch()

    def _load_one(self, epoch, idx):
        rng = np.random.default_rng(
            (self.seed, epoch, int(idx)))
        return self.dataset.__getitem__(int(idx), rng=rng)

    def epoch(self, epoch, start=0):
        """Yield collated batches for one epoch, prefetching in background.

        start: skip the first ``start`` batches without loading them —
        exact mid-epoch resume (the sampler's index schedule is a pure
        function of (seed, epoch), so slicing it reproduces the
        uninterrupted batch sequence; tools/train.py --resume).
        """
        indices = self.sampler.epoch_indices(epoch)
        if start:
            indices = indices[start:]
        q = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            with ThreadPoolExecutor(self.num_workers) as pool:
                for step_idx in indices:
                    if stop.is_set():
                        return
                    samples = list(pool.map(
                        lambda i: self._load_one(epoch, i), step_idx))
                    q.put(collate(samples))
            q.put(None)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    return
                yield batch
        finally:
            stop.set()
