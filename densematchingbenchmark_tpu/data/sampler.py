"""Deterministic epoch-seeded sampling + host sharding.

Parity target: dmb/data/loaders/samplers.py:12-159 (DistributedSampler /
DistributedGroupSampler): shuffle with the epoch as seed, pad the index list
to be divisible by the global batch, then stride-shard across hosts. In the
TPU build each *host* (jax.process_index) loads its shard of the global
batch; chips within a host get their slice via the batch sharding.
"""

import logging

import numpy as np


class EpochSampler:
    def __init__(self, dataset_len, global_batch, shuffle=True,
                 num_shards=1, shard_id=0, seed=0):
        assert global_batch % num_shards == 0
        self.n = dataset_len
        self.global_batch = global_batch
        self.per_shard = global_batch // num_shards
        self.shuffle = shuffle
        self.num_shards = num_shards
        self.shard_id = shard_id
        self.seed = seed

    def epoch_indices(self, epoch):
        """[steps, per_shard] index array for this shard."""
        if self.shuffle:
            rng = np.random.default_rng(self.seed * 1000003 + epoch)
            idx = rng.permutation(self.n)
        else:
            idx = np.arange(self.n)
        total = int(np.ceil(self.n / self.global_batch)) * self.global_batch
        if total > self.n:  # wrap-around padding (reference behavior)
            idx = np.concatenate([idx, idx[:total - self.n]])
        idx = idx.reshape(-1, self.global_batch)
        lo = self.shard_id * self.per_shard
        return idx[:, lo:lo + self.per_shard]

    def steps_per_epoch(self):
        return int(np.ceil(self.n / self.global_batch))


class GroupedEpochSampler(EpochSampler):
    """Aspect-group-aware epoch sampler.

    Parity target: dmb/data/loaders/samplers.py:12-159
    (DistributedGroupSampler): every batch is drawn from ONE aspect-ratio
    group (flag), so mixed-size datasets (KITTI 2012+2015 trains mix
    376/375/370-high frames) never pad a batch across shapes. Per epoch:
    shuffle within each group (epoch-seeded), wrap-pad each group to a
    multiple of the global batch, chunk into batches, shuffle the batch
    order, then stride-shard columns across hosts like EpochSampler.

    flags: int array [dataset_len] (e.g. aspect_group_flags()).
    """

    def __init__(self, dataset_len, global_batch, flags, shuffle=True,
                 num_shards=1, shard_id=0, seed=0):
        super().__init__(dataset_len, global_batch, shuffle, num_shards,
                         shard_id, seed)
        flags = np.asarray(flags, np.int64)
        assert flags.shape == (dataset_len,), (flags.shape, dataset_len)
        self.flags = flags
        self._steps = sum(
            int(np.ceil(c / global_batch))
            for c in np.bincount(flags) if c > 0)

    def epoch_indices(self, epoch):
        rng = np.random.default_rng(self.seed * 1000003 + epoch)
        batches = []
        for g in np.unique(self.flags):
            idx = np.where(self.flags == g)[0]
            if self.shuffle:
                idx = rng.permutation(idx)
            total = int(np.ceil(len(idx) / self.global_batch)) \
                * self.global_batch
            if total > len(idx):
                idx = np.concatenate([idx, idx[:total - len(idx)]])
            batches.append(idx.reshape(-1, self.global_batch))
        batches = np.concatenate(batches, axis=0)
        if self.shuffle:
            batches = batches[rng.permutation(len(batches))]
        lo = self.shard_id * self.per_shard
        return batches[:, lo:lo + self.per_shard]

    def steps_per_epoch(self):
        return self._steps


def aspect_group_flags(dataset):
    """flag[i] = 1 if width > height else 0 (mmdetection convention used by
    the reference's GroupSampler). Reads sizes from the annotation list when
    present ('height'/'width' keys); falls back to loading sample 0's
    original_size for homogeneous datasets."""
    items = getattr(dataset, "data_list", None)
    n = len(dataset)
    if items and all("height" in it and "width" in it for it in items):
        return np.asarray(
            [1 if it["width"] > it["height"] else 0 for it in items],
            np.int64)
    sample = dataset.__getitem__(0, rng=np.random.default_rng(0)) \
        if hasattr(dataset, "__getitem__") else dataset[0]
    h, w = sample["original_size"]
    if n > 1:
        logging.getLogger("dmb").warning(
            "aspect_group_flags: annotations carry no per-item height/width; "
            "grouping all %d samples by sample 0's aspect (%dx%d). A "
            "mixed-size dataset will NOT be aspect-grouped — add "
            "height/width to the annotation entries.", n, h, w)
    return np.full(n, 1 if w > h else 0, np.int64)
