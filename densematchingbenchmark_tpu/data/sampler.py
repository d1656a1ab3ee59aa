"""Deterministic epoch-seeded sampling + host sharding.

Parity target: dmb/data/loaders/samplers.py:12-159 (DistributedSampler /
DistributedGroupSampler): shuffle with the epoch as seed, pad the index list
to be divisible by the global batch, then stride-shard across hosts. In the
TPU build each *host* (jax.process_index) loads its shard of the global
batch; chips within a host get their slice via the batch sharding.
"""

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
