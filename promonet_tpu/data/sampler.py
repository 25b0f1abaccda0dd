"""Deterministic epoch-seeded batch sampling.

Reference: promonet/data/sampler.py — training batches are a
deterministic shuffle seeded RANDOM_SEED + epoch with fixed BATCH_SIZE;
validation/test are sequential batch-size-1.
"""
import numpy as np

import promonet_tpu


class Sampler:

    def __init__(self, length, partition):
        self.length = length
        self.partition = partition
        self.epoch = 0

    def set_epoch(self, epoch):
        """Reseed for the epoch (promonet/data/sampler.py:45-52)"""
        self.epoch = epoch

    def __iter__(self):
        if self.partition.startswith('train'):
            rng = np.random.default_rng(
                promonet_tpu.RANDOM_SEED + self.epoch)
            order = rng.permutation(self.length)
            batch = promonet_tpu.BATCH_SIZE
            for start in range(0, self.length - batch + 1, batch):
                yield order[start:start + batch].tolist()
        else:
            for index in range(self.length):
                yield [index]

    def __len__(self):
        if self.partition.startswith('train'):
            return max(self.length // promonet_tpu.BATCH_SIZE, 0)
        return self.length
