"""Data loading with background prefetch.

Replaces the reference's torch DataLoader + 10 worker processes
(promonet/data/loader.py): a thread pool maps `Dataset.__getitem__` over
the sampled indices and a bounded queue keeps batches ready while the TPU
steps — host IO overlaps device compute without process-spawn overhead.
"""
import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np

import promonet_tpu
from .collate import collate
from .dataset import Dataset
from .sampler import Sampler


class Loader:

    def __init__(self, dataset, partition, num_workers=None, prefetch=2):
        self.dataset = dataset
        self.partition = partition
        self.train = partition.startswith('train')
        self.sampler = Sampler(len(dataset), partition)
        self.num_workers = (
            promonet_tpu.NUM_WORKERS if num_workers is None else num_workers)
        self.prefetch = prefetch

    def _load_batch(self, indices, epoch):
        items = []
        for index in indices:
            if self.train:
                rng = np.random.default_rng(
                    (promonet_tpu.RANDOM_SEED, epoch, index))
                item = self.dataset.load_item(index, chunk_rng=rng)
            else:
                item = self.dataset[index]
            items.append(item)
        return collate(items, pad_to_bucket=not self.train)

    def __iter__(self):
        epoch = self.sampler.epoch
        batches = list(self.sampler)
        if not batches:
            return
        out = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            with ThreadPoolExecutor(self.num_workers) as pool:
                futures = [
                    pool.submit(self._load_batch, indices, epoch)
                    for indices in batches]
                for future in futures:
                    if stop.is_set():
                        return
                    out.put(future.result())
            out.put(None)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                batch = out.get()
                if batch is None:
                    return
                yield batch
        finally:
            stop.set()

    def __len__(self):
        return len(self.sampler)


def loader(dataset, partition, adapt=False, gpu=None):
    """Build a loader (reference: promonet/data/loader.py:11-22)"""
    return Loader(Dataset(dataset, partition), partition)
