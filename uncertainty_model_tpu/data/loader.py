"""Host data pipeline: threaded decode + batched prefetch into device memory.

Replaces the reference's torch ``DataLoader(num_workers=8)`` (main.py:102-105)
with a thread-pool decoder (PIL releases the GIL during PNG decode) and a
bounded prefetch queue, so host decode overlaps device compute.  Per-sample
RNG streams are derived from (seed, epoch, index) making augmentation
reproducible regardless of worker scheduling.

For data parallelism the loader can shard the index space per host
(``shard_index``/``num_shards``), the analogue of the reference's
``DistributedSampler`` (parallel_main.py:138-142); within one host the
global batch is sharded across local devices by the trainer via
``jax.device_put`` with a NamedSharding.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional

import numpy as np


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        num_workers: int = 8,
        prefetch: int = 4,
        drop_last: bool = False,
        shard_index: int = 0,
        num_shards: int = 1,
    ) -> None:
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.drop_last = drop_last
        self.shard_index = shard_index
        self.num_shards = num_shards
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        """Reseed the shuffle order (DistributedSampler.set_epoch analogue)."""
        self.epoch = epoch

    def __len__(self) -> int:
        n = len(self._shard_indices())
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _shard_indices(self) -> np.ndarray:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng((self.seed, self.epoch))
            order = rng.permutation(n)
        return order[self.shard_index :: self.num_shards]

    def __iter__(self) -> Iterator[dict]:
        indices = self._shard_indices()
        batches = [
            indices[i : i + self.batch_size]
            for i in range(0, len(indices), self.batch_size)
        ]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        out_q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            with ThreadPoolExecutor(self.num_workers) as pool:
                for batch_ids in batches:
                    if stop.is_set():
                        return
                    rngs = [
                        np.random.default_rng((self.seed, self.epoch, int(i)))
                        for i in batch_ids
                    ]
                    samples = list(
                        pool.map(self._fetch_one, batch_ids, rngs)
                    )
                    batch = {
                        "left": np.stack([s["left"] for s in samples]),
                        "right": np.stack([s["right"] for s in samples]),
                    }
                    out_q.put(batch)
            out_q.put(None)

        def _raise_in_queue(e):
            out_q.put(e)

        def produce_safe():
            try:
                produce()
            except BaseException as e:  # surface worker errors to the consumer
                _raise_in_queue(e)

        thread = threading.Thread(target=produce_safe, daemon=True)
        thread.start()

        try:
            while True:
                item = out_q.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            # drain so the producer can exit
            while thread.is_alive():
                try:
                    out_q.get_nowait()
                except queue.Empty:
                    break

    def _fetch_one(self, idx: int, rng: np.random.Generator) -> dict:
        raw = self.dataset.lefts[int(idx)], self.dataset.rights[int(idx)]
        from PIL import Image, ImageFile

        ImageFile.LOAD_TRUNCATED_IMAGES = True
        pair = {
            "left": Image.open(raw[0]).convert("RGB"),
            "right": Image.open(raw[1]).convert("RGB"),
        }
        transform = getattr(self.dataset, "transform", None)
        if transform is not None:
            pair = transform(pair, rng)
        else:
            pair = {k: np.asarray(v, np.float32) / 255.0 for k, v in pair.items()}
        return pair
