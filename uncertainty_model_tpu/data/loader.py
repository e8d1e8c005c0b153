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
        backend: str = "auto",  # 'auto' | 'native' | 'pil'
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
        self.backend = backend
        self._native_size = self._native_decode_size() if backend != "pil" else None

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

    def _native_decode_size(self):
        """When the transform is a standard Compose whose first stage is a
        ResizeImage, the native C++ decoder can fuse decode+resize+to-float;
        the remaining transforms run on arrays with the same RNG draw order
        as the PIL path (bit-identical augmentations)."""
        from .transforms import Compose, ResizeImage, ToArray

        transform = getattr(self.dataset, "transform", None)
        if not isinstance(transform, Compose) or not transform.transforms:
            return None
        first = transform.transforms[0]
        if not isinstance(first, ResizeImage):
            return None
        for t in transform.transforms[1:]:
            if isinstance(t, (ResizeImage, ToArray)):
                continue
            if not hasattr(t, "probability"):  # unknown transform: PIL path
                return None
        if self.backend == "native":
            return first.size
        try:
            from .native import native_available

            return first.size if native_available() else None
        except Exception:
            return None

    def _apply_post_decode(self, left: np.ndarray, right: np.ndarray,
                           rng: np.random.Generator) -> dict:
        """Replay the transform stack on decoded arrays, drawing RNG in the
        same order as the PIL path (flip before augment)."""
        from .transforms import Compose, RandomAugment, RandomFlip, ResizeImage, ToArray

        transform: Compose = self.dataset.transform
        pair = {"left": left, "right": right}
        for t in transform.transforms:
            if isinstance(t, (ResizeImage, ToArray)):
                continue
            if isinstance(t, RandomFlip):
                if rng.random() < t.probability:
                    pair = {
                        "left": np.ascontiguousarray(pair["left"][:, ::-1]),
                        "right": np.ascontiguousarray(pair["right"][:, ::-1]),
                    }
            elif isinstance(t, RandomAugment):
                pair = t(pair, rng)
        return pair

    def _native_batch(self, batch_ids, rngs) -> dict:
        from .native import decode_resize_batch

        h, w = self._native_size
        paths = [self.dataset.lefts[int(i)] for i in batch_ids] + \
            [self.dataset.rights[int(i)] for i in batch_ids]
        decoded = decode_resize_batch(paths, h, w, num_threads=self.num_workers)
        n = len(batch_ids)
        lefts, rights = [], []
        for j, rng in enumerate(rngs):
            pair = self._apply_post_decode(decoded[j], decoded[n + j], rng)
            lefts.append(pair["left"])
            rights.append(pair["right"])
        return {"left": np.stack(lefts), "right": np.stack(rights)}

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
                    if self._native_size is not None:
                        batch = self._native_batch(batch_ids, rngs)
                    else:
                        samples = list(pool.map(self._fetch_one, batch_ids, rngs))
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
