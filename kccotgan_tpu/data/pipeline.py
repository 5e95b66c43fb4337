"""Host-side batching + device prefetch.

The reference pulls batches through eager tf.data / Python generators
that would starve a TPU (`kernel_train.py:297`, SURVEY.md section 3.5).
Here the host pipeline is a thin numpy iterator with a background
prefetch thread that stages the next batch onto the device (or a
sharded global batch across a mesh) while the current step runs.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator

import jax
import numpy as np

__all__ = ["ArrayDataset", "GeneratorDataset", "device_prefetch"]


class ArrayDataset:
    """In-memory film-strip dataset ``[N, H, T, W, C]`` with epoch
    shuffling and ragged-tail dropping (the reference skips ragged
    batches, `kernel_train.py:298-299`)."""

    def __init__(self, data: np.ndarray, batch_size: int, *, seed: int = 0, drop_remainder: bool = True):
        if data.ndim != 5:
            raise ValueError(f"expected [N,H,T,W,C] film-strip, got {data.shape}")
        self.data = data
        self.batch_size = batch_size
        self.drop_remainder = drop_remainder
        self._rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        return len(self.data) // self.batch_size

    def epoch(self, shuffle: bool = True) -> Iterator[np.ndarray]:
        idx = np.arange(len(self.data))
        if shuffle:
            self._rng.shuffle(idx)
        n_full = len(idx) // self.batch_size
        for i in range(n_full):
            sel = idx[i * self.batch_size : (i + 1) * self.batch_size]
            yield self.data[sel]

    def repeat(self, epochs: int, shuffle: bool = True) -> Iterator[np.ndarray]:
        for _ in range(epochs):
            yield from self.epoch(shuffle)


class GeneratorDataset:
    """Wraps a Python sample generator factory into batched epochs
    (KTH/Penn-style loaders, `data_utils.py:114-205`)."""

    def __init__(self, gen_factory: Callable[[], Iterator[np.ndarray]], batch_size: int):
        self.gen_factory = gen_factory
        self.batch_size = batch_size

    def repeat(self, epochs: int, shuffle: bool = True) -> Iterator[np.ndarray]:
        del shuffle
        for _ in range(epochs):
            buf = []
            for sample in self.gen_factory():
                buf.append(np.asarray(sample, dtype=np.float32))
                if len(buf) == self.batch_size:
                    yield np.stack(buf)
                    buf = []


def device_prefetch(
    it: Iterator[np.ndarray],
    *,
    size: int = 2,
    sharding=None,
) -> Iterator[jax.Array]:
    """Stage host batches onto device(s) from a background thread.

    ``sharding`` may be a ``jax.sharding.Sharding`` to place the global
    batch across a mesh; default is the single default device.
    """
    q: queue.Queue = queue.Queue(maxsize=size)
    _SENTINEL = object()

    def producer():
        try:
            for batch in it:
                arr = jax.device_put(batch, sharding) if sharding is not None else jax.device_put(batch)
                q.put(arr)
        except Exception as e:  # surface loader errors on the consumer side
            q.put(e)
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            return
        if isinstance(item, Exception):
            raise item
        yield item
