"""Host-side prefetching frame loader: keep the chip fed.

The reference hides its CPU voxelization + label generation inside 4-16
torch DataLoader workers (tools/train.py:57-72). Here voxelization is
already on-device (data/voxelizer.py, inside the jitted frame_to_batch),
so the host's only job is disk IO + yaml parse + numpy frame assembly —
this module overlaps that with device compute:

  - worker THREADS pull frames from the dataset (file reads and the
    native .bin decoder release the GIL);
  - the main thread turns each ready frame into a device batch with
    frame_to_batch, whose dispatch is async — the device voxelizes batch
    t+k while computing on batch t;
  - consumption order is deterministic (futures resolved in submit
    order), so runs are reproducible regardless of worker count.

Pairs with parallel/serving.serve_stream for end-to-end continuous
batching: disk -> host threads -> async voxelize -> SPMD step.
"""

import collections
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional, Sequence

import numpy as np

from quantv2x_tpu.data.pipeline import frame_to_batch


class PrefetchLoader:
    """Iterate device-ready batches over an index-able frame source.

    source: V2XDataset / DAIRV2XDataset / V2XSIMDataset / list of frames.
    shuffle: reshuffle the index order each epoch (train mode).
    reinitialize: call source.reinitialize() at each epoch start (the
        reference's per-epoch cav reshuffle, train.py:219).
    """

    def __init__(self, source, voxel_cfg, max_cav: int = 2,
                 workers: int = 4, prefetch: int = 4,
                 indices: Optional[Sequence[int]] = None,
                 shuffle: bool = False, reinitialize: bool = False,
                 seed: int = 0):
        self.source = source
        self.voxel_cfg = voxel_cfg
        self.max_cav = max_cav
        self.workers = max(1, workers)
        self.prefetch = max(1, prefetch)
        self.indices = list(indices if indices is not None
                            else range(len(source)))
        self.shuffle = shuffle
        self.reinitialize = reinitialize
        self._rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.indices)

    def _epoch_indices(self):
        idxs = list(self.indices)
        if self.shuffle:
            self._rng.shuffle(idxs)
        return idxs

    def __iter__(self) -> Iterator:
        if self.reinitialize and hasattr(self.source, "reinitialize"):
            self.source.reinitialize()
        idxs = self._epoch_indices()
        with ThreadPoolExecutor(self.workers) as pool:
            pending = collections.deque()
            it = iter(idxs)
            for _ in range(self.prefetch):
                i = next(it, None)
                if i is None:
                    break
                pending.append(pool.submit(self.source.__getitem__, i))
            while pending:
                frame = pending.popleft().result()
                i = next(it, None)
                if i is not None:
                    pending.append(pool.submit(self.source.__getitem__, i))
                # async dispatch: device voxelizes while workers read disk
                yield frame_to_batch(frame, self.voxel_cfg,
                                     max_cav=self.max_cav)

    def epochs(self, n: int) -> Iterator:
        """n epochs of batches (reshuffle/reinitialize at each start)."""
        for _ in range(n):
            yield from self
