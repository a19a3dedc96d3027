"""Input pipeline: deterministic splits, threaded host loading, and
double-buffered device prefetch with mesh sharding.

Replaces the reference's torch DataLoader + pinned-memory `.cuda(non_blocking)`
H2D path (Birds_Eye_View_Loss/Dataloader/Load_Data_new.py:318-324,
main.py:207) with the TPU-native equivalent: a thread pool decoding on the
host, fixed-shape collated numpy batches, and `jax.device_put` onto a
`NamedSharding` over the data axis of the mesh — so each batch lands already
sharded across the ICI domain, with `prefetch` batches in flight.
"""

from __future__ import annotations

import collections
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterable, Iterator, List, Optional, Sequence, Tuple

import jax
import numpy as np


# ----------------------------------------------------------------------
# Deterministic split (Load_Data_new.py:293-308 BEV / :255-270 BP)
# ----------------------------------------------------------------------

def split_indices(num_train: int, split_percentage: float = 0.2,
                  shuffle: bool = True) -> Tuple[List[int], List[int]]:
    """Reference-identical train/val split.

    Seeds the legacy MT19937 stream with `num_train` and shuffles — the exact
    permutation of `np.random.seed(num_train); np.random.shuffle(indices)`
    (Load_Data_new.py:301-303) without touching global RNG state. First
    `split` indices are validation.
    """
    indices = np.arange(num_train)
    split = int(np.floor(split_percentage * num_train))
    if shuffle:
        np.random.RandomState(num_train).shuffle(indices)
    return list(map(int, indices[split:])), list(map(int, indices[:split]))


def _truncate_to_batches(idx: Sequence[int], batch_size: int) -> List[int]:
    """Static-shape guarantee: drop the ragged tail (BEV truncates the index
    lists, Load_Data_new.py:305-306; BP uses drop_last=True, :284-288 — both
    reduce to this)."""
    n = len(idx) // batch_size * batch_size
    return list(idx[:n])


def collate(samples: Sequence[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    """Stack a list of fixed-shape sample dicts into one batch dict."""
    return {k: np.stack([s[k] for s in samples]) for k in samples[0]}


# ----------------------------------------------------------------------
# Threaded loader
# ----------------------------------------------------------------------

class Loader:
    """Epoch-based batch iterator over a `LaneDataset`-like dataset.

    Args:
      dataset: object with `__len__` and `__getitem__(i, *, flip=bool)`.
      indices: dataset indices this loader draws from.
      batch_size: static batch size (ragged tail dropped).
      shuffle: reshuffle per epoch (train) or keep sequential (validation —
        the BP tree's SequentialIndicesSampler, Load_Data_new.py:245-253).
      flip: enable random horizontal flips (train only).
      nworkers: decode thread-pool width.
      seed: base seed; epoch e uses seed+e so runs are reproducible.
      process_index/process_count: multi-host input sharding. `batch_size`
        is the GLOBAL batch; every process computes the identical epoch
        permutation (same seed) and decodes only its contiguous
        `batch_size/process_count` slice of each batch. Defaults to
        `jax.process_index()`/`jax.process_count()`; single-host runs load
        the full batch. DevicePrefetcher assembles the global sharded array
        from the per-process shards.
    """

    def __init__(self, dataset, indices: Sequence[int], batch_size: int,
                 shuffle: bool = True, flip: bool = False, nworkers: int = 8,
                 seed: int = 0, pad_final: bool = False,
                 process_index: Optional[int] = None,
                 process_count: Optional[int] = None):
        self.dataset = dataset
        self.num_real = len(indices)
        indices = list(indices)
        if pad_final and indices and len(indices) % batch_size:
            # Static shapes without dropping data: repeat the final sample
            # (test-set inference; callers slice predictions to `num_real`).
            indices = indices + [indices[-1]] * (
                batch_size - len(indices) % batch_size)
        self.indices = _truncate_to_batches(indices, batch_size)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.flip = flip
        # more decode threads than cores thrash (the decode path is
        # CPU-bound; ctypes/PIL release the GIL but cannot mint cores)
        import os as _os
        self.nworkers = max(1, min(nworkers, _os.cpu_count() or nworkers))
        self.seed = seed
        self._epoch = 0
        self.process_index = (jax.process_index() if process_index is None
                              else process_index)
        self.process_count = (jax.process_count() if process_count is None
                              else process_count)
        if batch_size % self.process_count:
            raise ValueError(
                f"global batch_size {batch_size} must divide evenly over "
                f"{self.process_count} processes")
        self.local_batch_size = batch_size // self.process_count

    def __len__(self) -> int:
        return len(self.indices) // self.batch_size

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch

    def _local_slice(self, b: int) -> slice:
        """This process's contiguous rows of global batch `b` (must align
        with NamedSharding(P('data'))'s row->device layout: process p owns
        rows [p*local : (p+1)*local))."""
        start = b * self.batch_size + self.process_index * self.local_batch_size
        return slice(start, start + self.local_batch_size)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        # The permutation and flip draws are computed identically on every
        # process (same seed), so the global batch composition is agreed on
        # before each process fetches only its local rows.
        rng = np.random.RandomState(self.seed + self._epoch)
        order = np.array(self.indices)
        if self.shuffle:
            rng.shuffle(order)
        flips = (rng.uniform(0.0, 1.0, size=len(order)) > 0.5) & self.flip

        def fetch(args):
            i, f = args
            return self.dataset.__getitem__(int(i), flip=bool(f))

        nb = len(order) // self.batch_size
        if self.nworkers == 1:
            # single worker: decode inline — a one-thread pool only adds GIL
            # convoying against the consumer's device_put RPCs
            for b in range(nb):
                sl = self._local_slice(b)
                yield collate([fetch(a) for a in zip(order[sl], flips[sl])])
            return
        with ThreadPoolExecutor(self.nworkers) as pool:
            # Pipelined: submit batch k+1 while batch k is being consumed.
            pending = collections.deque()
            for b in range(min(2, nb)):
                sl = self._local_slice(b)
                pending.append(pool.map(fetch, zip(order[sl], flips[sl])))
            for b in range(nb):
                samples = list(pending.popleft())
                nxt = b + 2
                if nxt < nb:
                    sl = self._local_slice(nxt)
                    pending.append(pool.map(fetch, zip(order[sl], flips[sl])))
                yield collate(samples)


# ----------------------------------------------------------------------
# Device prefetch
# ----------------------------------------------------------------------

class DevicePrefetcher:
    """Moves host batches onto the device(s) ahead of consumption.

    The TPU-native replacement for pin_memory + non_blocking copies: batches
    are `jax.device_put` onto `sharding` (a NamedSharding over the mesh's data
    axis, or None for single-device) by a background thread, keeping `depth`
    batches in flight so the H2D DMA overlaps the previous step's compute.
    """

    def __init__(self, it: Iterable[Dict[str, np.ndarray]],
                 sharding: Optional[jax.sharding.Sharding] = None,
                 depth: int = 2):
        self._it = iter(it)
        self._sharding = sharding
        self._done = object()
        if depth <= 0:
            # synchronous mode: put on the consumer's thread. On hosts where
            # the device RPC layer serializes poorly across threads (e.g.
            # remote-tunneled devices), the background thread only adds GIL
            # convoying; depth=0 opts out of it. One batch of LOOKAHEAD is
            # still kept: `jax.device_put` is async, so issuing batch n+1's
            # put before handing out batch n lets its H2D transfer ride the
            # consumer's compute on batch n without any extra thread
            # (VERDICT r04 item 4 — measured on the tunnel host by
            # tools/prof_feed.py).
            self._thread = None
            self._pending = None
            self._primed = False
            return
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _put(self, batch):
        if self._sharding is None:
            return jax.device_put(batch)
        if jax.process_count() > 1:
            # Multi-controller: each process holds only its local rows;
            # assemble the global sharded array without any cross-host copy.
            pc = jax.process_count()

            def put_one(x):
                global_shape = (x.shape[0] * pc,) + x.shape[1:]
                return jax.make_array_from_process_local_data(
                    self._sharding, x, global_shape)

            return jax.tree_util.tree_map(put_one, batch)
        return jax.device_put(batch, self._sharding)

    def _run(self):
        try:
            for batch in self._it:
                self._q.put(self._put(batch))
        finally:
            self._q.put(self._done)

    def __iter__(self):
        return self

    def __next__(self):
        if self._thread is None:
            if not self._primed:
                self._pending = self._put(next(self._it))
                self._primed = True
            cur = self._pending
            try:
                self._pending = self._put(next(self._it))
            except StopIteration:
                self._pending = None
                self._primed = False
            return cur
        item = self._q.get()
        if item is self._done:
            raise StopIteration
        return item


# ----------------------------------------------------------------------
# Factories mirroring the reference entry points
# ----------------------------------------------------------------------

def get_loader(dataset_factory, num_train: int, batch_size: int,
               val_batch_size: Optional[int] = None, shuffle: bool = True,
               nworkers: int = 8, flip_on: bool = False,
               split_percentage: float = 0.2, seed: int = 0
               ) -> Tuple[Loader, Loader, List[int]]:
    """Split + build train/val loaders.

    Parity with `get_loader` (Load_Data_new.py:293-326 BEV / :255-290 BP).
    `dataset_factory(valid_idx)` builds the dataset (it needs the validation
    indices to suppress flips on validation images).
    """
    train_idx, valid_idx = split_indices(num_train, split_percentage, shuffle)
    dataset = dataset_factory(valid_idx)
    train_loader = Loader(dataset, train_idx, batch_size, shuffle=True,
                          flip=flip_on, nworkers=nworkers, seed=seed)
    valid_loader = Loader(dataset, valid_idx,
                          val_batch_size or batch_size, shuffle=False,
                          flip=False, nworkers=nworkers, seed=seed)
    return train_loader, valid_loader, valid_idx


def get_testloader(test_set, batch_size: int, nworkers: int = 8) -> Loader:
    """Sequential loader over a `LaneTestSet`
    (Backprojection_Loss/Load_Data_new.py:29-40). The final ragged batch is
    padded by repeating the last image (drop_last=False semantics with static
    shapes); callers slice predictions to `loader.num_real`."""
    return Loader(test_set, range(len(test_set)), batch_size, shuffle=False,
                  flip=False, nworkers=nworkers, pad_final=True)
