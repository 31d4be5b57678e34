"""Host-side batch loader.

TPU-native replacement for the reference's torch DataLoader stack
(reference: stereo/datasets/__init__.py:38-73 — ConcatDataset +
DistributedSampler + custom_collate):

- multi-dataset concat over DATA_INFOS;
- deterministic per-epoch shuffling and per-sample RNG derived from
  (seed, epoch, index) — no global RNG state, so any worker layout gives
  identical augmentations;
- multi-host sharding by `(process_index, process_count)` with pad-to-divisible
  semantics like torch's DistributedSampler: eval dedups by sample 'index'
  downstream;
- batch-uniform random crop: the crop size is re-drawn once per batch and
  applied to every sample in it (reference dataset_template.py:38-60);
- `num_workers` threads decode/augment the samples of a batch in parallel
  (PIL decode and the numpy augmentations drop the GIL), and a producer
  thread keeps `prefetch` batches ahead of the consumer — the reference's
  num_workers DataLoader processes (stereo/datasets/__init__.py:38-73)
  without the process-spawn/serialize overhead.
"""

from __future__ import annotations

import multiprocessing as mp
import queue
import threading
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from ..config import Config
from ..registry import DATASETS
from .datasets import DatasetTemplate
from .transforms import RandomCrop


def build_datasets(data_cfg: Config, mode: str) -> List[DatasetTemplate]:
    return [
        DATASETS.get(info.DATASET)(data_info=info, data_cfg=data_cfg, mode=mode)
        for info in data_cfg.DATA_INFOS
    ]


class StereoDataLoader:
    def __init__(
        self,
        data_cfg: Config,
        batch_size: int,
        mode: str = "training",
        seed: int = 0,
        process_index: int = 0,
        process_count: int = 1,
        num_workers: int = 2,
        prefetch: int = 2,
        worker_type: str = "thread",
    ):
        self.datasets = build_datasets(data_cfg, mode)
        self.mode = mode
        self.batch_size = batch_size
        self.seed = seed
        self.process_index = process_index
        self.process_count = process_count
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        # 'thread': num_workers threads decode one batch's samples in
        # parallel — cheap, but cv2/numpy augmentations partly hold the GIL.
        # 'process': fork num_workers worker processes (the reference
        # DataLoader model) — full parallelism; fork BEFORE creating heavy
        # device state, or use it from a dedicated data host.
        assert worker_type in ("thread", "process"), worker_type
        self.worker_type = worker_type
        self.shuffle = mode == "training"

        # concat index: (dataset_id, local_idx) and a global flat index
        self._index: List[tuple] = []
        for di, ds in enumerate(self.datasets):
            self._index.extend((di, i) for i in range(len(ds)))

        tcfg = data_cfg.DATA_TRANSFORM
        self.batch_uniform = bool(tcfg.get("BATCH_UNIFORM", False)) and self.shuffle
        self.random_type = tcfg.get("RANDOM_TYPE", None)
        self.h_range = tcfg.get("H_RANGE", None)
        self.w_range = tcfg.get("W_RANGE", None)

    def __len__(self) -> int:
        """Batches per epoch for this process."""
        n = len(self._index)
        per_proc = -(-n // self.process_count) if n else 0
        return -(-per_proc // self.batch_size) if per_proc else 0

    @property
    def steps_per_epoch(self) -> int:
        return len(self)

    def _epoch_order(self, epoch: int) -> np.ndarray:
        n = len(self._index)
        order = np.arange(n)
        if self.shuffle:
            order = np.random.default_rng((self.seed, epoch)).permutation(n)
        # pad to a multiple of (process_count * batch_size) by wrapping, so all
        # processes take equal numbers of equal-size batches (static shapes)
        chunk = self.process_count * self.batch_size
        pad = (-n) % chunk
        if pad:
            order = np.concatenate([order, order[:pad]])
        return order[self.process_index :: self.process_count]

    def _crops(self) -> List[RandomCrop]:
        return [t for ds in self.datasets for t in ds.transform.transforms
                if isinstance(t, RandomCrop)]

    def _draw_crop_size(self, rng: np.random.Generator) -> Optional[Tuple[int, int]]:
        """Per-batch uniform crop size (reference dataset_template.py:38-48)."""
        crops = self._crops()
        if not crops:
            return None
        base_h, base_w = crops[0].base_size
        if self.random_type == "range":
            w = int(rng.integers(int(self.w_range[0] * base_w), int(self.w_range[1] * base_w) + 1))
            h = int(rng.integers(int(self.h_range[0] * base_h), int(self.h_range[1] * base_h) + 1))
        elif self.random_type == "choice":
            w = int(rng.choice(self.w_range)) if isinstance(self.w_range, (list, tuple)) else int(self.w_range)
            h = int(rng.choice(self.h_range)) if isinstance(self.h_range, (list, tuple)) else int(self.h_range)
        else:
            raise ValueError(self.random_type)
        return (h, w)

    def _apply_crop_size(self, hw: Optional[Tuple[int, int]]):
        if hw is not None:
            for c in self._crops():
                c.crop_size = hw

    def _load_one(self, flat_idx: int, epoch: int) -> Dict:
        di, li = self._index[flat_idx]
        rng = np.random.default_rng((self.seed, epoch, flat_idx))
        sample = self.datasets[di].load(li, rng=rng)
        sample["index"] = flat_idx
        return sample

    @staticmethod
    def collate(samples: Sequence[Dict]) -> Dict[str, np.ndarray]:
        batch: Dict[str, np.ndarray] = {}
        for k in samples[0]:
            vals = [s[k] for s in samples]
            if isinstance(vals[0], np.ndarray):
                batch[k] = np.stack(vals).astype(np.float32)
            elif isinstance(vals[0], (int, float, np.integer, np.floating)):
                batch[k] = np.asarray(vals)
            else:  # strings (names) — keep as list
                batch[k] = vals
        return batch

    def epoch(self, epoch: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        order = self._epoch_order(epoch)
        n_batches = len(order) // self.batch_size
        batch_rng = np.random.default_rng((self.seed, epoch, 0xB17C4))

        def batch_plan(b: int):
            """(sample indices, crop size) for batch b — crop drawn once per
            batch in order, so every worker layout sees identical batches."""
            crop_hw = self._draw_crop_size(batch_rng) if self.batch_uniform else None
            idxs = [int(i) for i in
                    order[b * self.batch_size : (b + 1) * self.batch_size]]
            return idxs, crop_hw

        def make_batch_local(b: int, pool) -> Dict[str, np.ndarray]:
            idxs, crop_hw = batch_plan(b)
            self._apply_crop_size(crop_hw)
            if pool is None or len(idxs) <= 1:
                samples = [self._load_one(i, epoch) for i in idxs]
            else:
                # the RandomCrop mutation above is visible to the pool's
                # threads and is only re-drawn after all futures complete
                samples = list(pool.map(
                    lambda i: self._load_one(i, epoch), idxs))
            return self.collate(samples)

        if self.num_workers <= 1 or n_batches <= 1:
            for b in range(n_batches):
                yield make_batch_local(b, None)
            return

        if self.worker_type == "process":
            yield from self._epoch_process(epoch, n_batches, batch_plan)
            return

        # threads: a producer keeps `prefetch` batches ahead of the consumer;
        # each batch's samples decode in parallel on the worker pool
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            def producer():
                try:
                    for b in range(n_batches):
                        if stop.is_set():
                            return
                        q.put(make_batch_local(b, pool))
                finally:
                    q.put(None)

            t = threading.Thread(target=producer, daemon=True)
            t.start()
            try:
                while True:
                    item = q.get()
                    if item is None:
                        break
                    yield item
            finally:
                stop.set()

    def _epoch_process(self, epoch: int, n_batches: int, batch_plan):
        """Fork-based workers (the reference DataLoader model,
        stereo/datasets/__init__.py:38-73): every sample load runs in a
        separate process, so cv2/numpy GIL time parallelises fully. Crop
        sizes travel explicitly with each task — workers never rely on the
        parent's mutated RandomCrop state."""
        global _FORK_LOADER
        _FORK_LOADER = self
        ctx = mp.get_context("fork")
        with ProcessPoolExecutor(max_workers=self.num_workers,
                                 mp_context=ctx) as pool:
            # keep `prefetch` whole batches in flight
            pending: "queue.Queue" = queue.Queue()
            next_b = 0
            for _ in range(min(1 + self.prefetch, n_batches)):
                idxs, crop_hw = batch_plan(next_b)
                pending.put([pool.submit(_fork_load_one, i, epoch, crop_hw)
                             for i in idxs])
                next_b += 1
            while not pending.empty():
                futs = pending.get()
                batch = self.collate([f.result() for f in futs])
                if next_b < n_batches:
                    idxs, crop_hw = batch_plan(next_b)
                    pending.put([pool.submit(_fork_load_one, i, epoch, crop_hw)
                                 for i in idxs])
                    next_b += 1
                yield batch


# fork-inherited loader handle for process workers: set in the parent just
# before the pool forks; each child gets a private copy-on-write snapshot
_FORK_LOADER: Optional[StereoDataLoader] = None


def _fork_load_one(flat_idx: int, epoch: int,
                   crop_hw: Optional[Tuple[int, int]]) -> Dict:
    ldr = _FORK_LOADER
    ldr._apply_crop_size(crop_hw)
    return ldr._load_one(flat_idx, epoch)
