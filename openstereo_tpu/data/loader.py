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
- thread-pool prefetch of the next batches while the device computes.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, List, Sequence

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
    ):
        self.datasets = build_datasets(data_cfg, mode)
        self.mode = mode
        self.batch_size = batch_size
        self.seed = seed
        self.process_index = process_index
        self.process_count = process_count
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
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

    def _batch_crop_size(self, rng: np.random.Generator):
        """Per-batch uniform crop size (reference dataset_template.py:38-48)."""
        crops = [t for ds in self.datasets for t in ds.transform.transforms
                 if isinstance(t, RandomCrop)]
        if not crops:
            return
        base_h, base_w = crops[0].base_size
        if self.random_type == "range":
            w = int(rng.integers(int(self.w_range[0] * base_w), int(self.w_range[1] * base_w) + 1))
            h = int(rng.integers(int(self.h_range[0] * base_h), int(self.h_range[1] * base_h) + 1))
        elif self.random_type == "choice":
            w = int(rng.choice(self.w_range)) if isinstance(self.w_range, (list, tuple)) else int(self.w_range)
            h = int(rng.choice(self.h_range)) if isinstance(self.h_range, (list, tuple)) else int(self.h_range)
        else:
            raise ValueError(self.random_type)
        for c in crops:
            c.crop_size = (h, w)

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

        def make_batch(b: int) -> Dict[str, np.ndarray]:
            if self.batch_uniform:
                self._batch_crop_size(batch_rng)
            idxs = order[b * self.batch_size : (b + 1) * self.batch_size]
            return self.collate([self._load_one(int(i), epoch) for i in idxs])

        if self.num_workers <= 1 or n_batches <= 1:
            for b in range(n_batches):
                yield make_batch(b)
            return

        # pipelined prefetch: one producer thread per slot ahead of the consumer
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            try:
                for b in range(n_batches):
                    if stop.is_set():
                        return
                    q.put(make_batch(b))
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
