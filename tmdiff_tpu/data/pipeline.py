"""Host-side input pipeline: infinite shuffled batches + sensor mixing.

The reference drives three torch DataLoaders through infinite generators and
each step draws one sensor with probability ∝ 4·len(QB) : 4·len(GF2) :
8·len(WV3) (`general_sharpening_joint_random_batch_finetune.py:45-53,
155-165`). Here the mixer is an explicit seeded numpy RNG (reproducible) and
batches are sliced numpy views handed to `jax.device_put` with the desired
sharding by the trainer.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from tmdiff_tpu.data.h5 import PanDataset


class BatchIterator:
    """Infinite shuffled epoch cycler over a :class:`PanDataset`."""

    def __init__(self, dataset: PanDataset, batch_size: int,
                 shuffle: bool = True, seed: int = 3407,
                 drop_last: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.rng = np.random.default_rng(seed)
        self._order = np.arange(len(dataset))
        self._pos = len(dataset)  # trigger reshuffle on first draw

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self):
        return self

    def __next__(self) -> dict:
        n = len(self.dataset)
        if self._pos + self.batch_size > n:
            if self.shuffle:
                self.rng.shuffle(self._order)
            self._pos = 0
        idx = self._order[self._pos : self._pos + self.batch_size]
        self._pos += self.batch_size
        return self.dataset.batch(idx)


class SensorMixer:
    """Per-step probabilistic sensor selection.

    weights default to the reference's 4:4:8 scaling of per-sensor loader
    lengths; probabilities are length-weighted so larger datasets are drawn
    proportionally more often.
    """

    DEFAULT_WEIGHTS = {"QB": 4.0, "GF2": 4.0, "WV3": 8.0}

    def __init__(self, iterators: dict[str, BatchIterator],
                 weights: Optional[dict[str, float]] = None, seed: int = 3407):
        self.iterators = iterators
        weights = weights or {
            k: self.DEFAULT_WEIGHTS.get(k, 1.0) for k in iterators
        }
        raw = np.array(
            [weights[k] * len(iterators[k]) for k in iterators], dtype=np.float64
        )
        self.sensors = list(iterators.keys())
        self.probs = raw / raw.sum()
        self.rng = np.random.default_rng(seed)

    def __next__(self) -> tuple[dict, str]:
        sensor = self.sensors[self.rng.choice(len(self.sensors), p=self.probs)]
        return next(self.iterators[sensor]), sensor

    def __iter__(self):
        return self
