"""Dynamic Chunk Training configuration.

Capability parity with the reference's
``speechbrain/utils/dynamic_chunk_training.py`` (DynChunkTrainConfig :24,
DynChunkTrainConfigRandomSampler :61): chunked attention for streaming-
capable models, with per-batch sampled chunk sizes at train time.
"""

from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class DynChunkTrainConfig:
    """Chunk size (in frames after subsampling) + left context (in chunks).

    ``left_context_size=None`` means unlimited left context.
    """

    chunk_size: int
    left_context_size: int = None

    def is_infinite_left_context(self):
        return self.left_context_size is None

    def left_context_size_frames(self):
        if self.left_context_size is None:
            return None
        return self.chunk_size * self.left_context_size


class DynChunkTrainConfigRandomSampler:
    """Sample a DynChunkTrainConfig per batch (reference :61):
    with prob ``chunkwise_prob`` train chunked (random size in range),
    else full-context; valid/test use fixed configs."""

    def __init__(
        self,
        chunkwise_prob=0.6,
        chunk_size_min=8,
        chunk_size_max=32,
        limited_left_context_prob=0.75,
        left_context_chunks_min=2,
        left_context_chunks_max=32,
        test_config=None,
        valid_config=None,
        seed=875,
    ):
        self.chunkwise_prob = chunkwise_prob
        self.chunk_size_min = chunk_size_min
        self.chunk_size_max = chunk_size_max
        self.limited_left_context_prob = limited_left_context_prob
        self.left_context_chunks_min = left_context_chunks_min
        self.left_context_chunks_max = left_context_chunks_max
        self.test_config = test_config
        self.valid_config = valid_config
        self._rng = np.random.default_rng(seed)

    def __call__(self, stage):
        from speechbrain_tpu.core import Stage

        if stage == Stage.TRAIN:
            if self._rng.random() < self.chunkwise_prob:
                chunk_size = int(
                    self._rng.integers(self.chunk_size_min, self.chunk_size_max + 1)
                )
                if self._rng.random() < self.limited_left_context_prob:
                    left = int(
                        self._rng.integers(
                            self.left_context_chunks_min,
                            self.left_context_chunks_max + 1,
                        )
                    )
                else:
                    left = None
                return DynChunkTrainConfig(chunk_size, left)
            return None
        if stage == Stage.VALID:
            return self.valid_config
        return self.test_config
