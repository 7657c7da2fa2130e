"""Samplers: reproducible shuffling, dynamic length-bucketed batching,
multi-host sharding.

Capability parity with the reference's ``speechbrain/dataio/sampler.py``
(ReproducibleRandomSampler :34, ReproducibleWeightedRandomSampler :118,
ConcatDatasetBatchSampler :200, DynamicBatchSampler :321,
DistributedSamplerWrapper :739, BalancingDataSampler :777), built on
numpy RNG instead of torch generators. The multi-host equivalent of
DistributedSampler shards the *index stream* per JAX process.
"""

import math

import numpy as np

from speechbrain_tpu.utils.logger import get_logger

logger = get_logger(__name__)


class ReproducibleRandomSampler:
    """Shuffles indices deterministically from (seed, epoch).

    Call ``set_epoch`` each epoch for a fresh but reproducible order.

    Example
    -------
    >>> s = ReproducibleRandomSampler(list(range(5)), seed=17)
    >>> a = list(s); s.set_epoch(1); b = list(s)
    >>> sorted(a) == sorted(b) == list(range(5))
    True
    """

    def __init__(self, data_source, seed=563375142, epoch=0):
        if not isinstance(seed, int):
            raise ValueError(f"Random seed must be an integer, got {seed}")
        self.data_source = data_source
        self.seed = seed
        self.epoch = epoch

    def set_epoch(self, epoch):
        self.epoch = epoch

    def __iter__(self):
        rng = np.random.default_rng(self.seed + self.epoch)
        yield from rng.permutation(len(self.data_source)).tolist()

    def __len__(self):
        return len(self.data_source)


class SequentialSampler:
    """Indices in order 0..n-1."""

    def __init__(self, data_source):
        self.data_source = data_source

    def __iter__(self):
        return iter(range(len(self.data_source)))

    def __len__(self):
        return len(self.data_source)


class ReproducibleWeightedRandomSampler:
    """Weighted sampling with replacement, reproducible from (seed, epoch)."""

    def __init__(self, weights, num_samples, replacement=True, seed=129491412, epoch=0):
        self.weights = np.asarray(weights, dtype=np.float64)
        self.num_samples = num_samples
        self.replacement = replacement
        self.seed = seed
        self.epoch = epoch

    def set_epoch(self, epoch):
        self.epoch = epoch

    def __iter__(self):
        rng = np.random.default_rng(self.seed + self.epoch)
        p = self.weights / self.weights.sum()
        idx = rng.choice(
            len(self.weights), size=self.num_samples, replace=self.replacement, p=p
        )
        yield from idx.tolist()

    def __len__(self):
        return self.num_samples


class BalancingDataSampler(ReproducibleWeightedRandomSampler):
    """Balance a dataset by inverse frequency of a key's values."""

    def __init__(self, dataset, key, num_samples=None, replacement=True,
                 seed=563375142, epoch=0):
        self.dataset = dataset
        self.key = key
        if not num_samples:
            num_samples = len(dataset)
        weights = self._get_samples_weights()
        super().__init__(weights, num_samples, replacement, seed, epoch)

    def _get_samples_weights(self):
        with self.dataset.output_keys_as([self.key]):
            values = [item[self.key] for item in self.dataset]
        uniq, inverse, counts = np.unique(
            np.asarray(values), return_inverse=True, return_counts=True
        )
        return 1.0 / counts[inverse]


class ConcatDatasetBatchSampler:
    """Batch sampler drawing a fixed sub-batch from each of several datasets
    (for multi-corpus training); iterates as long as the shortest sampler."""

    def __init__(self, samplers, batch_sizes, epoch=0):
        if not isinstance(samplers, (list, tuple)) or not isinstance(
            batch_sizes, (list, tuple)
        ):
            raise ValueError("samplers and batch_sizes must be lists")
        if len(batch_sizes) != len(samplers):
            raise ValueError("samplers and batch_sizes must have the same length")
        self.batch_sizes = batch_sizes
        self.samplers = samplers
        # offsets of each dataset inside the concatenated index space
        self.offsets = [0] + list(
            np.cumsum([len(x) for x in samplers])[:-1]
        )
        self.epoch = epoch
        self.set_epoch(self.epoch)

    def _iter_one_dataset(self, c_batch_size, c_sampler, c_offset):
        batch = []
        for idx in c_sampler:
            batch.append(c_offset + idx)
            if len(batch) == c_batch_size:
                yield batch
                batch = []

    def set_epoch(self, epoch):
        for s in self.samplers:
            if hasattr(s, "set_epoch"):
                s.set_epoch(epoch)

    def __iter__(self):
        iterators = [iter(i) for i in self.samplers]
        tot_batch = []
        for _ in range(len(self)):
            for samp, bsz, off in zip(iterators, self.batch_sizes, self.offsets):
                for _ in range(bsz):
                    tot_batch.append(off + next(samp))
            yield tot_batch
            tot_batch = []

    def __len__(self):
        min_len = float("inf")
        for idx, sampler in enumerate(self.samplers):
            min_len = min(len(sampler) // self.batch_sizes[idx], min_len)
        return int(min_len)


class DynamicBatchSampler:
    """Length-bucketed batching bounded by total duration per batch.

    Groups examples into length buckets; a batch holds up to
    ``max_batch_length / bucket_boundary`` examples from one bucket, so
    padding waste is bounded and — crucially for TPU — the set of padded
    shapes equals the (static) set of bucket boundaries, keeping the XLA
    compile cache small.

    Arguments
    ---------
    dataset : DynamicItemDataset
    max_batch_length : float
        Upper bound of sum-of-lengths in a batch (same units as lengths).
    num_buckets : int, optional
        Number of buckets if boundaries are not given explicitly.
    length_func : callable
        Maps a data-point dict to its length (default: x["duration"]).
    shuffle : bool
        Shuffle batches between epochs.
    bucket_boundaries : list, optional
        Explicit right-edges of buckets.
    max_batch_ex : int, optional
        Cap on examples per batch.
    """

    def __init__(
        self,
        dataset,
        max_batch_length,
        num_buckets=None,
        length_func=lambda x: x["duration"],
        shuffle=True,
        batch_ordering="random",
        max_batch_ex=None,
        bucket_boundaries=[],
        lengths_list=None,
        seed=42,
        epoch=0,
        drop_last=False,
        verbose=False,
    ):
        self._dataset = dataset
        self._ex_lengths = {}
        if lengths_list is not None:
            for indx in range(len(lengths_list)):
                self._ex_lengths[str(indx)] = lengths_list[indx]
        else:
            ex_ids = self._dataset.data_ids
            for indx in range(len(self._dataset)):
                self._ex_lengths[str(indx)] = length_func(
                    self._dataset.data[ex_ids[indx]]
                )

        if bucket_boundaries:
            if not all([x >= 0 for x in bucket_boundaries]):
                raise ValueError("All bucket boundaries should be >= 0")
            if len(set(bucket_boundaries)) != len(bucket_boundaries):
                raise ValueError("Bucket boundaries must be unique")
            self._bucket_boundaries = np.array(sorted(bucket_boundaries))
        else:
            if num_buckets is None:
                raise ValueError("Need either bucket_boundaries or num_buckets")
            self._bucket_boundaries = np.array(
                self._get_boundaries_through_warping(
                    max_batch_length=max_batch_length,
                    num_quantiles=num_buckets,
                )
            )

        self._max_batch_length = max_batch_length
        self._shuffle_ex = shuffle
        self._batch_ordering = batch_ordering
        self._seed = seed
        self._drop_last = drop_last
        self._max_batch_ex = max_batch_ex if max_batch_ex is not None else np.inf
        # max examples per bucket, bounded by max total length
        self._bucket_lens = [
            max(1, int(max_batch_length / self._bucket_boundaries[i]))
            for i in range(len(self._bucket_boundaries))
        ] + [1]
        self._epoch = epoch
        self._generate_batches()
        if verbose:
            logger.info("DynamicBatchSampler: %d batches", len(self._batches))

    def _get_boundaries_through_warping(self, max_batch_length, num_quantiles):
        # bucket edges at quantiles of the observed length distribution
        lengths = np.array(sorted(self._ex_lengths.values()))
        qs = np.linspace(0, 1, num_quantiles + 1)[1:-1]
        edges = np.quantile(lengths, qs).tolist()
        edges.append(max(lengths.max(), max_batch_length))
        # dedupe while preserving order
        out, seen = [], set()
        for e in edges:
            if e not in seen:
                out.append(e)
                seen.add(e)
        return out

    def get_durations(self, batch):
        return [self._ex_lengths[str(idx)] for idx in batch]

    def _generate_batches(self):
        rng = np.random.default_rng(self._seed + self._epoch)
        order = (
            rng.permutation(len(self._dataset))
            if self._shuffle_ex
            else np.arange(len(self._dataset))
        )
        bucket_batches = [[] for _ in self._bucket_lens]
        batches = []
        for idx in order:
            length = self._ex_lengths[str(idx)]
            bucket_id = int(np.searchsorted(self._bucket_boundaries, length))
            bucket_batches[bucket_id].append(int(idx))
            full = len(bucket_batches[bucket_id]) >= min(
                self._bucket_lens[bucket_id], self._max_batch_ex
            )
            if full:
                batches.append(bucket_batches[bucket_id])
                bucket_batches[bucket_id] = []
        if not self._drop_last:
            for leftover in bucket_batches:
                if leftover:
                    batches.append(leftover)
        if self._batch_ordering == "random":
            perm = rng.permutation(len(batches))
            batches = [batches[i] for i in perm]
        elif self._batch_ordering == "ascending":
            batches.sort(key=lambda b: max(self._ex_lengths[str(i)] for i in b))
        elif self._batch_ordering == "descending":
            batches.sort(
                key=lambda b: max(self._ex_lengths[str(i)] for i in b), reverse=True
            )
        self._batches = batches

    def __iter__(self):
        for batch in self._batches:
            yield batch
        if self._shuffle_ex:  # reshuffle for next epoch
            self._generate_batches()

    def set_epoch(self, epoch):
        self._epoch = epoch
        self._generate_batches()

    def __len__(self):
        return len(self._batches)


class DistributedSamplerWrapper:
    """Shard any sampler's output across JAX processes (multi-host DP).

    Each process sees a strided slice of the underlying sampler's indices,
    padded to equal length so all hosts take the same number of steps —
    the reference's DistributedSampler contract (dataio/sampler.py:739),
    re-expressed for the JAX process model.
    """

    def __init__(self, sampler, num_replicas=None, rank=None, drop_last=False):
        import jax

        self.sampler = sampler
        self.num_replicas = num_replicas if num_replicas is not None else jax.process_count()
        self.rank = rank if rank is not None else jax.process_index()
        self.drop_last = drop_last
        self.epoch = 0

    def __iter__(self):
        indices = list(self.sampler)
        if self.drop_last:
            total = (len(indices) // self.num_replicas) * self.num_replicas
            indices = indices[:total]
        else:
            # pad by wrapping so every replica gets the same count
            remainder = (-len(indices)) % self.num_replicas
            indices = indices + indices[:remainder]
        yield from indices[self.rank :: self.num_replicas]

    def __len__(self):
        n = len(self.sampler)
        if self.drop_last:
            return n // self.num_replicas
        return math.ceil(n / self.num_replicas)

    def set_epoch(self, epoch):
        self.epoch = epoch
        if hasattr(self.sampler, "set_epoch"):
            self.sampler.set_epoch(epoch)
