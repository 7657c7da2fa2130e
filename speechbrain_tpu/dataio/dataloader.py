"""Data loading: batching iterator with checkpointable position and
background prefetch.

Capability parity with the reference's ``speechbrain/dataio/dataloader.py``
(make_dataloader :142, SaveableDataLoader :265, LoopedLoader :346) without
torch: a thread-pool prefetcher overlaps host-side collate/decode with
device compute (on TPU the step is async-dispatched, so a small prefetch
depth suffices), and mid-epoch position is checkpointable for exact resume.
"""

import json

from speechbrain_tpu.dataio.batch import PaddedBatch
from speechbrain_tpu.dataio.sampler import ReproducibleRandomSampler, SequentialSampler
from speechbrain_tpu.utils.checkpoints import (
    mark_as_loader,
    mark_as_saver,
    register_checkpoint_hooks,
)
from speechbrain_tpu.utils.logger import get_logger

logger = get_logger(__name__)


def make_dataloader(dataset, looped_nominal_epoch=None, **loader_kwargs):
    """Build a SaveableDataLoader (or LoopedLoader for stream-style data).

    Accepted kwargs mirror the reference: batch_size, shuffle, sampler,
    batch_sampler, collate_fn, drop_last, num_workers (prefetch threads),
    pad_to_multiple (TPU shape bucketing).
    """
    if "collate_fn" not in loader_kwargs:
        pad_to_multiple = loader_kwargs.pop("pad_to_multiple", 1)
        loader_kwargs["collate_fn"] = lambda examples: PaddedBatch(
            examples, pad_to_multiple=pad_to_multiple
        )
    loader = SaveableDataLoader(dataset, **loader_kwargs)
    if looped_nominal_epoch is not None:
        loader = LoopedLoader(loader, looped_nominal_epoch)
    return loader


@register_checkpoint_hooks
class SaveableDataLoader:
    """Iterates a dataset in batches; the mid-epoch position can be saved
    and restored so training resumes on the exact next batch.

    Arguments
    ---------
    dataset : indexable
    batch_size : int
    shuffle : bool
        Use a ReproducibleRandomSampler.
    sampler : iterable, optional
        Yields example indices.
    batch_sampler : iterable, optional
        Yields lists of example indices (overrides batch_size/sampler).
    collate_fn : callable
    drop_last : bool
    num_workers : int
        Prefetch threads (0 = fully synchronous).
    """

    def __init__(
        self,
        dataset,
        batch_size=1,
        shuffle=False,
        sampler=None,
        batch_sampler=None,
        collate_fn=None,
        drop_last=False,
        num_workers=0,
        seed=563375142,
        **_ignored,
    ):
        self.dataset = dataset
        self.collate_fn = collate_fn or (lambda x: x)
        self.batch_sampler = batch_sampler
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.batch_size = batch_size
        if batch_sampler is None:
            if sampler is None:
                sampler = (
                    ReproducibleRandomSampler(dataset, seed=seed)
                    if shuffle
                    else SequentialSampler(dataset)
                )
            self.sampler = sampler
        else:
            self.sampler = None
        self._recovery_skip = 0  # batches to skip on the first epoch after resume
        self._speechbrain_iterator = None
        self._num_batches_yielded = 0

    # -- sampler epoch forwarding ------------------------------------------
    def set_epoch(self, epoch):
        target = self.batch_sampler if self.batch_sampler is not None else self.sampler
        if hasattr(target, "set_epoch"):
            target.set_epoch(epoch)

    def _batch_indices(self):
        if self.batch_sampler is not None:
            yield from self.batch_sampler
            return
        batch = []
        for idx in self.sampler:
            batch.append(idx)
            if len(batch) == self.batch_size:
                yield batch
                batch = []
        if batch and not self.drop_last:
            yield batch

    def __len__(self):
        if self.batch_sampler is not None:
            return len(self.batch_sampler)
        n = len(self.sampler)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _make_batch(self, indices):
        return self.collate_fn([self.dataset[i] for i in indices])

    def __iter__(self):
        skip = self._recovery_skip
        self._recovery_skip = 0
        self._num_batches_yielded = skip

        def gen():
            for bnum, indices in enumerate(self._batch_indices()):
                if bnum < skip:
                    continue
                yield indices

        if self.num_workers and self.num_workers > 0:
            iterator = _threaded_map(self._make_batch, gen(), self.num_workers)
        else:
            iterator = map(self._make_batch, gen())

        for batch in iterator:
            self._num_batches_yielded += 1
            yield batch
        self._num_batches_yielded = 0  # clean epoch end

    # -- checkpointing ------------------------------------------------------
    @mark_as_saver
    def _save(self, path):
        with open(path, "w") as f:
            json.dump({"num_batches": self._num_batches_yielded}, f)

    @mark_as_loader
    def _load(self, path, end_of_epoch=False):
        with open(path) as f:
            saved = json.load(f)
        if end_of_epoch:
            self._recovery_skip = 0
        else:
            self._recovery_skip = saved.get("num_batches", 0)


def _threaded_map(fn, iterable, num_workers, prefetch=2):
    """Ordered parallel map with a bounded in-flight window. Threads give
    real overlap here because audio decode / numpy padding release the GIL,
    and on TPU the consuming step is async-dispatched anyway."""
    import collections
    from concurrent.futures import ThreadPoolExecutor

    window = num_workers * prefetch
    with ThreadPoolExecutor(max_workers=num_workers) as pool:
        pending = collections.deque()
        it = iter(iterable)
        try:
            for item in it:
                pending.append(pool.submit(fn, item))
                if len(pending) >= window:
                    yield pending.popleft().result()
            while pending:
                yield pending.popleft().result()
        finally:
            for fut in pending:
                fut.cancel()


@register_checkpoint_hooks
class LoopedLoader:
    """Iterate an (infinite) stream in nominal epochs of fixed length."""

    def __init__(self, loader, epoch_length, batchsize_fn=None):
        self.loader = loader
        self.iterator = None
        self.epoch_length = epoch_length
        self.step = 0
        self.total_steps = 0
        if batchsize_fn is None:
            from speechbrain_tpu.dataio.batch import BatchsizeGuesser

            self.batchsize_fn = BatchsizeGuesser()
        self.total_samples = 0

    def __iter__(self):
        if self.iterator is None:
            self.iterator = iter(self.loader)
        return self

    def __next__(self):
        if self.step < self.epoch_length:
            self.step += 1
            self.total_steps += 1
            try:
                batch = next(self.iterator)
            except StopIteration:
                self.iterator = iter(self.loader)
                batch = next(self.iterator)
            self.total_samples += self.batchsize_fn(batch)
            return batch
        self.step = 0
        raise StopIteration

    def __len__(self):
        return self.epoch_length

    @mark_as_saver
    def _save(self, path):
        with open(path, "w") as f:
            json.dump(
                {
                    "step": self.step,
                    "total_steps": self.total_steps,
                    "total_samples": self.total_samples,
                },
                f,
            )

    @mark_as_loader
    def _load(self, path, end_of_epoch=True):
        with open(path) as f:
            saved = json.load(f)
        self.step = saved["step"]
        self.total_steps = saved["total_steps"]
        self.total_samples = saved["total_samples"]
        if not end_of_epoch and self.step == 0:
            # mid-epoch checkpoint at step 0: act like end of epoch
            self.step = self.epoch_length
