"""Bounded-queue parallel map for dataset preparation.

Capability parity with the reference's ``speechbrain/utils/parallel.py``
(parallel_map :270): ordered multiprocess/threaded map with chunking and
bounded in-flight work, for CPU-bound data prep (audio conversion,
feature pre-extraction).
"""

from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor

from speechbrain_tpu.utils.logger import get_logger

logger = get_logger(__name__)


def parallel_map(
    fn,
    source,
    process_count=None,
    chunk_size=8,
    queue_size=128,
    executor="process",
    progress=False,
):
    """Ordered parallel map with chunking (reference parallel.py:270).

    Example
    -------
    >>> list(parallel_map(lambda x: x * 2, range(5), executor="thread"))
    [0, 2, 4, 6, 8]
    """
    import collections
    import os

    process_count = process_count or max(1, (os.cpu_count() or 2) - 1)
    pool_cls = ProcessPoolExecutor if executor == "process" else ThreadPoolExecutor

    def chunks(it):
        buf = []
        for item in it:
            buf.append(item)
            if len(buf) == chunk_size:
                yield buf
                buf = []
        if buf:
            yield buf

    def run_chunk(chunk):
        return [fn(x) for x in chunk]

    iterator = source if executor == "process" else iter(source)
    if executor == "process":
        # processes need picklable fn; map chunks
        with pool_cls(max_workers=process_count) as pool:
            for out_chunk in pool.map(fn if chunk_size == 1 else _ChunkRunner(fn),
                                      chunks(source) if chunk_size != 1 else source):
                if chunk_size == 1:
                    yield out_chunk
                else:
                    yield from out_chunk
    else:
        with pool_cls(max_workers=process_count) as pool:
            pending = collections.deque()
            for chunk in chunks(iterator):
                pending.append(pool.submit(run_chunk, chunk))
                if len(pending) >= max(2, queue_size // chunk_size):
                    yield from pending.popleft().result()
            while pending:
                yield from pending.popleft().result()


class _ChunkRunner:
    """Picklable chunk applier for process pools."""

    def __init__(self, fn):
        self.fn = fn

    def __call__(self, chunk):
        return [self.fn(x) for x in chunk]
