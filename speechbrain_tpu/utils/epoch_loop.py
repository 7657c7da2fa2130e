"""Checkpointable epoch counters.

Capability parity with the reference's ``speechbrain/utils/epoch_loop.py``
(EpochCounter :23, EpochCounterWithStopper :83).

Example
-------
>>> ec = EpochCounter(2)
>>> [e for e in ec]
[1, 2]
"""

from speechbrain_tpu.utils.checkpoints import (
    mark_as_loader,
    mark_as_saver,
    register_checkpoint_hooks,
)
from speechbrain_tpu.utils.logger import get_logger

logger = get_logger(__name__)


@register_checkpoint_hooks
class EpochCounter:
    """Iterator that counts epochs 1..limit and checkpoints its position,
    so a resumed experiment continues from the right epoch."""

    def __init__(self, limit):
        self.current = 0
        self.limit = int(limit)

    def __iter__(self):
        return self

    def __next__(self):
        if self.current < self.limit:
            self.current += 1
            logger.info("Going into epoch %d", self.current)
            return self.current
        raise StopIteration

    @mark_as_saver
    def _save(self, path):
        with open(path, "w") as fo:
            fo.write(str(self.current))

    @mark_as_loader
    def _recover(self, path, end_of_epoch=True):
        with open(path) as fi:
            saved_value = int(fi.read())
            if end_of_epoch:
                self.current = saved_value
            else:
                # mid-epoch resume: redo the interrupted epoch
                self.current = saved_value - 1


class EpochCounterWithStopper(EpochCounter):
    """EpochCounter with early stopping on a tracked metric.

    Call ``update_metric(current_valid_metric)`` once per epoch; iteration
    stops after ``limit_to_stop`` epochs without improvement, with
    ``limit_warmup`` grace epochs first.
    """

    def __init__(self, limit, limit_to_stop, limit_warmup, direction):
        super().__init__(limit)
        self.limit_to_stop = limit_to_stop
        self.limit_warmup = limit_warmup
        self.direction = direction
        if self.limit_to_stop < 0:
            raise ValueError("Stopper 'limit_to_stop' must be >= 0")
        if self.limit_warmup < 0:
            raise ValueError("Stopper 'limit_warmup' must be >= 0")
        if self.direction == "min":
            self.min_delta = 0.0
            self.best_limit = float("inf")
            self.th_fn = lambda x, best: x < best - self.min_delta
        elif self.direction == "max":
            self.min_delta = 0.0
            self.best_limit = -float("inf")
            self.th_fn = lambda x, best: x > best + self.min_delta
        else:
            raise ValueError("Stopper direction must be 'min' or 'max'")
        self.patience_counter = 0
        self.should_stop = False

    def __next__(self):
        if self.should_stop:
            logger.info("Early stopping at epoch %d", self.current)
            raise StopIteration
        return super().__next__()

    def update_metric(self, current_metric):
        """Track the metric; sets should_stop when patience is exhausted."""
        if self.current > self.limit_warmup:
            if self.th_fn(current_metric, self.best_limit):
                self.best_limit = current_metric
                self.patience_counter = 0
            else:
                self.patience_counter += 1
                self.should_stop = self.patience_counter >= self.limit_to_stop
