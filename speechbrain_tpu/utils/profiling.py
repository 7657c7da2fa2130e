"""Profiling.

Capability parity with the reference's ``speechbrain/utils/profiling.py``
(prepare_profiler :12 -> torch.profiler), mapped to jax.profiler: traces
are written for TensorBoard / Perfetto. The Brain's --profile_training
flag drives this with warmup/active step scheduling.
"""

import contextlib
import os

from speechbrain_tpu.utils.logger import get_logger

logger = get_logger(__name__)


class Profiler:
    """Step-scheduled device tracer (wait/warmup/active semantics of the
    reference's schedule)."""

    def __init__(self, logdir="profiler_logs", wait=2, warmup=2, active=4):
        self.logdir = logdir
        self.wait = wait
        self.warmup = warmup
        self.active = active
        self.step_num = 0
        self._tracing = False

    def step(self):
        import jax

        start_at = self.wait + self.warmup
        stop_at = start_at + self.active
        if self.step_num == start_at and not self._tracing:
            os.makedirs(self.logdir, exist_ok=True)
            jax.profiler.start_trace(self.logdir)
            self._tracing = True
            logger.info("Profiler trace started -> %s", self.logdir)
        if self.step_num == stop_at and self._tracing:
            jax.profiler.stop_trace()
            self._tracing = False
            logger.info("Profiler trace saved -> %s", self.logdir)
        self.step_num += 1

    def stop(self):
        import jax

        if self._tracing:
            jax.profiler.stop_trace()
            self._tracing = False

    @property
    def done(self):
        return self.step_num > self.wait + self.warmup + self.active


def prepare_profiler(profile_warmup=5, profile_steps=10, logdir="profiler_logs"):
    """Build a Profiler with the reference's flag surface
    (reference profiling.py:12)."""
    return Profiler(logdir=logdir, wait=0, warmup=profile_warmup,
                    active=profile_steps)


@contextlib.contextmanager
def trace(logdir="profiler_logs"):
    """Trace a whole block: ``with trace(): step()``."""
    import jax

    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
