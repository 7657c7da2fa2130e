"""Rank-aware logging utilities.

Capability parity with the reference's ``speechbrain/utils/logger.py``
(MultiProcessLoggerAdapter at :67, get_logger at :150, setup_logging
at :179, get_environment_description at :277). Rank here means the JAX
process index (multi-host); on a single host everything logs normally.
"""

import functools
import logging
import logging.config
import math
import os
import sys

ORDERS_ABBREV = {
    -24: "y", -21: "z", -18: "a", -15: "f", -12: "p", -9: "n", -6: "µ",
    -3: "m", 0: "", 3: "k", 6: "M", 9: "G", 12: "T", 15: "P", 18: "E",
    21: "Z", 24: "Y",
}

_warned_once = set()


def _process_index():
    # Avoid importing jax at module import time (keeps logging usable in
    # data-prep subprocesses that never touch the device).
    try:
        import jax

        return jax.process_index()
    except Exception:
        return int(os.environ.get("JAX_PROCESS_INDEX", 0))


class MultiProcessLoggerAdapter(logging.LoggerAdapter):
    """Logs only on the main process unless ``main_process_only=False``."""

    def log(self, level, msg, *args, main_process_only=True, **kwargs):
        if self.isEnabledFor(level):
            if main_process_only and _process_index() != 0:
                return
            msg, kwargs = self.process(str(msg), kwargs)
            self.logger.log(level, msg, *args, **kwargs)

    def warning_once(self, msg, *args, **kwargs):
        """Emit a warning only the first time this exact message is seen."""
        if msg not in _warned_once:
            _warned_once.add(msg)
            self.warning(msg, *args, **kwargs)


def get_logger(name):
    """Return a rank-aware logger adapter."""
    return MultiProcessLoggerAdapter(logging.getLogger(name), {})


def setup_logging(config=None, overrides=None, default_level=logging.INFO):
    """Configure logging from a dict-config, with sensible defaults."""
    if config is not None:
        if overrides:
            _recursive_update(config, overrides)
        logging.config.dictConfig(config)
    else:
        logging.basicConfig(
            level=default_level,
            format="%(asctime)s - %(name)s - %(levelname)s - %(message)s",
            stream=sys.stdout,
        )


def _recursive_update(d, u):
    for k, v in u.items():
        if isinstance(v, dict) and isinstance(d.get(k), dict):
            _recursive_update(d[k], v)
        else:
            d[k] = v


def format_order_of_magnitude(number, abbreviate=True):
    """Format a number with an SI prefix, e.g. 1_300_000 -> ('1.3', 'M').

    Example
    -------
    >>> format_order_of_magnitude(1300000)
    ('1.3', 'M')
    """
    style = ORDERS_ABBREV
    precision = "{num:3.1f}"
    order = 3 * math.floor(math.log(math.fabs(number), 1000)) if number != 0 else 0
    order = max(min(order, max(style)), min(style))
    factor = 10 ** order
    num_str = precision.format(num=number / factor).strip()
    return num_str, style[order]


def get_environment_description():
    """One-string description of python/jax/platform for env.log."""
    import platform

    lines = [f"Python: {sys.version}", f"Platform: {platform.platform()}"]
    try:
        import jax

        lines.append(f"jax: {jax.__version__}")
        lines.append(f"backend: {jax.default_backend()}")
        lines.append(f"devices: {[str(d) for d in jax.devices()]}")
    except Exception as e:  # pragma: no cover
        lines.append(f"jax: unavailable ({e})")
    try:
        import flax

        lines.append(f"flax: {flax.__version__}")
    except Exception:
        pass
    return "\n".join(lines) + "\n"


@functools.lru_cache(maxsize=None)
def _once_key(key):
    return key
