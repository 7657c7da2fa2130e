"""Global performance defaults applied at import.

Capability parity with the reference's ``speechbrain/utils/quirks.py``
(apply_quirks :82, KNOWN_QUIRKS :68, SB_DISABLE_QUIRKS env): the jax
equivalents — enable matmul precision defaults, donate-friendly settings,
and the compilation cache; opt out per quirk via SB_TPU_DISABLE_QUIRKS.
"""

import os

from speechbrain_tpu.utils.logger import get_logger

logger = get_logger(__name__)

applied_quirks = set()
excluded_quirks = set(
    q for q in os.environ.get("SB_TPU_DISABLE_QUIRKS", "").split(",") if q
)


def quirk_default_matmul_precision():
    """bfloat16-friendly matmul precision default (the TF32 analogue)."""
    import jax

    jax.config.update("jax_default_matmul_precision", "bfloat16_3x")


def quirk_compilation_cache():
    """Persistent XLA compilation cache (big win for slow TPU compiles)."""
    import jax

    cache_dir = os.environ.get(
        "SB_TPU_COMPILE_CACHE", os.path.expanduser("~/.cache/sb_tpu_xla")
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # older jax
        pass


def quirk_transfer_guard():
    """Log unintended host transfers in debug mode."""
    import jax

    if os.environ.get("SB_TPU_DEBUG_TRANSFERS"):
        jax.config.update("jax_transfer_guard", "log")


KNOWN_QUIRKS = {
    "compilation_cache": quirk_compilation_cache,
    "transfer_guard": quirk_transfer_guard,
}
# matmul precision changes numerics: opt-in only (parity tests stay exact)
if os.environ.get("SB_TPU_MATMUL_PRECISION_QUIRK"):
    KNOWN_QUIRKS["default_matmul_precision"] = quirk_default_matmul_precision


def apply_quirks():
    """Apply all non-excluded quirks (call once at package import)."""
    for name, fn in KNOWN_QUIRKS.items():
        if name in excluded_quirks:
            continue
        try:
            fn()
            applied_quirks.add(name)
        except Exception as e:  # never break imports over a quirk
            logger.warning_once(f"Quirk {name} failed: {e}")
    log_applied_quirks()


def log_applied_quirks():
    """Log which platform quirks were applied at import."""
    logger.info(
        "Applied quirks (SB_TPU_DISABLE_QUIRKS=%s): %s",
        ",".join(sorted(excluded_quirks)),
        ",".join(sorted(applied_quirks)),
    )
