"""Native IO: C++ WAV decoding for the data-loading hot path."""

from speechbrain_tpu.io.native import (  # noqa: F401
    native_available,
    read_wav,
    read_wav_mono,
    wav_info,
)
