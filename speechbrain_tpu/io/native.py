"""ctypes loader for the native WAV decoder.

Compiles ``_audioio.cpp`` with g++ on first use (cached next to the
source with a build lock, like JAX's compilation cache), then binds the
C ABI. The decode calls release the GIL, so the SaveableDataLoader's
thread-pool prefetch decodes files in parallel — the reference gets the
same property from torchaudio's C++ backends.

Falls back cleanly (``native_available() == False``) when no compiler
is present; :func:`speechbrain_tpu.dataio.dataio.read_audio` then uses
the stdlib ``wave`` path.
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_lock = threading.Lock()
_lib = None
_tried = False

_SRC = os.path.join(os.path.dirname(__file__), "_audioio.cpp")
_SO = os.path.join(os.path.dirname(__file__), "_audioio.so")


def _build():
    """Compile the extension next to the source (idempotent)."""
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        "-o", _SO + ".tmp", _SRC,
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(_SO + ".tmp", _SO)


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                _build()
            lib = ctypes.CDLL(_SO)
        except (OSError, subprocess.CalledProcessError):
            return None
        lib.sbtpu_wav_info.restype = ctypes.c_int
        lib.sbtpu_wav_info.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        for fn in (lib.sbtpu_wav_decode, lib.sbtpu_wav_decode_mono):
            fn.restype = ctypes.c_long
            fn.argtypes = [
                ctypes.c_char_p, ctypes.c_long, ctypes.c_long,
                ctypes.POINTER(ctypes.c_float), ctypes.c_long,
            ]
        _lib = lib
    return _lib


def native_available():
    """True when the compiled decoder is loadable."""
    return _load() is not None


def wav_info(path):
    """(frames, sample_rate, channels) without decoding."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native audio IO unavailable")
    frames = ctypes.c_long()
    sr = ctypes.c_int()
    ch = ctypes.c_int()
    rc = lib.sbtpu_wav_info(
        os.fsencode(path), ctypes.byref(frames), ctypes.byref(sr),
        ctypes.byref(ch),
    )
    if rc != 0:
        raise OSError(f"cannot read WAV header of {path} (rc={rc})")
    return frames.value, sr.value, ch.value


def read_wav(path, start=0, stop=None):
    """Decode to float32 (frames, channels); GIL released during decode."""
    frames, sr, ch = wav_info(path)
    stop_v = frames if stop is None else min(int(stop), frames)
    n = max(stop_v - int(start), 0)
    out = np.empty(n * ch, np.float32)
    lib = _load()
    got = lib.sbtpu_wav_decode(
        os.fsencode(path), int(start), stop_v,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out.size,
    )
    if got < 0:
        raise OSError(f"WAV decode failed for {path} (rc={got})")
    return out[: got * ch].reshape(got, ch), sr


def read_wav_mono(path, start=0, stop=None):
    """Decode + downmix to float32 (frames,) in one native pass."""
    frames, sr, ch = wav_info(path)
    stop_v = frames if stop is None else min(int(stop), frames)
    n = max(stop_v - int(start), 0)
    out = np.empty(n, np.float32)
    lib = _load()
    got = lib.sbtpu_wav_decode_mono(
        os.fsencode(path), int(start), stop_v,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out.size,
    )
    if got < 0:
        raise OSError(f"WAV decode failed for {path} (rc={got})")
    return out[:got], sr
