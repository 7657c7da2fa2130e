"""Torchaudio-style audio IO front door.

Capability parity with the reference's ``speechbrain/dataio/audio_io.py``
(load at audio_io.py:141, save at :212, info at :256,
list_audio_backends at :283): a backend-probing load/save/info API. The
fast path is the native C++ WAV decoder
(:mod:`speechbrain_tpu.io.native`); soundfile is used when installed;
stdlib ``wave`` is the always-available fallback (read and write).
"""

import dataclasses
import wave as _wave

import numpy as np


@dataclasses.dataclass
class AudioInfo:
    """Audio metadata (reference audio_io.py:102)."""

    num_frames: int
    sample_rate: int
    num_channels: int
    bits_per_sample: int = 16
    encoding: str = "PCM_S"


def list_audio_backends():
    """Names of usable backends, fastest first (reference :283)."""
    backends = []
    from speechbrain_tpu.io import native_available

    if native_available():
        backends.append("native")
    try:
        import soundfile  # noqa: F401

        backends.append("soundfile")
    except ImportError:
        pass
    backends.append("wave")
    return backends


def info(path):
    """AudioInfo without decoding (reference :256)."""
    path = str(path)
    if path.lower().endswith(".wav"):
        from speechbrain_tpu.io import native_available, wav_info

        if native_available():
            frames, sr, ch = wav_info(path)
            return AudioInfo(frames, sr, ch)
    try:
        import soundfile as sf

        i = sf.info(path)
        return AudioInfo(i.frames, i.samplerate, i.channels)
    except ImportError:
        with _wave.open(path, "rb") as w:
            return AudioInfo(
                w.getnframes(), w.getframerate(), w.getnchannels(),
                8 * w.getsampwidth(),
            )


def load(path, frame_offset=0, num_frames=-1, channels_first=False):
    """Decode to float32; returns ``(audio, sample_rate)`` with audio
    (frames, channels) — or (channels, frames) when ``channels_first``
    (reference :141)."""
    path = str(path)
    stop = None if num_frames < 0 else frame_offset + num_frames
    data = None
    if path.lower().endswith(".wav"):
        from speechbrain_tpu.io import native_available, read_wav

        if native_available():
            try:
                data, sr = read_wav(path, frame_offset, stop)
            except OSError:
                data = None
    if data is None:
        try:
            import soundfile as sf

            data, sr = sf.read(path, start=frame_offset, stop=stop,
                               dtype="float32", always_2d=True)
        except ImportError:
            with _wave.open(path, "rb") as w:
                sr = w.getframerate()
                ch = w.getnchannels()
                w.setpos(frame_offset)
                n = (w.getnframes() - frame_offset if stop is None
                     else stop - frame_offset)
                raw = np.frombuffer(w.readframes(n), "<i2")
                data = (raw / 32768.0).astype(np.float32).reshape(-1, ch)
    if channels_first:
        data = np.ascontiguousarray(data.T)
    return data, sr


def save(path, src, sample_rate, channels_first=False, subtype=None):
    """Write float32/int audio to a 16-bit PCM WAV (reference :212)."""
    src = np.asarray(src)
    if channels_first and src.ndim == 2:
        src = src.T
    if src.ndim == 1:
        src = src[:, None]
    if np.issubdtype(src.dtype, np.floating):
        pcm = (np.clip(src, -1.0, 1.0) * 32767.0).astype("<i2")
    else:
        pcm = src.astype("<i2")
    with _wave.open(str(path), "wb") as w:
        w.setnchannels(src.shape[1])
        w.setsampwidth(2)
        w.setframerate(int(sample_rate))
        w.writeframes(np.ascontiguousarray(pcm).tobytes())
