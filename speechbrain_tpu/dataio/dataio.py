"""Manifest loading, audio IO, and length/mask helpers.

Capability parity with the reference's ``speechbrain/dataio/dataio.py``
(load_data_json :40, load_data_csv :102, read_audio :218, write_audio :425,
length_to_mask :803, relative_time_to_absolute :564, bos/eos helpers
:1013/:1045, clean_padding :1254) and ``dataio/audio_io.py``.

Audio decode is host-side (soundfile if present, else stdlib ``wave``);
mask helpers are jit-safe jnp.
"""

import csv
import json
import os
import re

import numpy as np


# ---------------------------------------------------------------------------
# Manifests
# ---------------------------------------------------------------------------

def load_data_json(json_path, replacements=None):
    """Load a JSON manifest: {id: {key: value}}; applies $replacements.

    Example
    -------
    >>> import tempfile, json as _json
    >>> with tempfile.NamedTemporaryFile("w", suffix=".json", delete=False) as f:
    ...     _ = f.write('{"utt1": {"wav": "$root/a.wav"}}')
    >>> d = load_data_json(f.name, {"root": "/data"})
    >>> d["utt1"]["wav"]
    '/data/a.wav'
    """
    with open(json_path, encoding="utf-8") as f:
        data = json.load(f)
    if replacements:
        pattern = re.compile(r"\$([\w]+)")

        def do_replace(s):
            return pattern.sub(
                lambda m: str(replacements.get(m.group(1), m.group(0))), s
            )

        def walk(obj):
            if isinstance(obj, dict):
                return {k: walk(v) for k, v in obj.items()}
            if isinstance(obj, list):
                return [walk(v) for v in obj]
            if isinstance(obj, str):
                return do_replace(obj)
            return obj

        data = walk(data)
    return data


def load_data_csv(csv_path, replacements=None):
    """Load a CSV manifest with an ID column into {id: {key: value}}.

    Supports $replacements in string fields and a ``duration`` float column.
    """
    replacements = replacements or {}
    pattern = re.compile(r"\$([\w]+)")
    result = {}
    with open(csv_path, newline="", encoding="utf-8") as f:
        reader = csv.DictReader(f, skipinitialspace=True)
        for row in reader:
            try:
                data_id = row["ID"]
                del row["ID"]
            except KeyError:
                raise KeyError("CSV has to have an 'ID' field, with unique ids for all data points")
            if data_id in result:
                raise ValueError(f"Duplicate id: {data_id}")
            for key, value in row.items():
                if isinstance(value, str):
                    row[key] = pattern.sub(
                        lambda m: str(replacements.get(m.group(1), m.group(0))), value
                    )
            if "duration" in row:
                row["duration"] = float(row["duration"])
            result[data_id] = row
    return result


# ---------------------------------------------------------------------------
# Audio IO (host-side)
# ---------------------------------------------------------------------------

def _load_soundfile(path, start=0, stop=None):
    import soundfile as sf

    data, sr = sf.read(path, start=start, stop=stop, dtype="float32", always_2d=False)
    return data, sr


def _load_wave_stdlib(path, start=0, stop=None):
    import wave

    with wave.open(path, "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        sampwidth = w.getsampwidth()
        channels = w.getnchannels()
        stop = n if stop is None else min(stop, n)
        w.setpos(start)
        raw = w.readframes(stop - start)
    dtype = {1: np.uint8, 2: np.int16, 4: np.int32}[sampwidth]
    data = np.frombuffer(raw, dtype=dtype).astype(np.float32)
    if sampwidth == 1:
        data = (data - 128.0) / 128.0
    else:
        data = data / float(np.iinfo(dtype).max)
    if channels > 1:
        data = data.reshape(-1, channels)
    return data, sr


def read_audio_info(path):
    """Return (num_frames, sample_rate, num_channels) without decoding."""
    try:
        import soundfile as sf

        info = sf.info(path)
        return info.frames, info.samplerate, info.channels
    except ImportError:
        import wave

        with wave.open(path, "rb") as w:
            return w.getnframes(), w.getframerate(), w.getnchannels()


def read_audio(waveforms_obj):
    """Read audio as float32 numpy. Accepts a path or a dict spec
    ``{"file": path, "start": int, "stop": int}``. Multi-channel audio is
    downmixed to mono by averaging (use read_audio_multichannel to keep
    channels)."""
    if isinstance(waveforms_obj, str):
        path, start, stop = waveforms_obj, 0, None
    else:
        path = waveforms_obj["file"]
        start = int(waveforms_obj.get("start", 0))
        stop = waveforms_obj.get("stop", None)
        stop = int(stop) if stop is not None else None
    if str(path).lower().endswith(".wav"):
        # native C++ decoder: decodes + downmixes without the GIL, so
        # dataloader prefetch threads run in parallel
        from speechbrain_tpu.io import native_available, read_wav_mono

        if native_available():
            try:
                data, _sr = read_wav_mono(path, start, stop)
                return data
            except OSError:
                pass  # odd container; fall through to python readers
    try:
        data, _sr = _load_soundfile(path, start, stop)
    except ImportError:
        data, _sr = _load_wave_stdlib(path, start, stop)
    if data.ndim > 1:
        data = data.mean(axis=-1)
    return data


def read_audio_multichannel(waveforms_obj):
    """Read audio keeping channels: returns (time, channels) float32."""
    if isinstance(waveforms_obj, str):
        path, start, stop = waveforms_obj, 0, None
        files = [path]
    else:
        files = waveforms_obj["files"] if "files" in waveforms_obj else [waveforms_obj["file"]]
        start = int(waveforms_obj.get("start", 0))
        stop = waveforms_obj.get("stop", None)
        stop = int(stop) if stop is not None else None
    chans = []
    for path in files:
        try:
            data, _sr = _load_soundfile(path, start, stop)
        except ImportError:
            data, _sr = _load_wave_stdlib(path, start, stop)
        if data.ndim == 1:
            data = data[:, None]
        chans.append(data)
    return np.concatenate(chans, axis=-1)


def write_audio(filepath, audio, samplerate):
    """Write float32 audio ((time,) or (time, channels)) to a file."""
    audio = np.asarray(audio, dtype=np.float32)
    try:
        import soundfile as sf

        sf.write(filepath, audio, samplerate)
    except ImportError:
        import wave

        pcm = np.clip(audio, -1.0, 1.0)
        pcm = (pcm * 32767.0).astype(np.int16)
        channels = 1 if pcm.ndim == 1 else pcm.shape[1]
        with wave.open(filepath, "wb") as w:
            w.setnchannels(channels)
            w.setsampwidth(2)
            w.setframerate(samplerate)
            w.writeframes(pcm.tobytes())


# ---------------------------------------------------------------------------
# Length / mask helpers (jit-safe)
# ---------------------------------------------------------------------------

def length_to_mask(length, max_len=None, dtype=None):
    """Convert absolute lengths (B,) to a boolean mask (B, max_len).

    jit-safe when ``max_len`` is a static int.

    Example
    -------
    >>> import jax.numpy as jnp
    >>> length_to_mask(jnp.array([2, 3]), max_len=4).astype(int).tolist()
    [[1, 1, 0, 0], [1, 1, 1, 0]]
    """
    import jax.numpy as jnp

    length = jnp.asarray(length)
    if max_len is None:
        max_len = int(jnp.max(length))  # data-dependent: only outside jit
    positions = jnp.arange(max_len)[None, :]
    mask = positions < length[:, None]
    if dtype is not None:
        mask = mask.astype(dtype)
    return mask


def relative_length_to_mask(rel_length, max_len, dtype=None):
    """Mask from relative lengths in [0,1] against a static ``max_len``."""
    import jax.numpy as jnp

    lengths = jnp.round(jnp.asarray(rel_length) * max_len).astype(jnp.int32)
    return length_to_mask(lengths, max_len=max_len, dtype=dtype)


def relative_time_to_absolute(batch, relative_lens, rate):
    """Convert relative lengths to absolute durations at ``rate`` units/sec."""
    import jax.numpy as jnp

    max_len = batch.shape[1]
    return jnp.round(jnp.asarray(relative_lens) * max_len) / rate


def clean_padding_(batch, lengths, mask_value=0.0):
    """Return batch with padded positions set to ``mask_value`` (pure)."""
    import jax.numpy as jnp

    mask = relative_length_to_mask(lengths, batch.shape[1])
    shape = mask.shape + (1,) * (batch.ndim - 2)
    return jnp.where(mask.reshape(shape), batch, mask_value)


clean_padding = clean_padding_  # pure-functional: both names do the same


# ---------------------------------------------------------------------------
# Token sequence helpers (host-side, numpy)
# ---------------------------------------------------------------------------

def to_float_array(x):
    """Convert to a float32 jax array."""
    return np.asarray(x, dtype=np.float32)


def to_long_array(x):
    """Convert to an int32 jax array."""
    return np.asarray(x, dtype=np.int32)


def prepend_bos_token(label, bos_index):
    """Prepend BOS to a batch of padded label arrays (B, L) -> (B, L+1)."""
    import jax.numpy as jnp

    label = jnp.asarray(label)
    bos = jnp.full((label.shape[0], 1), bos_index, dtype=label.dtype)
    return jnp.concatenate([bos, label], axis=1)


def append_eos_token(label, length, eos_index):
    """Append EOS at each sequence's true end. (B, L) + abs lengths -> (B, L+1)."""
    import jax.numpy as jnp

    label = jnp.asarray(label)
    B, L = label.shape
    out = jnp.concatenate(
        [label, jnp.zeros((B, 1), dtype=label.dtype)], axis=1
    )
    pos = jnp.asarray(length).astype(jnp.int32)
    out = out.at[jnp.arange(B), pos].set(eos_index)
    return out


def merge_char(sequences, space="_"):
    """Merge characters into words at the space symbol.

    Example
    -------
    >>> merge_char([["a", "b", "_", "c"]])
    [['ab', 'c']]
    """
    results = []
    for seq in sequences:
        words = "".join(seq).split(space)
        results.append([w for w in words if w])
    return results


def split_word(sequences, space="_"):
    """Split words into characters, inserting the space symbol between words.

    Example
    -------
    >>> split_word([["ab", "c"]])
    [['a', 'b', '_', 'c']]
    """
    results = []
    for seq in sequences:
        chars = []
        for i, word in enumerate(seq):
            if i > 0:
                chars.append(space)
            chars.extend(list(word))
        results.append(chars)
    return results


class IterativeCSVWriter:
    """Incrementally write a CSV manifest with fixed fields."""

    def __init__(self, outstream, data_fields, defaults=None):
        self._outstream = outstream
        self.fields = ["ID"] + list(data_fields)
        self.defaults = defaults or {}
        self._outstream.write(",".join(self.fields))

    def set_default(self, field, value):
        if field not in self.fields:
            raise ValueError(f"Unknown field {field}")
        self.defaults[field] = value

    def write(self, *args, **kwargs):
        if args and kwargs:
            raise ValueError("Use either positional fields or keyword fields")
        if args:
            if len(args) != len(self.fields):
                raise ValueError("Need consistent fields")
            to_write = [str(a) for a in args]
        else:
            full = dict(self.defaults)
            full.update(kwargs)
            to_write = [str(full.get(f, "")) for f in self.fields]
        self._outstream.write("\n" + ",".join(to_write))

    def write_batch(self, *args, **kwargs):
        if args and kwargs:
            raise ValueError("Use either positional fields or keyword fields")
        if args:
            for row in zip(*args):
                self.write(*row)
        else:
            keys = list(kwargs)
            for row_vals in zip(*kwargs.values()):
                self.write(**dict(zip(keys, row_vals)))


def merge_csvs(data_folder, csv_lst, merged_csv):
    """Concatenate CSVs with identical headers into one file."""
    write_path = os.path.join(data_folder, merged_csv)
    header = None
    lines = []
    for csv_file in csv_lst:
        with open(os.path.join(data_folder, csv_file), encoding="utf-8") as f:
            this_header = f.readline()
            if header is None:
                header = this_header
            elif header != this_header:
                raise ValueError("Inconsistent CSV headers")
            lines.extend(line for line in f if line.strip())
    with open(write_path, "w", encoding="utf-8") as f:
        f.write(header)
        f.writelines(lines)


def read_kaldi_lab(kaldi_ali, kaldi_lab_opts=None):
    """Read Kaldi alignment labels (reference dataio/dataio.py:851).

    Native implementation: reads gzipped/plain TEXT alignment archives
    (``ali*.gz`` / ``ali*.ark`` lines of "utt_id int int ...") without
    kaldi_io. When ``kaldi_lab_opts`` is given (e.g. "ali-to-pdf") and
    the Kaldi binaries are on PATH, the same conversion pipe as the
    reference is run first.

    Returns {utt_id: np.ndarray of int32 labels}.
    """
    import glob
    import gzip
    import shutil
    import subprocess

    files = sorted(
        glob.glob(os.path.join(kaldi_ali, "ali*.gz"))
        + glob.glob(os.path.join(kaldi_ali, "ali*.ark"))
        + glob.glob(os.path.join(kaldi_ali, "ali*.txt"))
    )
    if not files:
        raise FileNotFoundError(f"No ali* archives under {kaldi_ali}")

    def _lines(path):
        opener = gzip.open if path.endswith(".gz") else open
        with opener(path, "rt", encoding="utf-8", errors="replace") as f:
            yield from f

    if kaldi_lab_opts:
        tool = kaldi_lab_opts.split()[0]
        if shutil.which(tool) is None:
            raise RuntimeError(
                f"kaldi_lab_opts={kaldi_lab_opts!r} needs the Kaldi binary "
                f"{tool!r} on PATH; omit kaldi_lab_opts to read raw "
                "transition-id alignments natively"
            )
        cmd = (
            "gunzip -c " + os.path.join(kaldi_ali, "ali*.gz") + " | "
            + kaldi_lab_opts + " "
            + os.path.join(kaldi_ali, "final.mdl") + " ark:- ark,t:-"
        )
        out = subprocess.run(
            cmd, shell=True, capture_output=True, text=True, check=True
        ).stdout.splitlines()
        source = out
    else:
        source = (line for path in files for line in _lines(path))

    lab = {}
    for line in source:
        parts = line.split()
        if len(parts) < 2:
            continue
        lab[parts[0]] = np.asarray([int(v) for v in parts[1:]], np.int32)
    return lab
