"""Native C++ WAV decoder: parity with stdlib wave, segments, downmix."""

import wave

import numpy as np
import pytest

from speechbrain_tpu.io import native_available, read_wav, read_wav_mono, wav_info

pytestmark = pytest.mark.skipif(
    not native_available(), reason="no C++ toolchain"
)


def _write_wav(path, sig, sr=16000, ch=1):
    sig16 = (np.clip(sig, -1, 1) * 32767).astype("<i2")
    with wave.open(str(path), "wb") as w:
        w.setnchannels(ch)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(sig16.tobytes())


def test_native_wav_parity_and_segments(tmp_path):
    rng = np.random.default_rng(0)
    sig = rng.normal(0, 0.2, 8000).astype("float32")
    p = tmp_path / "a.wav"
    _write_wav(p, sig)

    frames, sr, ch = wav_info(p)
    assert (frames, sr, ch) == (8000, 16000, 1)

    data, sr2 = read_wav_mono(p)
    ref = (np.clip(sig, -1, 1) * 32767).astype("<i2") / 32768.0
    np.testing.assert_array_equal(data, ref.astype("float32"))

    seg, _ = read_wav_mono(p, start=100, stop=300)
    np.testing.assert_array_equal(seg, data[100:300])

    # stop beyond the end clamps
    tail, _ = read_wav_mono(p, start=7900, stop=10**9)
    assert tail.shape == (100,)


def test_native_wav_stereo_downmix(tmp_path):
    rng = np.random.default_rng(1)
    left = rng.normal(0, 0.2, 4000).astype("float32")
    inter = np.stack([left, -left], -1).reshape(-1)
    p = tmp_path / "st.wav"
    _write_wav(p, inter, ch=2)

    full, _ = read_wav(p)
    assert full.shape == (4000, 2)
    mono, _ = read_wav_mono(p)
    assert float(np.abs(mono).max()) <= 2.0 / 32768

    # read_audio routes .wav through the native path
    from speechbrain_tpu.dataio.dataio import read_audio

    out = read_audio({"file": str(p), "start": 10, "stop": 20})
    np.testing.assert_allclose(out, mono[10:20], atol=1e-7)


def test_native_rejects_garbage(tmp_path):
    p = tmp_path / "bad.wav"
    p.write_bytes(b"not a riff file at all")
    with pytest.raises(OSError):
        wav_info(p)


def test_native_editdist_matches_python_dp():
    """The C++ edit-ops core must reproduce the Python DP exactly
    (same tie-breaking), across random pairs."""
    import numpy as np

    from speechbrain_tpu.utils import edit_distance as ed
    from speechbrain_tpu.utils.editdist_native import (
        edit_ops_batch,
        native_available,
    )

    if not native_available():
        import pytest

        pytest.skip("no compiler for the native core")
    rng = np.random.default_rng(0)
    refs, hyps = [], []
    for _ in range(50):
        refs.append(rng.integers(0, 8, size=rng.integers(0, 25)).tolist())
        hyps.append(rng.integers(0, 8, size=rng.integers(0, 25)).tolist())
    native = edit_ops_batch(refs, hyps)
    for k, (r, h) in enumerate(zip(refs, hyps)):
        edits = ed.count_ops(ed.op_table(r, h))
        assert native[k, 0] == edits.get("insertions", 0), (k, r, h)
        assert native[k, 1] == edits.get("deletions", 0), (k, r, h)
        assert native[k, 2] == edits.get("substitutions", 0), (k, r, h)


def test_native_editdist_speedup():
    """Sanity: the native batch path beats the Python DP wall-clock on a
    realistically sized eval batch (strings, like real WER eval)."""
    import time

    import numpy as np

    from speechbrain_tpu.utils import edit_distance as ed
    from speechbrain_tpu.utils.editdist_native import (
        edit_ops_batch,
        native_available,
    )

    if not native_available():
        import pytest

        pytest.skip("no compiler for the native core")
    rng = np.random.default_rng(1)
    vocab = [f"w{i}" for i in range(200)]
    refs = [
        [vocab[i] for i in rng.integers(0, 200, size=30)] for _ in range(200)
    ]
    hyps = [
        [vocab[i] for i in rng.integers(0, 200, size=30)] for _ in range(200)
    ]
    t0 = time.perf_counter()
    edit_ops_batch(refs, hyps)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    for r, h in zip(refs[:50], hyps[:50]):
        ed.count_ops(ed.op_table(r, h))
    t_python = (time.perf_counter() - t0) * 4  # extrapolate to 200
    assert t_native < t_python, (t_native, t_python)
