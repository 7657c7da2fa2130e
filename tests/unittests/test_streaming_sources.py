"""StreamingASR live-source surface (reference inference/ASR.py:1016
ffmpeg chunk stream): any chunk iterator drives transcription, raw-PCM
file-object sources re-chunk arbitrary read sizes, and a streamed run
over a long file equals the full-file chunked run."""

import io

import numpy as np

from speechbrain_tpu.inference.streaming import (
    StreamingASR,
    pcm_stream,
)
from speechbrain_tpu.utils.dynamic_chunk_training import DynChunkTrainConfig


class _FakeTokenizer:
    def decode_ids(self, ids):
        return "".join(chr(ord("a") + (i % 26)) for i in ids)


def _make_asr():
    """A deterministic fake streaming stack: the 'encoder' carries a
    running sample count so outputs depend on stream position (any
    chunking mismatch changes the transcript)."""

    def make_ctx(batch, cfg):
        return {"count": 0}

    def encode_chunk(feats, ctx):
        start = ctx["count"]
        ctx = {"count": start + feats.shape[1]}
        return (start, np.asarray(feats)), ctx

    def decode_chunk(enc, ctx):
        start, feats = enc
        # one token per chunk derived from position + content
        val = int(start // feats.shape[1] + int(abs(feats).sum()) % 7)
        return [[val]], ctx

    return StreamingASR(hparams={
        "sample_rate": 16000,
        "make_streaming_context": make_ctx,
        "encode_chunk": encode_chunk,
        "decode_chunk": decode_chunk,
        "tokenizer": _FakeTokenizer(),
        "samples_per_frame": 160,
    })


def test_stream_iterator_matches_full_file(tmp_path):
    from speechbrain_tpu.dataio.dataio import write_audio

    rng = np.random.default_rng(0)
    audio = rng.standard_normal(16000 * 3).astype(np.float32) * 0.1
    path = tmp_path / "long.wav"
    write_audio(str(path), audio, 16000)

    cfg = DynChunkTrainConfig(chunk_size=8, left_context_size=2)
    asr = _make_asr()
    full = list(asr.transcribe_file_streaming(str(path), cfg))

    # live-source path: raw PCM through a file object with awkward read
    # sizes (simulating a socket), re-chunked by pcm_stream
    asr2 = _make_asr()
    raw = io.BytesIO(audio.tobytes())
    chunks = pcm_stream(raw, frames_per_chunk=777)
    streamed = list(asr2.transcribe_stream(chunks, cfg))
    assert "".join(streamed) == "".join(full)


def test_pcm_stream_rechunks_and_keeps_tail():
    sig = np.arange(10, dtype=np.float32)
    out = list(pcm_stream(io.BytesIO(sig.tobytes()), frames_per_chunk=4))
    assert [len(c) for c in out] == [4, 4, 2]
    np.testing.assert_array_equal(np.concatenate(out), sig)


def test_ffmpeg_stream_raises_cleanly_without_binary(monkeypatch):
    import shutil

    import pytest

    from speechbrain_tpu.inference import streaming

    monkeypatch.setattr(shutil, "which", lambda _: None)
    with pytest.raises(RuntimeError, match="ffmpeg"):
        list(streaming.ffmpeg_audio_stream("rtmp://x", 100))
