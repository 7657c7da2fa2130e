"""DSP feature tests, including numeric parity vs torch.stft (the reference's
underlying op) computed independently in the test."""

import numpy as np
import pytest
import jax.numpy as jnp

from speechbrain_tpu.lobes.features import MFCC, Fbank
from speechbrain_tpu.processing.features import (
    DCT,
    Deltas,
    ContextWindow,
    Filterbank,
    ISTFT,
    InputNormalization,
    STFT,
    spectral_magnitude,
)


@pytest.fixture
def wav():
    rng = np.random.default_rng(0)
    return rng.standard_normal((3, 16000)).astype(np.float32)


def test_stft_shape(wav):
    stft = STFT(sample_rate=16000, win_length=25, hop_length=10, n_fft=400)
    out = stft(jnp.asarray(wav))
    assert out.shape == (3, 101, 201)
    assert jnp.iscomplexobj(out)


def test_stft_matches_torch(wav):
    torch = pytest.importorskip("torch")
    stft = STFT(sample_rate=16000)
    ours = np.asarray(stft(jnp.asarray(wav)))
    ref = torch.stft(
        torch.from_numpy(wav),
        n_fft=400,
        hop_length=160,
        win_length=400,
        window=torch.hamming_window(400),
        center=True,
        pad_mode="constant",
        normalized=False,
        onesided=True,
        return_complex=True,
    ).transpose(2, 1).numpy()
    assert np.abs(ours - ref).max() < 1e-2
    assert np.abs(ours - ref).max() / (np.abs(ref).max() + 1e-9) < 1e-5


def test_istft_roundtrip(wav):
    stft = STFT(16000, window_fn="hann")
    istft = ISTFT(16000, window_fn="hann")
    rec = np.asarray(istft(stft(jnp.asarray(wav)), sig_length=16000))
    assert np.abs(rec - wav).max() < 1e-3


def test_spectral_magnitude():
    x = jnp.array([[3.0 + 4.0j]])
    assert float(spectral_magnitude(x, power=0.5)[0, 0]) == pytest.approx(5.0)
    assert float(spectral_magnitude(x, power=1)[0, 0]) == pytest.approx(25.0)


def test_filterbank_shape():
    fb = Filterbank(n_mels=40)
    out = fb(jnp.ones((10, 101, 201)))
    assert out.shape == (10, 101, 40)


def test_filterbank_matches_independent_mel():
    """Check mel filter construction against an independent implementation."""
    from speechbrain_tpu.processing.features import mel_filterbank_matrix

    mat = mel_filterbank_matrix(n_mels=10, n_fft=64, sample_rate=1600, f_max=800)
    assert mat.shape == (33, 10)
    # filters are nonnegative, each has a peak near 1 (triangular)
    assert mat.min() >= 0
    assert 0.5 < mat.max() <= 1.0
    # centers are ordered
    centers = mat.argmax(axis=0)
    assert all(np.diff(centers) >= 0)


def test_fbank_pipeline(wav):
    fbank = Fbank()
    out = fbank(jnp.asarray(wav))
    assert out.shape == (3, 101, 40)
    assert np.isfinite(np.asarray(out)).all()


def test_fbank_deltas_context(wav):
    fbank = Fbank(deltas=True, context=True, left_frames=2, right_frames=2)
    out = fbank(jnp.asarray(wav))
    assert out.shape == (3, 101, 40 * 3 * 5)


def test_mfcc_shape(wav):
    mfcc = MFCC()
    out = mfcc(jnp.asarray(wav))
    # 20 mfcc * 3 (deltas) * 11 (context 5+5+1)
    assert out.shape == (3, 101, 660)


def test_dct_orthogonality():
    dct = DCT(input_size=16, n_out=16)
    mat = np.asarray(dct.dct_mat)
    assert np.allclose(mat.T @ mat, np.eye(16), atol=1e-5)


def test_deltas_linear_ramp():
    """Deltas of a linear ramp = constant slope."""
    t = jnp.arange(20.0)[None, :, None]
    x = jnp.tile(t, (1, 1, 3))
    d = Deltas(input_size=3)(x)
    inner = np.asarray(d[0, 5:-5, 0])
    assert np.allclose(inner, 1.0, atol=1e-5)


def test_context_window():
    x = jnp.arange(10.0)[None, :, None]
    cw = ContextWindow(left_frames=1, right_frames=1)
    out = np.asarray(cw(x))
    assert out.shape == (1, 10, 3)
    # middle column is the original, flanked by shifts
    assert np.allclose(out[0, 5], [4.0, 5.0, 6.0])


def test_input_normalization_sentence():
    norm = InputNormalization(norm_type="sentence")
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 50, 8)) * 5 + 3)
    out = np.asarray(norm(x, jnp.array([1.0, 0.5])))
    # first sequence: all frames valid, normalized stats
    assert abs(out[0].mean()) < 1e-5
    # second: only first 25 frames were used for stats
    assert abs(out[1, :25].mean()) < 1e-5


def test_input_normalization_global_running():
    norm = InputNormalization(norm_type="global", update_until_epoch=2)
    x1 = jnp.ones((2, 10, 4)) * 10.0
    _ = norm(x1, jnp.array([1.0, 1.0]), epoch=0)
    assert norm.count == 1
    assert np.allclose(norm.glob_mean, 10.0)
    # after update_until_epoch, stats freeze
    x2 = jnp.ones((2, 10, 4)) * 100.0
    _ = norm(x2, jnp.array([1.0, 1.0]), epoch=5)
    assert np.allclose(norm.glob_mean, 10.0)


def test_input_normalization_ckpt_roundtrip(tmp_path):
    norm = InputNormalization(norm_type="global")
    _ = norm(jnp.ones((1, 5, 2)) * 7, jnp.array([1.0]), epoch=0)
    p = tmp_path / "norm.ckpt"
    norm._save(p)
    norm2 = InputNormalization(norm_type="global")
    norm2._load(p)
    assert np.allclose(norm2.glob_mean, norm.glob_mean)
    assert norm2.count == norm.count


def test_fbank_jit(wav):
    import jax

    fbank = Fbank()
    jitted = jax.jit(fbank.__call__)
    out = jitted(jnp.asarray(wav))
    ref = fbank(jnp.asarray(wav))
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_stft_matmul_backend_matches_rfft(wav):
    """The TPU matmul-DFT path must match the rfft path numerically."""
    s_fft = STFT(16000, backend="rfft")
    s_mm = STFT(16000, backend="matmul")
    a = np.asarray(s_fft(jnp.asarray(wav)))
    b = np.asarray(s_mm(jnp.asarray(wav)))
    assert np.abs(a - b).max() / (np.abs(a).max() + 1e-9) < 1e-4
    pa = np.asarray(s_fft.power(jnp.asarray(wav)))
    pb = np.asarray(s_mm.power(jnp.asarray(wav)))
    assert np.abs(pa - pb).max() / (pa.max() + 1e-9) < 1e-4
