"""Tests for augmentation modules."""

import jax
import jax.numpy as jnp
import numpy as np

from speechbrain_tpu.augment.augmenter import Augmenter
from speechbrain_tpu.augment.freq_domain import RandomShift, SpectrogramDrop, Warping
from speechbrain_tpu.augment.time_domain import (
    AddNoise,
    AddReverb,
    DoClip,
    DropChunk,
    DropFreq,
    RandAmp,
    Resample,
    SignFlip,
    SpeedPerturb,
    pink_noise_like,
)

KEY = jax.random.PRNGKey(7)
WAV = jnp.asarray(np.sin(np.linspace(0, 100, 8000))[None].repeat(2, 0).astype("float32"))


def test_add_noise_snr():
    an = AddNoise(snr_low=3, snr_high=3)
    out = an(WAV, jnp.ones(2), rng=KEY)
    assert out.shape == WAV.shape
    assert not np.allclose(np.asarray(out), np.asarray(WAV))


def test_add_reverb():
    rev = AddReverb()
    out = rev(WAV, rng=KEY)
    assert out.shape == WAV.shape
    # amplitude preserved approximately
    ratio = float(jnp.abs(out).mean() / jnp.abs(WAV).mean())
    assert 0.5 < ratio < 2.0


def test_resample_halves_length():
    rs = Resample(orig_freq=16000, new_freq=8000)
    out = rs(WAV)
    assert out.shape == (2, 4000)
    # downsample a pure tone keeps it roughly sinusoidal
    assert np.isfinite(np.asarray(out)).all()


def test_resample_identity():
    rs = Resample(16000, 16000)
    assert rs(WAV) is WAV


def test_speed_perturb_keeps_shape():
    sp = SpeedPerturb(speeds=[90, 110])
    out = sp(WAV, rng=KEY)
    assert out.shape == WAV.shape


def test_drop_freq_and_chunk():
    out = DropFreq()(WAV, rng=KEY)
    assert out.shape == WAV.shape
    out = DropChunk(drop_length_low=10, drop_length_high=50)(WAV, jnp.ones(2), rng=KEY)
    assert float(jnp.mean((out == 0).astype(jnp.float32))) > 0.0


def test_clip_amp_flip():
    out = DoClip(clip_low=0.3, clip_high=0.3)(WAV, rng=KEY)
    assert float(jnp.abs(out).max()) <= 0.3 + 1e-6
    out = RandAmp()(WAV, rng=KEY)
    assert out.shape == WAV.shape
    out = SignFlip(flip_prob=1.0)(WAV, rng=KEY)
    assert np.allclose(np.asarray(out), -np.asarray(WAV))


def test_pink_noise():
    noise = pink_noise_like(WAV, rng=KEY)
    assert noise.shape == WAV.shape
    spec = np.abs(np.fft.rfft(np.asarray(noise[0])))
    # pink noise: low-frequency energy exceeds high-frequency energy
    assert spec[1:100].mean() > spec[-100:].mean()


def test_spectrogram_drop_time_and_freq():
    x = jnp.ones((2, 50, 40))
    for dim in (1, 2):
        out = SpectrogramDrop(dim=dim)(x, rng=KEY)
        dropped = float(jnp.mean((out == 0).astype(jnp.float32)))
        assert 0.0 < dropped < 0.9


def test_warping():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 60, 8)).astype("float32"))
    out = Warping(warp_window=5)(x, rng=KEY)
    assert out.shape == x.shape


def test_random_shift():
    x = jnp.arange(10.0)[None, :]
    out = RandomShift(min_shift=2, max_shift=2)(x, rng=KEY)
    assert float(out[0, 2]) == 0.0


def test_augmenter_concat_and_labels():
    aug = Augmenter(concat_original=True, augmentations=[RandAmp()])
    wavs, lens = aug(WAV, jnp.ones(2), rng=KEY)
    assert wavs.shape[0] == 4
    labels = aug.replicate_labels(jnp.asarray([1, 2]))
    assert labels.tolist() == [1, 2, 1, 2]


def test_augmenter_parallel():
    aug = Augmenter(
        parallel_augment=True, augmentations=[RandAmp(), SignFlip(flip_prob=1.0)]
    )
    wavs, lens = aug(WAV, jnp.ones(2), rng=KEY)
    assert wavs.shape[0] == 4


def test_augmenter_jit_composable():
    """Augmentations compose inside a jitted function (explicit rng)."""

    an = AddNoise(snr_low=10, snr_high=10)
    drop = DropChunk(drop_length_low=10, drop_length_high=20)

    @jax.jit
    def pipeline(x, lens, rng):
        k1, k2 = jax.random.split(rng)
        x = an(x, lens, rng=k1)
        return drop(x, lens, rng=k2)

    out = pipeline(WAV, jnp.ones(2), KEY)
    assert out.shape == WAV.shape
