"""Pallas kernel numerics (interpret mode on CPU): the fused mel
frontend (ops/mel_frontend.py) incl. the unaligned-hop phase-grouped
framing, and flash attention (ops/attention.py) vs the unfused paths."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speechbrain_tpu.lobes.features import Fbank
from speechbrain_tpu.nnet.attention import scaled_dot_product_attention
from speechbrain_tpu.ops.attention import flash_attention
from speechbrain_tpu.ops.mel_frontend import fused_fbank


@pytest.mark.parametrize("hop", [160, 128, 256])
def test_fused_fbank_matches_unfused(hop):
    wav = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 16000)), jnp.float32
    )
    fb = Fbank(n_mels=80, hop_length=hop * 1000 // 16000)
    ref = np.asarray(fb(wav))
    out = np.asarray(
        fused_fbank(
            wav, fb.compute_STFT.window, fb.compute_fbanks.fbank_matrix,
            n_fft=fb.compute_STFT.n_fft, hop_length=hop,
            top_db=fb.compute_fbanks.top_db, interpret=True,
        )
    )
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=5e-3)


def test_flash_attention_matches_unfused():
    B, H, T, D = 2, 2, 256, 64
    rng = np.random.default_rng(0)
    q, k, v = (
        jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.float32)
        for _ in range(3)
    )
    ref, _ = scaled_dot_product_attention(q, k, v, use_pallas=False)
    out, _ = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_flash_attention_with_causal_bias():
    B, H, T, D = 1, 2, 256, 64
    rng = np.random.default_rng(1)
    q, k, v = (
        jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.float32)
        for _ in range(3)
    )
    bias = jnp.where(jnp.triu(jnp.ones((T, T), bool), 1), -1e9, 0.0)
    ref, _ = scaled_dot_product_attention(
        q, k, v, mask_bias=bias, use_pallas=False
    )
    out, _ = flash_attention(q, k, v, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
