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
    """2x (conv + relu + LN + dropout) + linear head (reference
    DurationPredictor, FastSpeech2.py:169): relu(conv(x*mask)) -> LN ->
    dropout, twice, then a 1-unit linear."""

    hidden_dim: int = 256
    kernel_size: int = 3
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, x_mask=None, train=False):
        for i in range(2):
            xin = x if x_mask is None else x * x_mask
            x = Conv1d(self.hidden_dim, self.kernel_size, name=f"conv_{i}")(xin)
            x = jax.nn.relu(x)
            x = LayerNorm(name=f"ln_{i}")(x)
            if train and self.dropout > 0:
                x = nn.Dropout(self.dropout, deterministic=False)(x)
        return Linear(1, name="out")(x)[..., 0]


def average_by_durations(values, durs):
    """Frame-level values (B, T_de) -> per-token averages (B, T_en) over
    duration segments (reference average_over_durations,
    FastSpeech2.py:785): mean of the NONZERO frames in each segment.

    Example
    -------
    >>> import jax.numpy as jnp
    >>> v = jnp.asarray([[2.0, 4.0, 6.0, 0.0]])
    >>> average_by_durations(v, jnp.asarray([[2, 2]])).tolist()
    [[3.0, 6.0]]
    """
    durs = jnp.asarray(durs, jnp.int32)
    T_de = values.shape[1]
    ends = jnp.clip(jnp.cumsum(durs, axis=1), 0, T_de)
    starts = jnp.clip(ends - durs, 0, T_de)
    cums = jnp.pad(jnp.cumsum(values, axis=1), ((0, 0), (1, 0)))
    nz_cums = jnp.pad(
        jnp.cumsum((values != 0.0).astype(values.dtype), axis=1),
        ((0, 0), (1, 0)),
    )
    sums = jnp.take_along_axis(cums, ends, axis=1) - jnp.take_along_axis(
        cums, starts, axis=1
    )
    nelems = jnp.take_along_axis(
        nz_cums, ends, axis=1
    ) - jnp.take_along_axis(nz_cums, starts, axis=1)
    return jnp.where(nelems == 0.0, 0.0, sums / jnp.maximum(nelems, 1.0))


def _head_major_key_mask(pad_mask, nhead):
    """Replicate the reference FastSpeech2 attention-mask quirk (ref
    forward:699-704, 756-761): the (B*nhead, T, T) mask is built with
    ``repeat(nhead, 1, 1)`` — HEAD-major order — while torch's MHA
    consumes batch-major (N, nhead, ...) blocks, so head h of batch b
    actually applies the key-padding mask of batch ``(b*nhead + h) % B``.
    Published checkpoints were trained under this behavior; pours must
    reproduce it. Returns a (B, H, 1, T) bool mask (True = masked)."""
    B = pad_mask.shape[0]
    src = (
        jnp.arange(B)[:, None] * nhead + jnp.arange(nhead)[None, :]
    ) % B
    return pad_mask[src][:, :, None, :]


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
    """FastSpeech2 (reference FastSpeech2.py:390), following the
    reference computation graph exactly — embedding prenet, conv-FFN
    ("1dcnn") FFT blocks, masked sequential variance adaptors operating
    on duration-averaged frame-level pitch/energy, duration upsampling,
    decoder FFT stack, mel linear and a LayerNorm conv postnet — so the
    published tts-fastspeech2-ljspeech checkpoint pours 1:1
    (utils/torch_convert.fastspeech2_key_map).

    Teacher forcing: pass integer ``durations`` plus FRAME-level
    ``pitch``/``energy`` (B, T_mel); inference (durations=None) uses the
    predicted variances.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> net = FastSpeech2(n_symbols=30, d_model=32, nhead=4, d_ffn=64,
    ...     enc_layers=1, dec_layers=1, n_mel_channels=8, max_mel_len=32)
    >>> tokens = jnp.ones((2, 6), dtype=jnp.int32)
    >>> durs = jnp.full((2, 6), 2)
    >>> pitch = jnp.zeros((2, 12)); energy = jnp.zeros((2, 12))
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
    normalize_before: bool = False
    ffn_type: str = "1dcnn"
    ffn_cnn_kernel_size_list: tuple = (9, 1)
    postnet_embedding_dim: int = 512
    postnet_n_convolutions: int = 5
    postnet_dropout: float = 0.5
    padding_idx: int = 0
    variance_kernel_size: int = 3
    variance_dropout: float = 0.5

    def setup(self):
        self.emb = Embedding(
            num_embeddings=self.n_symbols, embedding_dim=self.d_model
        )
        self.pos_enc = PositionalEncoding(input_size=self.d_model, max_len=5000)
        self.encoder = TransformerEncoder(
            num_layers=self.enc_layers, nhead=self.nhead, d_ffn=self.d_ffn,
            d_model=self.d_model, dropout=self.dropout,
            normalize_before=self.normalize_before, ffn_type=self.ffn_type,
            ffn_cnn_kernel_size_list=self.ffn_cnn_kernel_size_list,
        )
        self.decoder = TransformerEncoder(
            num_layers=self.dec_layers, nhead=self.nhead, d_ffn=self.d_ffn,
            d_model=self.d_model, dropout=self.dropout,
            normalize_before=self.normalize_before, ffn_type=self.ffn_type,
            ffn_cnn_kernel_size_list=self.ffn_cnn_kernel_size_list,
        )
        vp = dict(
            hidden_dim=self.d_model, kernel_size=self.variance_kernel_size,
            dropout=self.variance_dropout,
        )
        self.duration_predictor = VariancePredictor(**vp)
        self.pitch_predictor = VariancePredictor(**vp)
        self.energy_predictor = VariancePredictor(**vp)
        self.pitch_embed = Conv1d(
            self.d_model, self.variance_kernel_size, name="pitch_embed"
        )
        self.energy_embed = Conv1d(
            self.d_model, self.variance_kernel_size, name="energy_embed"
        )
        self.mel_linear = Linear(self.n_mel_channels, name="mel_linear")
        self.postnet = _PostNet(
            n_mel_channels=self.n_mel_channels,
            hidden=self.postnet_embedding_dim,
            n_convs=self.postnet_n_convolutions,
            dropout=self.postnet_dropout,
        )

    def __call__(self, tokens, durations=None, pitch=None, energy=None,
                 pace=1.0, pitch_rate=1.0, energy_rate=1.0, train=False):
        pad_mask = tokens == self.padding_idx
        x_mask = (~pad_mask)[..., None].astype(jnp.float32)
        x = self.emb(tokens)
        x = (x + self.pos_enc(x)) * x_mask
        x, _ = self.encoder(
            x, src_mask=_head_major_key_mask(pad_mask, self.nhead),
            src_key_padding_mask=pad_mask, train=train,
        )
        x = x * x_mask

        log_dur_pred = self.duration_predictor(x, x_mask, train=train)
        if durations is None:
            durs_used = jnp.clip(jnp.expm1(log_dur_pred), 0, None)
            durs_used = jnp.where(pad_mask, 0.0, durs_used)
        else:
            durs_used = durations

        # sequential variance adaptors (ref forward:721-746): pitch is
        # predicted and added BEFORE the energy predictor runs
        pitch_pred = self.pitch_predictor(x, x_mask, train=train) * pitch_rate
        avg_pitch = None
        if pitch is not None:
            avg_pitch = average_by_durations(pitch, durations)
            x = x + self.pitch_embed(avg_pitch[..., None])
        else:
            x = x + self.pitch_embed(pitch_pred[..., None])
        energy_pred = (
            self.energy_predictor(x, x_mask, train=train) * energy_rate
        )
        avg_energy = None
        if energy is not None:
            avg_energy = average_by_durations(energy, durations)
            x = x + self.energy_embed(avg_energy[..., None])
        else:
            x = x + self.energy_embed(energy_pred[..., None])

        # duration upsampling (ref upsample: repeat_interleave, floor at
        # pace scaling) then the decoder FFT stack
        int_durs = jnp.floor(pace * durs_used).astype(jnp.int32)
        x, mel_lens = length_regulate(x, int_durs, self.max_mel_len)
        y_pad = (
            jnp.arange(x.shape[1])[None, :] >= mel_lens[:, None]
        )
        y_mask = (~y_pad)[..., None].astype(jnp.float32)
        x = (x + self.pos_enc(x)) * y_mask
        y, _ = self.decoder(
            x, src_mask=_head_major_key_mask(y_pad, self.nhead),
            src_key_padding_mask=y_pad, train=train,
        )
        mel = self.mel_linear(y) * y_mask
        mel_post = self.postnet(mel, train=train) + mel
        return {
            "mel": mel,
            "mel_post": mel_post,
            "log_durations": log_dur_pred,
            "pitch": pitch_pred,
            "avg_pitch": avg_pitch,
            "energy": energy_pred,
            "avg_energy": avg_energy,
            "mel_lens": mel_lens,
        }

    def infer(self, tokens, pace=1.0, pitch_rate=1.0, energy_rate=1.0):
        out = self(
            tokens, pace=pace, pitch_rate=pitch_rate,
            energy_rate=energy_rate, train=False,
        )
        durations = jnp.floor(
            pace * jnp.clip(jnp.expm1(out["log_durations"]), 0, None)
        ).astype(jnp.int32)
        return (
            out["mel_post"], durations, out["pitch"], out["energy"],
            out["mel_lens"],
        )


class _PostNet(nn.Module):
    """Conv postnet with LayerNorms (reference PostNet,
    FastSpeech2.py:79): conv_pre -> LN -> tanh -> dropout, a stack of
    intermediate convs (no nonlinearity between them) -> LN -> tanh ->
    dropout, conv_post -> LN -> dropout."""

    n_mel_channels: int = 80
    hidden: int = 512
    n_convs: int = 5
    kernel_size: int = 5
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, train=False):
        def drop(x):
            if train and self.dropout > 0:
                return nn.Dropout(self.dropout, deterministic=False)(x)
            return x

        x = Conv1d(self.hidden, self.kernel_size, name="conv_pre")(x)
        x = jnp.tanh(LayerNorm(name="ln1")(x))
        x = drop(x)
        for i in range(1, self.n_convs - 1):
            x = Conv1d(self.hidden, self.kernel_size, name=f"conv_int_{i}")(x)
        x = jnp.tanh(LayerNorm(name="ln2")(x))
        x = drop(x)
        x = Conv1d(self.n_mel_channels, self.kernel_size, name="conv_post")(x)
        x = LayerNorm(name="ln3")(x)
        return drop(x)


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
        # the reference compares predictions against the duration-averaged
        # token-level variances computed in forward (ref mse on avg_pitch)
        pitch_t = predictions.get("avg_pitch")
        if pitch_t is None:
            pitch_t = targets["pitch"]
        energy_t = predictions.get("avg_energy")
        if energy_t is None:
            energy_t = targets["energy"]
        pitch_loss = jnp.mean((predictions["pitch"] - pitch_t) ** 2)
        energy_loss = jnp.mean((predictions["energy"] - energy_t) ** 2)
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


# ---------------------------------------------------------------------------
# Internal alignment (reference FastSpeech2.py:1916-2928): alignment
# network, monotonic alignment search, FastSpeech2WithAlignment, losses
# ---------------------------------------------------------------------------

def maximum_path(value, mask):
    """Monotonic alignment search (reference maximum_path_numpy,
    FastSpeech2.py:1916), as two jittable lax.scans instead of a host
    numpy loop: a forward DP over mel frames and a backtrack pass.

    Arguments
    ---------
    value: (B, T_x, T_y) alignment scores (text x mel).
    mask: (B, T_x, T_y) validity mask.

    Returns
    -------
    path: (B, T_x, T_y) hard 0/1 monotonic alignment.

    Example
    -------
    >>> import jax.numpy as jnp
    >>> v = jnp.asarray([[[1.0, 0.0, 0.0], [0.0, 1.0, 1.0]]])
    >>> p = maximum_path(v, jnp.ones((1, 2, 3)))
    >>> p[0].tolist()
    [[1.0, 0.0, 0.0], [0.0, 1.0, 1.0]]
    """
    neg = -1e9
    value = value * mask
    B, T_x, T_y = value.shape
    x_range = jnp.arange(T_x, dtype=jnp.float32)[None, :]

    def fwd(v, j):
        v0 = jnp.pad(v, ((0, 0), (1, 0)), constant_values=neg)[:, :-1]
        max_mask = v >= v0
        v_max = jnp.where(max_mask, v, v0)
        index_mask = x_range <= j
        v_new = jnp.where(index_mask, v_max + value[:, :, j], neg)
        return v_new, max_mask

    _, direction = jax.lax.scan(
        fwd, jnp.zeros((B, T_x)), jnp.arange(T_y)
    )  # direction: (T_y, B, T_x) bool
    direction = jnp.moveaxis(direction, 0, 2).astype(jnp.int32)  # (B,Tx,Ty)
    direction = jnp.where(mask > 0, direction, 1)

    index0 = jnp.sum(mask[:, :, 0], axis=1).astype(jnp.int32) - 1
    batch_range = jnp.arange(B)

    def back(index, j):
        row = jax.nn.one_hot(index, T_x)  # (B, T_x)
        step_dir = direction[batch_range, index, j]
        return index + step_dir - 1, row

    _, rows = jax.lax.scan(
        back, index0, jnp.arange(T_y - 1, -1, -1)
    )  # rows: (T_y, B, T_x) emitted j = Ty-1 .. 0
    path = jnp.moveaxis(rows[::-1], 0, 2)  # (B, T_x, T_y)
    return path * mask


class AlignmentNetwork(nn.Module):
    """Aligner between text keys and mel queries (reference
    AlignmentNetwork, FastSpeech2.py:1975): conv stacks on each side, a
    negative L2 distance map, softmax over text for the soft alignment
    and log-softmax for the CTC-style alignment loss.

    Inputs are channels-last: queries (B, T_de, C_q) mels, keys
    (B, T_en, C_k) text encodings. Returns (soft (B, 1, T_de, T_en),
    logprob (B, 1, T_de, T_en)).
    """

    attn_channels: int = 80
    temperature: float = 0.0005

    @nn.compact
    def __call__(self, queries, keys, x_mask=None):
        key_out = Conv1d(self.attn_channels * 2, 3, name="key_conv1")(keys)
        key_out = jax.nn.relu(key_out)
        key_out = Conv1d(self.attn_channels, 1, name="key_conv2")(key_out)

        q = Conv1d(queries.shape[-1] * 2, 3, name="query_conv1")(queries)
        q = jax.nn.relu(q)
        q = Conv1d(queries.shape[-1], 1, name="query_conv2")(q)
        q = jax.nn.relu(q)
        q = Conv1d(self.attn_channels, 1, name="query_conv3")(q)

        # -L2 distance: (B, T_de, T_en)
        diff = q[:, :, None, :] - key_out[:, None, :, :]
        attn_factor = -self.temperature * jnp.sum(diff**2, axis=-1)
        if x_mask is not None:  # mask invalid text positions
            attn_factor = jnp.where(
                x_mask[:, None, :] > 0, attn_factor, -1e9
            )
        attn_logprob = jax.nn.log_softmax(attn_factor, axis=-1)[:, None]
        attn_soft = jnp.exp(attn_logprob)
        return attn_soft, attn_logprob


def average_over_durations(values, path):
    """Frame-level values (B, T_de) -> token-level averages (B, T_x)
    using a hard alignment path (B, T_x, T_de) (reference
    average_over_durations)."""
    total = jnp.einsum("bxy,by->bx", path, values)
    counts = jnp.maximum(jnp.sum(path, axis=-1), 1.0)
    return total / counts


class FastSpeech2WithAlignment(nn.Module):
    """FastSpeech2 with internal alignment (reference
    FastSpeech2WithAlignment, FastSpeech2.py:2110): no external duration
    targets — an alignment network + monotonic alignment search derive
    durations from (text, mel) pairs during training.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> net = FastSpeech2WithAlignment(n_symbols=20, d_model=32, nhead=4,
    ...     d_ffn=64, enc_layers=1, dec_layers=1, n_mel_channels=8,
    ...     max_mel_len=32)
    >>> tokens = jnp.ones((2, 6), dtype=jnp.int32)
    >>> mels = jnp.zeros((2, 32, 8))
    >>> v = net.init(jax.random.PRNGKey(0), tokens, mels)
    >>> out = net.apply(v, tokens, mels)
    >>> out["mel_post"].shape, out["durations"].shape
    ((2, 32, 8), (2, 6))
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
    attn_channels: int = 80
    temperature: float = 0.0005

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
        self.aligner = AlignmentNetwork(
            attn_channels=self.attn_channels, temperature=self.temperature
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

    def _forward_aligner(self, x, mels, x_mask, y_mask):
        """(reference _forward_aligner, FastSpeech2.py:2384): returns
        (durations (B,Tx), soft (B,Tx,Ty), logprob (B,1,Ty,Tx),
        hard (B,Tx,Ty))."""
        attn_soft, attn_logprob = self.aligner(mels, x, x_mask)
        # (B, 1, T_de, T_en) -> (B, T_en, T_de)
        soft_xy = jnp.swapaxes(attn_soft[:, 0], 1, 2)
        attn_mask = x_mask[:, :, None] * y_mask[:, None, :]
        alignment_mas = maximum_path(soft_xy, attn_mask)
        durations = jnp.sum(alignment_mas, axis=-1)
        return durations, soft_xy, attn_logprob, alignment_mas

    def __call__(self, tokens, mels=None, pitch=None, energy=None,
                 mel_lens=None, train=False):
        x, pad_mask = self._encode(tokens, train)
        x_mask = (~pad_mask).astype(jnp.float32)
        log_dur_pred = self.duration_predictor(x, train=train)

        if mels is None:
            return self._infer_from(x, pad_mask, log_dur_pred, train)

        T_de = mels.shape[1]
        if mel_lens is None:
            y_mask = jnp.ones((mels.shape[0], T_de))
        else:
            y_mask = (
                jnp.arange(T_de)[None, :]
                < jnp.asarray(mel_lens)[:, None]
            ).astype(jnp.float32)
        durations, align_soft, align_logprob, align_hard = (
            self._forward_aligner(x, mels, x_mask, y_mask)
        )
        pitch_pred = self.pitch_predictor(x, train=train)
        energy_pred = self.energy_predictor(x, train=train)
        avg_pitch = avg_energy = None
        if pitch is not None:  # frame-level -> token-level targets
            avg_pitch = average_over_durations(pitch, align_hard)
            x = x + self.pitch_embed(avg_pitch[..., None])
        else:
            x = x + self.pitch_embed(pitch_pred[..., None])
        if energy is not None:
            avg_energy = average_over_durations(energy, align_hard)
            x = x + self.energy_embed(avg_energy[..., None])
        else:
            x = x + self.energy_embed(energy_pred[..., None])

        x, out_lens = length_regulate(
            x, durations.astype(jnp.int32), self.max_mel_len
        )
        x = x + self.pos_enc(x)
        y, _ = self.decoder(x, train=train)
        mel = self.mel_linear(y)
        mel_post = mel + self.postnet(mel, train=train)
        return {
            "mel": mel,
            "mel_post": mel_post,
            "durations": durations,
            "log_durations": log_dur_pred,
            "pitch": pitch_pred,
            "avg_pitch": avg_pitch,
            "energy": energy_pred,
            "avg_energy": avg_energy,
            "mel_lens": out_lens,
            "alignment_soft": align_soft,
            "alignment_logprob": align_logprob,
            "alignment_mas": align_hard,
        }

    def _infer_from(self, x, pad_mask, log_dur, train):
        durations = jnp.clip(
            jnp.round(jnp.exp(log_dur) - 1.0), 0, None
        ).astype(jnp.int32)
        durations = jnp.where(pad_mask, 0, durations)
        pitch_pred = self.pitch_predictor(x, train=train)
        energy_pred = self.energy_predictor(x, train=train)
        x = x + self.pitch_embed(pitch_pred[..., None])
        x = x + self.energy_embed(energy_pred[..., None])
        x, out_lens = length_regulate(x, durations, self.max_mel_len)
        x = x + self.pos_enc(x)
        y, _ = self.decoder(x, train=train)
        mel = self.mel_linear(y)
        mel_post = mel + self.postnet(mel, train=train)
        return {
            "mel": mel, "mel_post": mel_post, "durations": durations,
            "log_durations": log_dur, "pitch": pitch_pred,
            "energy": energy_pred, "mel_lens": out_lens,
        }

    def infer(self, tokens, pace=1.0, **_):
        out = self(tokens, mels=None, train=False)
        return (
            out["mel_post"], out["durations"], out["pitch"], out["energy"],
            out["mel_lens"],
        )


class ForwardSumLoss:
    """CTC alignment loss over the aligner's log-probs (reference
    ForwardSumLoss, FastSpeech2.py:2835), batched through the toolkit's
    XLA ctc_loss instead of a per-utterance host loop.

    attn_logprob: (B, 1, T_de, T_en) — mel frames "emit" text positions
    1..T_en (0 is the CTC blank)."""

    def __init__(self, blank_logprob=-1.0):
        self.blank_logprob = blank_logprob

    def __call__(self, attn_logprob, key_lens, query_lens):
        from speechbrain_tpu.nnet.losses import ctc_loss

        lp = attn_logprob[:, 0]  # (B, T_de, T_en)
        B, T_de, T_en = lp.shape
        lp = jnp.pad(
            lp, ((0, 0), (0, 0), (1, 0)),
            constant_values=self.blank_logprob,
        )
        lp = jax.nn.log_softmax(lp, axis=-1)
        targets = jnp.tile(jnp.arange(1, T_en + 1)[None], (B, 1))
        key_lens = jnp.asarray(key_lens)
        query_lens = jnp.asarray(query_lens)
        return ctc_loss(
            lp, targets,
            query_lens / T_de,
            key_lens / T_en,
            blank_index=0,
        )


class BinaryAlignmentLoss:
    """Force soft alignments toward the MAS hard alignments
    (reference BinaryAlignmentLoss, FastSpeech2.py:2898)."""

    def __call__(self, alignment_hard, alignment_soft):
        log_sum = jnp.sum(
            jnp.where(
                alignment_hard == 1,
                jnp.log(jnp.clip(alignment_soft, 1e-12, None)),
                0.0,
            )
        )
        return -log_sum / jnp.maximum(jnp.sum(alignment_hard), 1.0)


class FastSpeech2WithAlignmentLoss:
    """Total training loss for FastSpeech2WithAlignment (reference
    Loss, FastSpeech2.py:2490): mel L1 (+postnet) + variance MSEs on
    aligner-derived targets + ForwardSum + binary alignment losses."""

    def __init__(self, aligner_weight=1.0, binary_weight=0.1):
        self.forward_sum = ForwardSumLoss()
        self.binary = BinaryAlignmentLoss()
        self.aligner_weight = aligner_weight
        self.binary_weight = binary_weight

    def __call__(self, predictions, targets):
        mel_t = targets["mel"]
        T = min(predictions["mel"].shape[1], mel_t.shape[1])
        mel_loss = jnp.mean(jnp.abs(predictions["mel"][:, :T] - mel_t[:, :T]))
        mel_loss = mel_loss + jnp.mean(
            jnp.abs(predictions["mel_post"][:, :T] - mel_t[:, :T])
        )
        log_dur_t = jnp.log(predictions["durations"] + 1.0)
        dur_loss = jnp.mean((predictions["log_durations"] - log_dur_t) ** 2)
        loss = mel_loss + dur_loss
        if predictions.get("avg_pitch") is not None:
            loss = loss + jnp.mean(
                (predictions["pitch"] - predictions["avg_pitch"]) ** 2
            )
        if predictions.get("avg_energy") is not None:
            loss = loss + jnp.mean(
                (predictions["energy"] - predictions["avg_energy"]) ** 2
            )
        fs = self.forward_sum(
            predictions["alignment_logprob"],
            targets["token_lens"],
            targets["mel_frame_lens"],
        )
        bl = self.binary(
            predictions["alignment_mas"],
            predictions["alignment_soft"],
        )
        return loss + self.aligner_weight * fs + self.binary_weight * bl
