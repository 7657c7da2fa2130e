"""Tacotron2 text-to-mel model.

Capability parity with the reference's
``speechbrain/lobes/models/Tacotron2.py`` (Encoder, Prenet, Postnet,
location-sensitive attention Decoder, Tacotron2 :54-1717, Loss,
TextMelCollate): character embedding -> conv+BiLSTM encoder ->
autoregressive LSTM decoder with location attention -> mel + stop token,
conv postnet residual. The decode loop is a lax.scan (teacher-forced) or
fixed-bound scan with gate masking (inference).
"""

from dataclasses import field

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from speechbrain_tpu.nnet.CNN import Conv1d
from speechbrain_tpu.nnet.linear import Linear
from speechbrain_tpu.nnet.normalization import BatchNorm1d
from speechbrain_tpu.nnet.RNN import LSTM


class Prenet(nn.Module):
    """2-layer bottleneck with always-on dropout (reference Tacotron2
    Prenet — dropout at inference is intentional)."""

    sizes: tuple = (256, 256)
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x):
        for i, size in enumerate(self.sizes):
            x = jax.nn.relu(Linear(size, bias=False, name=f"linear_{i}")(x))
            if self.dropout > 0:
                key = self.make_rng("dropout")
                keep = jax.random.bernoulli(
                    key, 1.0 - self.dropout, x.shape
                )
                x = x * keep / (1.0 - self.dropout)
        return x


class Encoder(nn.Module):
    """3 convs + BiLSTM over character embeddings."""

    encoder_embedding_dim: int = 512
    encoder_n_convolutions: int = 3
    encoder_kernel_size: int = 5

    @nn.compact
    def __call__(self, x, input_lengths=None, train=False):
        for i in range(self.encoder_n_convolutions):
            # plain torch conv in the reference's ConvNorm: ZERO
            # 'same' padding, not the sb reflect default
            x = Conv1d(
                self.encoder_embedding_dim, self.encoder_kernel_size,
                padding_mode="constant", name=f"conv_{i}",
            )(x)
            x = BatchNorm1d(name=f"bn_{i}")(x, train=train)
            x = jax.nn.relu(x)
            if train:
                x = nn.Dropout(0.5, deterministic=False)(x)
        out, _ = LSTM(
            hidden_size=self.encoder_embedding_dim // 2,
            bidirectional=True,
            name="lstm",
        )(x, train=train)
        return out


class Postnet(nn.Module):
    """5 conv layers refining the mel output."""

    n_mel_channels: int = 80
    postnet_embedding_dim: int = 512
    postnet_kernel_size: int = 5
    postnet_n_convolutions: int = 5

    @nn.compact
    def __call__(self, x, train=False):
        for i in range(self.postnet_n_convolutions - 1):
            x = Conv1d(self.postnet_embedding_dim, self.postnet_kernel_size,
                       padding_mode="constant", name=f"conv_{i}")(x)
            x = BatchNorm1d(name=f"bn_{i}")(x, train=train)
            x = jnp.tanh(x)
            if train:
                x = nn.Dropout(0.5, deterministic=False)(x)
        x = Conv1d(self.n_mel_channels, self.postnet_kernel_size,
                   padding_mode="constant", name="conv_out")(x)
        x = BatchNorm1d(name="bn_out")(x, train=train)
        return x


class Tacotron2(nn.Module):
    """Full Tacotron2 (reference Tacotron2.py:54).

    ``__call__(text, text_lens, mels)`` teacher-forces; ``infer`` decodes
    to a fixed max length with gate masking. Mel layout (B, T_mel, n_mel).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> net = Tacotron2(n_symbols=20, encoder_embedding_dim=32,
    ...     attention_rnn_dim=16, decoder_rnn_dim=16, n_mel_channels=8,
    ...     prenet_sizes=(16, 16), attention_dim=16, postnet_embedding_dim=16)
    >>> text = jnp.ones((2, 7), dtype=jnp.int32)
    >>> mels = jnp.ones((2, 12, 8))
    >>> v = net.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
    ...              text, jnp.ones(2), mels)
    >>> mel_out, mel_post, gates, align = net.apply(
    ...     v, text, jnp.ones(2), mels, rngs={"dropout": jax.random.PRNGKey(2)})
    >>> mel_post.shape
    (2, 12, 8)
    """

    n_symbols: int = 148
    symbols_embedding_dim: int = 512
    encoder_embedding_dim: int = 512
    encoder_n_convolutions: int = 3
    encoder_kernel_size: int = 5
    n_mel_channels: int = 80
    attention_rnn_dim: int = 1024
    decoder_rnn_dim: int = 1024
    prenet_sizes: tuple = (256, 256)
    attention_dim: int = 128
    attention_location_n_filters: int = 32
    attention_location_kernel_size: int = 31
    postnet_embedding_dim: int = 512
    postnet_kernel_size: int = 5
    postnet_n_convolutions: int = 5
    gate_threshold: float = 0.5
    max_decoder_steps: int = 1000
    p_attention_dropout: float = 0.1
    p_decoder_dropout: float = 0.1
    # the reference keeps prenet dropout ON even at inference (an
    # intentional Tacotron2 quirk); set 0.0 for deterministic runs
    prenet_dropout: float = 0.5

    def setup(self):
        from speechbrain_tpu.nnet.embedding import Embedding

        self.embedding = Embedding(
            num_embeddings=self.n_symbols,
            embedding_dim=self.symbols_embedding_dim,
        )
        self.encoder = Encoder(
            encoder_embedding_dim=self.encoder_embedding_dim,
            encoder_n_convolutions=self.encoder_n_convolutions,
            encoder_kernel_size=self.encoder_kernel_size,
        )
        self.prenet = Prenet(sizes=self.prenet_sizes,
                             dropout=self.prenet_dropout)
        self.postnet = Postnet(
            n_mel_channels=self.n_mel_channels,
            postnet_embedding_dim=self.postnet_embedding_dim,
            postnet_kernel_size=self.postnet_kernel_size,
            postnet_n_convolutions=self.postnet_n_convolutions,
        )
        D = self.attention_rnn_dim
        E = self.encoder_embedding_dim
        # attention RNN (LSTM cell weights)
        self.attn_wx = Linear(4 * D, name="attn_wx")
        self.attn_wh = self.param(
            "attn_wh", nn.initializers.orthogonal(), (D, 4 * D)
        )
        # location-sensitive attention
        self.attn_query = Linear(self.attention_dim, bias=False, name="attn_query")
        self.attn_memory = Linear(self.attention_dim, bias=False, name="attn_memory")
        self.attn_location_conv = Conv1d(
            self.attention_location_n_filters,
            self.attention_location_kernel_size,
            bias=False,
            padding_mode="constant",
            name="attn_loc_conv",
        )
        self.attn_location_dense = Linear(
            self.attention_dim, bias=False, name="attn_loc_dense"
        )
        self.attn_v = Linear(1, bias=False, name="attn_v")
        # decoder RNN
        DR = self.decoder_rnn_dim
        self.dec_wx = Linear(4 * DR, name="dec_wx")
        self.dec_wh = self.param(
            "dec_wh", nn.initializers.orthogonal(), (DR, 4 * DR)
        )
        self.linear_projection = Linear(self.n_mel_channels, name="mel_proj")
        self.gate_layer = Linear(1, name="gate")

    def _lstm_cell(self, wx, wh, x, h, c):
        gates = wx(x) + jnp.matmul(h, wh)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return h, c

    def _attend(self, attn_h, memory, processed_memory, attn_weights_cat, mask):
        query = self.attn_query(attn_h)[:, None, :]
        loc = self.attn_location_conv(attn_weights_cat)
        loc = self.attn_location_dense(loc)
        scores = self.attn_v(jnp.tanh(query + processed_memory + loc))[..., 0]
        scores = jnp.where(mask, scores, -1e9)
        weights = jax.nn.softmax(scores, axis=-1)
        context = jnp.einsum("bt,bte->be", weights, memory)
        return context, weights

    def _decode_step(self, state, mel_in, memory, processed_memory, mask):
        (attn_h, attn_c, dec_h, dec_c, attn_w, attn_w_cum, context) = state
        prenet_out = self.prenet(mel_in)
        cell_in = jnp.concatenate([prenet_out, context], axis=-1)
        attn_h, attn_c = self._lstm_cell(
            self.attn_wx, self.attn_wh, cell_in, attn_h, attn_c
        )
        attn_cat = jnp.stack([attn_w, attn_w_cum], axis=-1)
        context, attn_w = self._attend(
            attn_h, memory, processed_memory, attn_cat, mask
        )
        attn_w_cum = attn_w_cum + attn_w
        dec_in = jnp.concatenate([attn_h, context], axis=-1)
        dec_h, dec_c = self._lstm_cell(
            self.dec_wx, self.dec_wh, dec_in, dec_h, dec_c
        )
        proj_in = jnp.concatenate([dec_h, context], axis=-1)
        mel_out = self.linear_projection(proj_in)
        gate = self.gate_layer(proj_in)[..., 0]
        new_state = (attn_h, attn_c, dec_h, dec_c, attn_w, attn_w_cum, context)
        return new_state, (mel_out, gate, attn_w)

    def _init_state(self, B, T_enc, dtype):
        D, DR, E = self.attention_rnn_dim, self.decoder_rnn_dim, self.encoder_embedding_dim
        return (
            jnp.zeros((B, D), dtype), jnp.zeros((B, D), dtype),
            jnp.zeros((B, DR), dtype), jnp.zeros((B, DR), dtype),
            jnp.zeros((B, T_enc), dtype), jnp.zeros((B, T_enc), dtype),
            jnp.zeros((B, E), dtype),
        )

    def __call__(self, text, text_lens, mels, train=False):
        """Teacher-forced forward: returns (mel_out, mel_post, gates, aligns)."""
        B, T_mel, _ = mels.shape
        emb = self.embedding(text)
        memory = self.encoder(emb, train=train)
        processed_memory = self.attn_memory(memory)
        T_enc = memory.shape[1]
        mask = (
            jnp.arange(T_enc)[None, :]
            < jnp.round(text_lens * T_enc)[:, None]
        )
        go_frame = jnp.zeros((B, 1, self.n_mel_channels), mels.dtype)
        dec_inputs = jnp.concatenate([go_frame, mels[:, :-1]], axis=1)
        state = self._init_state(B, T_enc, mels.dtype)

        def body(mdl, carry, mel_in):
            return mdl._decode_step(carry, mel_in, memory, processed_memory, mask)

        scan = nn.scan(
            body,
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
        )
        _, (mel_outs, gates, aligns) = scan(
            self, state, jnp.moveaxis(dec_inputs, 1, 0)
        )
        mel_outs = jnp.moveaxis(mel_outs, 0, 1)  # (B, T_mel, n_mel)
        gates = jnp.moveaxis(gates, 0, 1)
        aligns = jnp.moveaxis(aligns, 0, 1)
        mel_post = mel_outs + self.postnet(mel_outs, train=train)
        return mel_outs, mel_post, gates, aligns

    def _condition(self, memory, spk_embs):
        """Speaker-conditioning hook: identity here; MSTacotron2 projects
        and adds the speaker embedding (ref MSTacotron2.py:353 threads
        spk_embs through infer)."""
        return memory

    def infer(self, text, text_lens, max_steps=None, spk_embs=None):
        """Free-running inference with gate-based stopping (masked)."""
        max_steps = max_steps or self.max_decoder_steps
        B = text.shape[0]
        emb = self.embedding(text)
        memory = self.encoder(emb, train=False)
        memory = self._condition(memory, spk_embs)
        processed_memory = self.attn_memory(memory)
        T_enc = memory.shape[1]
        mask = (
            jnp.arange(T_enc)[None, :]
            < jnp.round(text_lens * T_enc)[:, None]
        )
        state = self._init_state(B, T_enc, memory.dtype)
        mel_in0 = jnp.zeros((B, self.n_mel_channels), memory.dtype)

        def body(mdl, carry, _x):
            state, mel_in, finished = carry
            state, (mel_out, gate, attn_w) = mdl._decode_step(
                state, mel_in, memory, processed_memory, mask
            )
            finished = jnp.logical_or(
                finished, jax.nn.sigmoid(gate) > self.gate_threshold
            )
            return (state, mel_out, finished), (mel_out, gate, finished)

        scan = nn.scan(
            body,
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
            length=max_steps,
        )
        _, (mels, gates, finished) = scan(
            self, (state, mel_in0, jnp.zeros((B,), bool)), None
        )
        mels = jnp.moveaxis(mels, 0, 1)
        mel_post = mels + self.postnet(mels, train=False)
        lengths = jnp.argmax(jnp.moveaxis(finished, 0, 1).astype(jnp.int32), axis=1)
        lengths = jnp.where(lengths == 0, max_steps, lengths)
        return mel_post, lengths, jnp.moveaxis(gates, 0, 1)


class Loss:
    """Tacotron2 loss: mel MSE (pre+post) + gate BCE
    (reference Tacotron2.py Loss)."""

    def __init__(self, gate_loss_weight=1.0, guided_attention_weight=0.0,
                 guided_attention_sigma=0.2):
        self.gate_loss_weight = gate_loss_weight
        self.guided_attention_weight = guided_attention_weight
        self.guided_attention_sigma = guided_attention_sigma

    def __call__(self, model_output, targets, lengths=None):
        mel_out, mel_post, gates, aligns = model_output
        mel_target, gate_target = targets
        mel_loss = jnp.mean((mel_out - mel_target) ** 2) + jnp.mean(
            (mel_post - mel_target) ** 2
        )
        logp = jax.nn.log_sigmoid(gates)
        lognotp = jax.nn.log_sigmoid(-gates)
        gate_loss = -jnp.mean(
            gate_target * logp + (1 - gate_target) * lognotp
        )
        total = mel_loss + self.gate_loss_weight * gate_loss
        if self.guided_attention_weight > 0 and aligns is not None:
            B, T_mel, T_enc = aligns.shape
            t = jnp.arange(T_mel)[None, :, None] / T_mel
            s = jnp.arange(T_enc)[None, None, :] / T_enc
            W = 1.0 - jnp.exp(
                -((s - t) ** 2) / (2 * self.guided_attention_sigma**2)
            )
            total = total + self.guided_attention_weight * jnp.mean(aligns * W)
        return total


def text_mel_collate(batch, n_frames_per_step=1):
    """Pad a list of (text_ids, mel) pairs (reference TextMelCollate)."""
    from speechbrain_tpu.utils.data_utils import batch_pad_right

    texts = [np.asarray(b["text_sequence"], np.int32) for b in batch]
    mels = [np.asarray(b["mel"], np.float32) for b in batch]
    text_padded, text_lens = batch_pad_right(texts)
    mel_padded, mel_lens = batch_pad_right(mels)
    B, T_mel = mel_padded.shape[:2]
    gate = np.zeros((B, T_mel), np.float32)
    for i, rel in enumerate(mel_lens):
        gate[i, int(round(rel * T_mel)) - 1 :] = 1.0
    return text_padded, text_lens, mel_padded, gate, mel_lens
