"""Conformer encoder with dynamic-chunk and streaming support.

Capability parity with the reference's
``speechbrain/lobes/models/transformer/Conformer.py`` (ConvolutionModule
:75, ConformerEncoderLayer :333 + forward_streaming :501, ConformerEncoder
:606 + streaming contexts :33-74, ConformerDecoder :1019), TPU-first:

* chunked attention is an additive bias computed from a static chunk
  size — one compiled program per (chunk size) bucket, no dynamic shapes;
* streaming state (per-layer left-context keys/values + conv cache) is an
  explicit pytree threaded through jitted chunk steps;
* the convolution module's depthwise conv is causal-or-centered via static
  padding, with a dynamic-chunk masked variant that prevents any
  cross-chunk leakage at train time (reference's dcconv path).
"""

from dataclasses import dataclass, field
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from speechbrain_tpu.nnet.attention import (
    MultiheadAttention,
    PositionalwiseFeedForward,
    RelPosEncXL,
    RelPosMHAXL,
    RoPEMHA,
)
from speechbrain_tpu.nnet.CNN import Conv1d
from speechbrain_tpu.nnet.normalization import LayerNorm
from speechbrain_tpu.lobes.models.transformer.Transformer import _make_attention


def make_chunked_attention_mask(T, chunk_size, left_context_chunks=None):
    """(T, T) bool mask (True = masked) for chunked attention:
    frame i attends within its chunk and up to N left chunks
    (reference TransformerASR.py:47-106 mask construction)."""
    idx = np.arange(T)
    chunk_id = idx // chunk_size
    q = chunk_id[:, None]
    k = chunk_id[None, :]
    allowed = k <= q
    if left_context_chunks is not None:
        allowed &= k >= (q - left_context_chunks)
    return ~allowed


@dataclass
class ConformerEncoderLayerStreamingContext:
    """Streaming state for one layer: left-context activations for MHSA
    and the depthwise-conv left cache (reference Conformer.py:33)."""

    mha_left_context_size: int
    mha_left_context: Any = None
    dcconv_left_context: Any = None


@dataclass
class ConformerEncoderStreamingContext:
    """Streaming state for the full encoder (reference Conformer.py:64)."""

    dynchunktrain_config: Any
    layers: list = field(default_factory=list)


class ConvolutionModule(nn.Module):
    """Conformer convolution module (reference Conformer.py:75):
    LN -> pointwise(2x, GLU) -> depthwise -> LN(+swish) -> pointwise.

    ``causal`` uses left-only padding; with a dynamic-chunk config the
    depthwise conv is computed per-chunk so no future leaks across chunk
    boundaries (the reference's chunked conv at :160-240).
    """

    input_size: int
    kernel_size: int = 31
    bias: bool = True
    causal: bool = False
    dilation: int = 1
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, mask=None, dynchunktrain_config=None, train=False):
        from speechbrain_tpu.nnet.activations import swish

        y = LayerNorm(name="layer_norm")(x)
        y = Conv1d(
            out_channels=2 * self.input_size, kernel_size=1, bias=self.bias,
            name="pw1",
        )(y)
        a, b = jnp.split(y, 2, axis=-1)
        y = a * jax.nn.sigmoid(b)  # GLU
        # single VALID depthwise conv shared by all paths; padding is done
        # manually so the streaming / DCConv variants reuse the same params
        dw = Conv1d(
            out_channels=self.input_size,
            kernel_size=self.kernel_size,
            groups=self.input_size,
            padding="valid",
            dilation=self.dilation,
            bias=self.bias,
            name="dw",
        )
        if dynchunktrain_config is not None and not self.causal:
            # Dynamic Chunk Convolution (reference Conformer.py:189-280):
            # each chunk sees `half` real frames of left context (crossing
            # into the previous chunk) and ZERO future context beyond its
            # own chunk — a centered conv inside the chunk window
            # [half left-context | chunk | half zeros], VALID-convolved.
            assert self.dilation == 1, "DCConv does not support dilation != 1"
            cs = dynchunktrain_config.chunk_size
            T = y.shape[1]
            half = (self.kernel_size - 1) // 2
            pad_t = (-T) % cs
            yp = jnp.pad(y, ((0, 0), (half, pad_t), (0, 0)))
            B, _, C = yp.shape
            n_chunks = (T + pad_t) // cs
            # windows of size half+cs at stride cs (torch unfold equivalent)
            starts = np.arange(n_chunks) * cs
            idx = starts[:, None] + np.arange(half + cs)[None, :]
            windows = yp[:, idx, :]  # (B, n_chunks, half+cs, C)
            windows = jnp.pad(windows, ((0, 0), (0, 0), (0, half), (0, 0)))
            windows = windows.reshape(B * n_chunks, half + cs + half, C)
            out = dw(windows)  # (B*n_chunks, cs, C)
            y = out.reshape(B, n_chunks * cs, C)[:, :T]
        else:
            eff = (self.kernel_size - 1) * self.dilation
            if self.causal:
                y = jnp.pad(y, ((0, 0), (eff, 0), (0, 0)))
            else:
                y = jnp.pad(y, ((0, 0), (eff // 2, eff - eff // 2), (0, 0)))
            y = dw(y)
        y = LayerNorm(name="mid_norm")(y)
        y = swish(y)
        y = Conv1d(
            out_channels=self.input_size, kernel_size=1, bias=self.bias,
            name="pw2",
        )(y)
        if train and self.dropout > 0:
            y = nn.Dropout(self.dropout, deterministic=False)(y)
        if mask is not None:
            y = jnp.where(mask[..., None], 0.0, y) if mask.ndim == 2 else y
        return y


class ConformerEncoderLayer(nn.Module):
    """Half-FFN + MHSA + Conv + half-FFN + LN (reference Conformer.py:333)."""

    d_model: int
    d_ffn: int
    nhead: int
    kernel_size: int = 31
    activation: str = "swish"
    bias: bool = True
    dropout: float = 0.0
    causal: bool = False
    attention_type: str = "RelPosMHAXL"

    def setup(self):
        self.norm_ff1 = LayerNorm(name="norm_ff1")
        self.ffn1 = PositionalwiseFeedForward(
            d_ffn=self.d_ffn, dropout=self.dropout, activation=self.activation,
            name="ffn1",
        )
        self.norm_mha = LayerNorm(name="norm_mha")
        self.attn = _make_attention(
            self.attention_type, self.d_model, self.nhead, self.dropout
        )
        self.conv = ConvolutionModule(
            input_size=self.d_model,
            kernel_size=self.kernel_size,
            bias=self.bias,
            causal=self.causal,
            dropout=self.dropout,
            name="conv",
        )
        self.norm_ff2 = LayerNorm(name="norm_ff2")
        self.ffn2 = PositionalwiseFeedForward(
            d_ffn=self.d_ffn, dropout=self.dropout, activation=self.activation,
            name="ffn2",
        )
        self.norm_out = LayerNorm(name="norm_out")

    def __call__(self, x, src_mask=None, src_key_padding_mask=None,
                 pos_embs=None, dynchunktrain_config=None, train=False):
        # first half FFN
        x = x + 0.5 * self.ffn1(self.norm_ff1(x), train=train)
        # MHSA
        y = self.norm_mha(x)
        y, attn_w = self.attn(
            y, y, y, attn_mask=src_mask, key_padding_mask=src_key_padding_mask,
            pos_embs=pos_embs, train=train,
        )
        x = x + y
        # convolution module
        x = x + self.conv(x, dynchunktrain_config=dynchunktrain_config, train=train)
        # second half FFN
        x = x + 0.5 * self.ffn2(self.norm_ff2(x), train=train)
        x = self.norm_out(x)
        return x, attn_w

    def forward_streaming(self, x, context, pos_embs=None):
        """One chunk through this layer with carried state
        (reference Conformer.py:501). Functional: returns (y, new_context).

        ``context`` is a dict pytree with fixed-size buffers:
        mha_cache (B, L_mha, D), mha_len (scalar int32 valid count),
        conv_cache (B, half, D), conv_len (scalar int32).
        Invalid cache rows are masked in attention; for the conv they are
        zeros, which matches the DCConv training convention.
        """
        T = x.shape[1]
        B = x.shape[0]
        L_mha = context["mha_cache"].shape[1]
        half = (self.kernel_size - 1) // 2

        x = x + 0.5 * self.ffn1(self.norm_ff1(x))

        # MHA over [cache | chunk] with invalid cache rows masked
        full = jnp.concatenate([context["mha_cache"], x], axis=1)
        new_mha_cache = full[:, -L_mha:, :] if L_mha > 0 else context["mha_cache"]
        new_mha_len = jnp.minimum(context["mha_len"] + T, L_mha)
        Tk = full.shape[1]
        # position p in `full` is valid iff p >= L_mha - mha_len
        invalid = (
            jnp.arange(Tk)[None, :] < (L_mha - context["mha_len"])[None]
        )
        kpm = jnp.broadcast_to(invalid, (B, Tk))
        y = self.norm_mha(full)
        if pos_embs is None and self.attention_type == "RelPosMHAXL":
            from speechbrain_tpu.nnet.attention import rel_pos_encoding

            pos_embs = rel_pos_encoding(Tk, self.d_model, y.dtype)
        y, _ = self.attn(y, y, y, key_padding_mask=kpm, pos_embs=pos_embs)
        full = full + y
        x = full[:, -T:, :]

        # convolution with carried left frames (zeros at stream start)
        conv_in = jnp.concatenate([context["conv_cache"], x], axis=1)
        new_conv_cache = conv_in[:, -half:, :] if half > 0 else context["conv_cache"]
        y = self.conv(conv_in)
        x = x + y[:, -T:, :]

        x = x + 0.5 * self.ffn2(self.norm_ff2(x))
        x = self.norm_out(x)
        new_context = {
            "mha_cache": new_mha_cache,
            "mha_len": new_mha_len,
            "conv_cache": new_conv_cache,
            "conv_len": jnp.minimum(context["conv_len"] + T, half),
        }
        return x, new_context

    @staticmethod
    def make_layer_streaming_context(batch, d_model, kernel_size,
                                     left_context_size, dtype=jnp.float32):
        half = (kernel_size - 1) // 2
        return {
            "mha_cache": jnp.zeros((batch, left_context_size, d_model), dtype),
            "mha_len": jnp.zeros((), jnp.int32),
            "conv_cache": jnp.zeros((batch, half, d_model), dtype),
            "conv_len": jnp.zeros((), jnp.int32),
        }


class ConformerEncoder(nn.Module):
    """Stack of Conformer layers (reference Conformer.py:606).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> enc = ConformerEncoder(num_layers=2, d_model=32, d_ffn=64, nhead=4)
    >>> from speechbrain_tpu.nnet.attention import RelPosEncXL
    >>> x = jnp.ones((2, 16, 32))
    >>> pe = RelPosEncXL(emb_dim=32)(x)
    >>> p = enc.init(jax.random.PRNGKey(0), x, pos_embs=pe)
    >>> out, attns = enc.apply(p, x, pos_embs=pe)
    >>> out.shape
    (2, 16, 32)
    """

    num_layers: int
    d_model: int
    d_ffn: int
    nhead: int
    kernel_size: int = 31
    activation: str = "swish"
    bias: bool = True
    dropout: float = 0.0
    causal: bool = False
    attention_type: str = "RelPosMHAXL"
    # rematerialize each layer in the backward pass (jax.checkpoint):
    # trades ~1/3 extra FLOPs for O(num_layers)x less activation HBM —
    # the TPU lever for long-sequence / big-batch training
    remat: bool = False

    def setup(self):
        layer_cls = ConformerEncoderLayer
        if self.remat:
            # static: dynchunktrain_config (arg 5) + train (arg 6);
            # arg 0 is the module itself
            layer_cls = nn.remat(
                ConformerEncoderLayer, static_argnums=(5, 6)
            )
        self.layers = [
            layer_cls(
                d_model=self.d_model,
                d_ffn=self.d_ffn,
                nhead=self.nhead,
                kernel_size=self.kernel_size,
                activation=self.activation,
                bias=self.bias,
                dropout=self.dropout,
                causal=self.causal,
                attention_type=self.attention_type,
                name=f"layer_{i}",
            )
            for i in range(self.num_layers)
        ]
        # final output norm after the layer stack (reference
        # Conformer.py:606 builds LayerNorm(d_model, eps=1e-6) and
        # applies it to the stack output — required for checkpoint parity)
        self.norm = LayerNorm(eps=1e-6, name="norm")

    def __call__(self, src, src_mask=None, src_key_padding_mask=None,
                 pos_embs=None, dynchunktrain_config=None, train=False):
        output = src
        attns = []
        for layer in self.layers:
            output, attn = layer(
                output, src_mask, src_key_padding_mask, pos_embs,
                dynchunktrain_config, train,
            )
            attns.append(attn)
        output = self.norm(output)
        return output, attns

    # -- streaming ----------------------------------------------------------
    def forward_streaming(self, src, context, pos_embs=None):
        """One chunk through the whole encoder; returns (out, new_context).
        ``context`` is {"layers": [per-layer dicts]}
        (reference Conformer.py:780)."""
        output = src
        new_layers = []
        for i, layer in enumerate(self.layers):
            output, layer_ctx = layer.forward_streaming(
                output, context["layers"][i], pos_embs
            )
            new_layers.append(layer_ctx)
        output = self.norm(output)
        return output, {"layers": new_layers}

    def make_streaming_context(self, batch, left_context_size, dtype=jnp.float32):
        """Blank streaming state (reference Conformer.py:827), functional."""
        return {
            "layers": [
                ConformerEncoderLayer.make_layer_streaming_context(
                    batch, self.d_model, self.kernel_size, left_context_size,
                    dtype,
                )
                for _ in range(self.num_layers)
            ]
        }


class ConformerDecoder(nn.Module):
    """Conformer-style decoder (reference Conformer.py:1019) — rarely used;
    provided for parity. Standard transformer decoder layers with conv."""

    num_layers: int
    d_model: int
    d_ffn: int
    nhead: int
    kernel_size: int = 3
    dropout: float = 0.0
    activation: str = "swish"
    attention_type: str = "regularMHA"

    @nn.compact
    def __call__(self, tgt, memory, tgt_mask=None, memory_mask=None,
                 tgt_key_padding_mask=None, memory_key_padding_mask=None,
                 pos_embs_tgt=None, pos_embs_src=None, train=False):
        from speechbrain_tpu.lobes.models.transformer.Transformer import (
            TransformerDecoder,
        )

        return TransformerDecoder(
            num_layers=self.num_layers,
            nhead=self.nhead,
            d_ffn=self.d_ffn,
            d_model=self.d_model,
            dropout=self.dropout,
            activation=self.activation,
            attention_type=self.attention_type,
            name="dec",
        )(
            tgt, memory, tgt_mask, memory_mask, tgt_key_padding_mask,
            memory_key_padding_mask, pos_embs_tgt, pos_embs_src, train,
        )
