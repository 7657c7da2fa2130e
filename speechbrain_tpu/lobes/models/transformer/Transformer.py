"""Transformer encoder/decoder core.

Capability parity with the reference's
``speechbrain/lobes/models/transformer/Transformer.py`` (TransformerInterface
:24, PositionalEncoding :252, TransformerEncoder(Layer) :306/:472,
TransformerDecoder(Layer) :630/:843, NormalizedEmbedding :966,
get_key_padding_mask, get_lookahead_mask), TPU-first: masks are static
additive biases; attention cores are the MXU programs in nnet.attention.
"""

import math

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
from speechbrain_tpu.nnet.normalization import LayerNorm


def get_lookahead_mask(T):
    """Causal (True = masked) (T, T) bool mask
    (reference Transformer.py: get_lookahead_mask)."""
    return np.triu(np.ones((T, T), dtype=bool), k=1)


def get_key_padding_mask(padded_input_len, max_len):
    """(B, T) bool mask, True at padded positions, from relative lengths."""
    lens = jnp.round(jnp.asarray(padded_input_len) * max_len).astype(jnp.int32)
    return jnp.arange(max_len)[None, :] >= lens[:, None]


class PositionalEncoding(nn.Module):
    """Absolute sinusoidal positional encoding (reference :252).

    Example
    -------
    >>> import jax.numpy as jnp
    >>> pe = PositionalEncoding(input_size=16)
    >>> pe.apply({}, jnp.zeros((2, 10, 16))).shape
    (1, 10, 16)
    """

    input_size: int
    max_len: int = 2500

    @nn.compact
    def __call__(self, x):
        T = x.shape[1]
        pe = np.zeros((self.max_len, self.input_size), dtype=np.float32)
        positions = np.arange(self.max_len, dtype=np.float32)[:, None]
        denom = np.exp(
            np.arange(0, self.input_size, 2, dtype=np.float32)
            * -(math.log(10000.0) / self.input_size)
        )
        pe[:, 0::2] = np.sin(positions * denom)
        pe[:, 1::2] = np.cos(positions * denom)
        return jnp.asarray(pe[None, :T], dtype=x.dtype)


class NormalizedEmbedding(nn.Module):
    """Embedding scaled by sqrt(d_model) (reference :966)."""

    d_model: int
    vocab: int

    @nn.compact
    def __call__(self, x):
        from speechbrain_tpu.nnet.embedding import Embedding

        emb = Embedding(num_embeddings=self.vocab, embedding_dim=self.d_model,
                        name="emb")(x)
        return emb * math.sqrt(self.d_model)


def _make_attention(attention_type, d_model, nhead, dropout):
    if attention_type == "regularMHA":
        return MultiheadAttention(nhead=nhead, d_model=d_model, dropout=dropout)
    if attention_type == "RelPosMHAXL":
        return RelPosMHAXL(embed_dim=d_model, num_heads=nhead, dropout=dropout)
    if attention_type == "RoPEMHA":
        return RoPEMHA(nhead=nhead, d_model=d_model, dropout=dropout)
    if attention_type == "hypermixing":
        # token mixing replaces attention (reference Transformer.py:380,
        # the HyperConformer/HyperBranchformer configs)
        from speechbrain_tpu.nnet.hypermixing import HyperMixing

        return HyperMixing(
            input_output_dim=d_model,
            hypernet_size=d_model * 4,
            num_heads=nhead,
            tied=False,
        )
    raise ValueError(f"Unknown attention_type {attention_type}")


class TransformerEncoderLayer(nn.Module):
    """Self-attention + FFN with pre/post-norm (reference :472).

    ``ffn_type="1dcnn"`` replaces the linear FFN with two 1-D convs of
    kernel sizes ``ffn_cnn_kernel_size_list`` (reference :402-418, used
    by FastSpeech2's FFT blocks)."""

    d_ffn: int
    nhead: int
    d_model: int
    dropout: float = 0.0
    activation: str = "relu"
    normalize_before: bool = False
    attention_type: str = "regularMHA"
    ffn_type: str = "regularFFN"
    ffn_cnn_kernel_size_list: tuple = (3, 3)

    @nn.compact
    def __call__(self, src, src_mask=None, src_key_padding_mask=None,
                 pos_embs=None, train=False, cache=None, cache_index=None,
                 anc=None):
        """Full-sequence encode, or KV-cached incremental decode of ONE
        position when ``cache`` ({"self": {"k","v"}}) is given (causal
        decoder-only stacks, e.g. TransformerLM shallow fusion): src is
        (B, 1, D), the step's K/V are written at cache_index, and
        self-attention runs over the cached prefix — O(L) per step.
        Returns (out, new_cache) in cache mode."""
        attn = _make_attention(self.attention_type, self.d_model, self.nhead, self.dropout)
        if self.normalize_before:
            src1 = LayerNorm(name="norm1")(src)
        else:
            src1 = src
        new_cache = None
        if cache is not None:
            out, attn_w, self_cache = attn(
                src1, src1, src1, cache=cache["self"],
                cache_index=cache_index, anc=anc,
            )
            new_cache = {"self": self_cache}
        else:
            out, attn_w = attn(
                src1, src1, src1, attn_mask=src_mask,
                key_padding_mask=src_key_padding_mask, pos_embs=pos_embs,
                train=train,
            )
        if train and self.dropout > 0:
            out = nn.Dropout(self.dropout, deterministic=False)(out)
        src = src + out
        if not self.normalize_before:
            src = LayerNorm(name="norm1")(src)
        if self.normalize_before:
            src1 = LayerNorm(name="norm2")(src)
        else:
            src1 = src
        if self.ffn_type == "1dcnn":
            from speechbrain_tpu.nnet.CNN import Conv1d

            out = Conv1d(
                self.d_ffn, self.ffn_cnn_kernel_size_list[0],
                name="ffn_conv1",
            )(src1)
            out = jax.nn.relu(out)
            out = Conv1d(
                self.d_model, self.ffn_cnn_kernel_size_list[1],
                name="ffn_conv2",
            )(out)
        else:
            out = PositionalwiseFeedForward(
                d_ffn=self.d_ffn, dropout=self.dropout,
                activation=self.activation, name="ffn",
            )(src1, train=train)
        if train and self.dropout > 0:
            out = nn.Dropout(self.dropout, deterministic=False)(out)
        src = src + out
        if not self.normalize_before:
            src = LayerNorm(name="norm2")(src)
        if cache is not None:
            return src, new_cache
        return src, attn_w


class TransformerEncoder(nn.Module):
    """Stack of encoder layers (reference :306).

    ``remat=True`` rematerializes each layer's activations in the
    backward pass (jax.checkpoint): forward activations are not kept in
    HBM across the stack, trading ~1/3 extra FLOPs for O(num_layers)x
    less activation memory — the standard TPU lever for training long
    sequences / big batches (no reference analogue; torch's is
    torch.utils.checkpoint, which the reference does not use)."""

    num_layers: int
    nhead: int
    d_ffn: int
    d_model: int
    dropout: float = 0.0
    activation: str = "relu"
    normalize_before: bool = False
    attention_type: str = "regularMHA"
    layerdrop_prob: float = 0.0
    remat: bool = False
    ffn_type: str = "regularFFN"
    ffn_cnn_kernel_size_list: tuple = (3, 3)

    @nn.compact
    def __call__(self, src, src_mask=None, src_key_padding_mask=None,
                 pos_embs=None, train=False, cache=None, cache_index=None,
                 anc=None):
        output = src
        attns = []
        new_cache = [] if cache is not None else None
        layer_cls = TransformerEncoderLayer
        if self.remat:
            layer_cls = nn.remat(
                TransformerEncoderLayer, static_argnums=(5,)
            )
        for i in range(self.num_layers):
            layer = layer_cls(
                d_ffn=self.d_ffn,
                nhead=self.nhead,
                d_model=self.d_model,
                dropout=self.dropout,
                activation=self.activation,
                normalize_before=self.normalize_before,
                attention_type=self.attention_type,
                ffn_type=self.ffn_type,
                ffn_cnn_kernel_size_list=self.ffn_cnn_kernel_size_list,
                name=f"layer_{i}",
            )
            if cache is not None:
                output, lc = layer(
                    output, cache=cache[i], cache_index=cache_index,
                    anc=anc,
                )
                new_cache.append(lc)
            else:
                output, attn = layer(
                    output, src_mask, src_key_padding_mask, pos_embs, train
                )
                attns.append(attn)
        # the reference applies the final eps-1e-6 norm UNCONDITIONALLY
        # (ref Transformer.py:104,169) — not only for pre-norm stacks
        output = LayerNorm(eps=1e-6, name="norm")(output)
        if cache is not None:
            return output, new_cache
        return output, attns

    def init_cache(self, batch_size, max_len, dtype=jnp.float32):
        """Explicit KV cache pytree for incremental (causal) decoding:
        one {"self": {"k", "v"}} buffer of (B, max_len, d_model) per
        layer — the decoder-only/LM serving path. Heads stay MERGED in
        the stored layout: the decode step reads the buffers with fused
        per-head views, and the ancestry beam-attention kernel requires
        the lane dimension to be the full model width. ``max_len`` is
        rounded up to the kernel's 32-frame time tile so the serving
        path never pads (a pad would COPY the multi-GB buffers every
        decode step); the extra positions sit beyond the causal mask."""
        max_len = -(-max_len // 32) * 32
        return [
            {
                "self": {
                    "k": jnp.zeros(
                        (batch_size, max_len, self.d_model), dtype
                    ),
                    "v": jnp.zeros(
                        (batch_size, max_len, self.d_model), dtype
                    ),
                }
            }
            for _ in range(self.num_layers)
        ]


class TransformerDecoderLayer(nn.Module):
    """Causal self-attn + cross-attn + FFN (reference :843)."""

    d_ffn: int
    nhead: int
    d_model: int
    dropout: float = 0.0
    activation: str = "relu"
    normalize_before: bool = False
    attention_type: str = "regularMHA"

    @nn.compact
    def __call__(self, tgt, memory, tgt_mask=None, memory_mask=None,
                 tgt_key_padding_mask=None, memory_key_padding_mask=None,
                 pos_embs_tgt=None, pos_embs_src=None, train=False,
                 cache=None, cache_index=None, anc=None):
        """Full-sequence decode, or KV-cached incremental decode of ONE
        position when ``cache`` ({"self": {"k","v"}}) is given: tgt is
        (B, 1, D), the step's projected K/V are written at cache_index,
        and self-attention runs over the cached prefix — O(L) per step.
        Returns (out, new_cache, cross_w) in cache mode."""
        cross_attn = MultiheadAttention(
            nhead=self.nhead, d_model=self.d_model, dropout=self.dropout,
            name="cross_attn",
        )
        if cache is not None and cache == "precompute_cross_kv":
            # serving path: project the (static) encoder memory's K/V
            # ONCE; decode steps then reuse them via cache["cross"]
            return cross_attn(memory, memory, memory, return_kv_only=True)
        self_attn = _make_attention(
            self.attention_type, self.d_model, self.nhead, self.dropout
        )
        if self.normalize_before:
            tgt1 = LayerNorm(name="norm1")(tgt)
        else:
            tgt1 = tgt
        new_cache = None
        if cache is not None:
            out, self_w, self_cache = self_attn(
                tgt1, tgt1, tgt1, cache=cache["self"],
                cache_index=cache_index, anc=anc,
            )
            new_cache = {"self": self_cache}
            if "cross" in cache:
                new_cache["cross"] = cache["cross"]
        else:
            out, self_w = self_attn(
                tgt1, tgt1, tgt1, attn_mask=tgt_mask,
                key_padding_mask=tgt_key_padding_mask, pos_embs=pos_embs_tgt,
                train=train,
            )
        tgt = tgt + out
        if not self.normalize_before:
            tgt = LayerNorm(name="norm1")(tgt)
        if self.normalize_before:
            tgt1 = LayerNorm(name="norm2")(tgt)
        else:
            tgt1 = tgt
        if cache is not None and cache.get("cross") is not None:
            out, cross_w = cross_attn(
                tgt1, memory, memory, attn_mask=memory_mask,
                key_padding_mask=memory_key_padding_mask,
                precomputed_kv=cache["cross"],
            )
        else:
            out, cross_w = cross_attn(
                tgt1, memory, memory, attn_mask=memory_mask,
                key_padding_mask=memory_key_padding_mask,
                pos_embs=pos_embs_src, train=train,
            )
        tgt = tgt + out
        if not self.normalize_before:
            tgt = LayerNorm(name="norm2")(tgt)
        if self.normalize_before:
            tgt1 = LayerNorm(name="norm3")(tgt)
        else:
            tgt1 = tgt
        out = PositionalwiseFeedForward(
            d_ffn=self.d_ffn, dropout=self.dropout, activation=self.activation,
            name="ffn",
        )(tgt1, train=train)
        tgt = tgt + out
        if not self.normalize_before:
            tgt = LayerNorm(name="norm3")(tgt)
        if cache is not None:
            return tgt, new_cache, cross_w
        return tgt, self_w, cross_w


class TransformerDecoder(nn.Module):
    """Stack of decoder layers (reference :630)."""

    num_layers: int
    nhead: int
    d_ffn: int
    d_model: int
    dropout: float = 0.0
    activation: str = "relu"
    normalize_before: bool = False
    attention_type: str = "regularMHA"

    @nn.compact
    def __call__(self, tgt, memory, tgt_mask=None, memory_mask=None,
                 tgt_key_padding_mask=None, memory_key_padding_mask=None,
                 pos_embs_tgt=None, pos_embs_src=None, train=False,
                 cache=None, cache_index=None, anc=None):
        output = tgt
        self_attns, cross_attns = [], []
        new_cache = [] if cache is not None else None
        for i in range(self.num_layers):
            layer = TransformerDecoderLayer(
                d_ffn=self.d_ffn,
                nhead=self.nhead,
                d_model=self.d_model,
                dropout=self.dropout,
                activation=self.activation,
                normalize_before=self.normalize_before,
                attention_type=self.attention_type,
                name=f"layer_{i}",
            )
            if cache == "precompute_cross_kv":
                new_cache.append(
                    layer(None, memory, cache="precompute_cross_kv")
                )
                continue
            if cache is not None:
                output, lc, ca = layer(
                    output, memory,
                    memory_key_padding_mask=memory_key_padding_mask,
                    cache=cache[i], cache_index=cache_index, anc=anc,
                )
                new_cache.append(lc)
                sa = None
            else:
                output, sa, ca = layer(
                    output, memory, tgt_mask, memory_mask,
                    tgt_key_padding_mask, memory_key_padding_mask,
                    pos_embs_tgt, pos_embs_src, train,
                )
            self_attns.append(sa)
            cross_attns.append(ca)
        if cache == "precompute_cross_kv":
            return new_cache  # one {"k", "v"} per layer
        # unconditional final norm, matching the reference (:71,:119)
        output = LayerNorm(eps=1e-6, name="norm")(output)
        if cache is not None:
            return output, new_cache, cross_attns
        return output, self_attns, cross_attns

    def init_cache(self, batch_size, max_len, dtype=jnp.float32):
        """Explicit KV cache pytree for incremental decoding: one
        {"self": {"k", "v"}} buffer of (B, max_len, d_model) per layer
        (heads merged, time rounded to the 32-frame kernel tile — see
        TransformerEncoder.init_cache)."""
        max_len = -(-max_len // 32) * 32
        return [
            {
                "self": {
                    "k": jnp.zeros(
                        (batch_size, max_len, self.d_model), dtype
                    ),
                    "v": jnp.zeros(
                        (batch_size, max_len, self.d_model), dtype
                    ),
                }
            }
            for _ in range(self.num_layers)
        ]
