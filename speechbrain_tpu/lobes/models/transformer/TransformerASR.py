"""Encoder-decoder Transformer/Conformer ASR wrapper.

Capability parity with the reference's
``speechbrain/lobes/models/transformer/TransformerASR.py`` (TransformerASR
:326 with forward/encode/decode, make_transformer_src_tgt_masks :106,
encode_streaming :546, EncoderWrapper :678): joins an input projection,
a Transformer/Conformer/Branchformer encoder and a Transformer decoder,
building all padding/causal/chunked masks from relative lengths.
"""

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from speechbrain_tpu.lobes.models.transformer.Conformer import (
    ConformerEncoder,
    make_chunked_attention_mask,
)
from speechbrain_tpu.lobes.models.transformer.Transformer import (
    NormalizedEmbedding,
    PositionalEncoding,
    TransformerDecoder,
    TransformerEncoder,
    get_key_padding_mask,
    get_lookahead_mask,
)
from speechbrain_tpu.nnet.attention import RelPosEncXL
from speechbrain_tpu.nnet.linear import Linear


def make_transformer_src_mask(src, dynchunktrain_config=None):
    """(T, T) bool attention mask for the encoder: None for full context,
    chunked for dynamic-chunk training (reference TransformerASR.py:47)."""
    if dynchunktrain_config is None:
        return None
    return make_chunked_attention_mask(
        src.shape[1],
        dynchunktrain_config.chunk_size,
        dynchunktrain_config.left_context_size,
    )


def make_transformer_src_tgt_masks(src, tgt=None, wav_len=None, pad_idx=0,
                                   dynchunktrain_config=None):
    """All four masks used by forward (reference TransformerASR.py:106)."""
    src_key_padding_mask = None
    if wav_len is not None:
        src_key_padding_mask = get_key_padding_mask(wav_len, src.shape[1])
    src_mask = make_transformer_src_mask(src, dynchunktrain_config)
    tgt_key_padding_mask = None
    tgt_mask = None
    if tgt is not None:
        tgt_key_padding_mask = tgt == pad_idx
        tgt_mask = get_lookahead_mask(tgt.shape[1])
    return src_key_padding_mask, tgt_key_padding_mask, src_mask, tgt_mask


class TransformerASR(nn.Module):
    """Encoder-decoder ASR transformer (reference TransformerASR.py:326).

    Inputs: src (B, T, F) features (or (B,T,F,C), flattened), tgt (B, U)
    token ids. ``__call__`` returns (encoder_out, decoder_out);
    ``encode``/``decode`` run the halves separately (for CTC-only or beam
    search).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> net = TransformerASR(tgt_vocab=40, input_size=40, d_model=32,
    ...     nhead=4, num_encoder_layers=2, num_decoder_layers=1, d_ffn=64)
    >>> src = jnp.ones((2, 16, 40)); tgt = jnp.ones((2, 5), dtype=jnp.int32)
    >>> v = net.init(jax.random.PRNGKey(0), src, tgt)
    >>> enc, dec = net.apply(v, src, tgt)
    >>> enc.shape, dec.shape
    ((2, 16, 32), (2, 5, 32))
    """

    tgt_vocab: int
    input_size: int
    d_model: int = 512
    nhead: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    d_ffn: int = 2048
    dropout: float = 0.1
    activation: str = "relu"
    positional_encoding: str = "fixed_abs_sine"
    normalize_before: bool = False
    kernel_size: int = 31
    bias: bool = True
    encoder_module: str = "transformer"  # "transformer" | "conformer"
    attention_type: str = "regularMHA"
    max_length: int = 2500
    causal: bool = False
    encoder_remat: bool = False  # rematerialize encoder layers (training)

    def setup(self):
        self.custom_src_module = Linear(self.d_model, name="src_proj")
        self.custom_tgt_module = NormalizedEmbedding(
            d_model=self.d_model, vocab=self.tgt_vocab, name="tgt_emb"
        )
        if self.attention_type == "RelPosMHAXL":
            self.pos_enc = RelPosEncXL(emb_dim=self.d_model)
        elif self.positional_encoding == "fixed_abs_sine":
            self.pos_enc = PositionalEncoding(
                input_size=self.d_model, max_len=self.max_length
            )
        else:
            self.pos_enc = None
        if self.encoder_module == "conformer":
            self.encoder = ConformerEncoder(
                num_layers=self.num_encoder_layers,
                d_model=self.d_model,
                d_ffn=self.d_ffn,
                nhead=self.nhead,
                kernel_size=self.kernel_size,
                bias=self.bias,
                dropout=self.dropout,
                causal=self.causal,
                attention_type=self.attention_type,
                remat=self.encoder_remat,
                name="encoder",
            )
        elif self.encoder_module == "branchformer":
            from speechbrain_tpu.lobes.models.Branchformer import (
                BranchformerEncoder,
            )

            self.encoder = BranchformerEncoder(
                num_layers=self.num_encoder_layers,
                d_model=self.d_model,
                nhead=self.nhead,
                kernel_size=self.kernel_size,
                attention_type=self.attention_type,
                csgu_linear_units=self.d_ffn,
                dropout=self.dropout,
                name="encoder",
            )
        else:
            self.encoder = TransformerEncoder(
                num_layers=self.num_encoder_layers,
                nhead=self.nhead,
                d_ffn=self.d_ffn,
                d_model=self.d_model,
                dropout=self.dropout,
                activation=self.activation,
                normalize_before=self.normalize_before,
                attention_type=self.attention_type,
                remat=self.encoder_remat,
                name="encoder",
            )
        if self.num_decoder_layers > 0:
            self.decoder = TransformerDecoder(
                num_layers=self.num_decoder_layers,
                nhead=self.nhead,
                d_ffn=self.d_ffn,
                d_model=self.d_model,
                dropout=self.dropout,
                activation=self.activation,
                normalize_before=self.normalize_before,
                attention_type="regularMHA",
                name="decoder",
            )
        # decoder uses absolute positions even with RelPos encoder
        self.pos_enc_dec = PositionalEncoding(
            input_size=self.d_model, max_len=self.max_length, name="pos_dec"
        )

    def _embed_src(self, src):
        if src.ndim == 4:
            B, T, F, C = src.shape
            src = src.reshape(B, T, F * C)
        src = self.custom_src_module(src)
        pos_embs = None
        if self.attention_type == "RelPosMHAXL":
            pos_embs = self.pos_enc(src)
        elif self.pos_enc is not None:
            src = src + self.pos_enc(src)
        return src, pos_embs

    def encode(self, src, wav_len=None, pad_idx=0, dynchunktrain_config=None,
               train=False):
        """Encoder half (reference :427)."""
        src, pos_embs = self._embed_src(src)
        src_key_padding_mask, _, src_mask, _ = make_transformer_src_tgt_masks(
            src, None, wav_len, pad_idx, dynchunktrain_config
        )
        enc_out, _ = self.encoder(
            src,
            src_key_padding_mask=src_key_padding_mask,
            pos_embs=pos_embs,
            **(
                {"dynchunktrain_config": dynchunktrain_config}
                if self.encoder_module == "conformer"
                else {}
            ),
            # branchformer layers have no src_mask surface (full-context)
            **(
                {} if self.encoder_module == "branchformer"
                else {"src_mask": src_mask}
            ),
            train=train,
        )
        return enc_out

    def make_streaming_context(self, batch, dynchunktrain_config, dtype=jnp.float32):
        """Blank streaming state for encode_streaming
        (reference TransformerASR.py:645): per-layer MHA left context of
        ``left_context_size * chunk_size`` frames + conv caches.

        Uses only static config, so it is callable on the unbound module.
        """
        from speechbrain_tpu.lobes.models.transformer.Conformer import (
            ConformerEncoderLayer,
        )

        left = dynchunktrain_config.left_context_size_frames() or 0
        return {
            "encoder": {
                "layers": [
                    ConformerEncoderLayer.make_layer_streaming_context(
                        batch, self.d_model, self.kernel_size, left, dtype
                    )
                    for _ in range(self.num_encoder_layers)
                ]
            }
        }

    def encode_streaming(self, src, context):
        """Encode one chunk with carried state; returns (enc, new_context)
        (reference TransformerASR.py:546). Conformer encoders only."""
        src, pos_embs = self._embed_src(src)
        enc_out, enc_ctx = self.encoder.forward_streaming(
            src, context["encoder"], pos_embs=None
        )
        return enc_out, {**context, "encoder": enc_ctx}

    def decode(self, tgt, encoder_out, enc_len=None, train=False):
        """Decoder half for beam search (reference :475): returns
        (decoder_out, cross_attn of last layer)."""
        tgt_mask = get_lookahead_mask(tgt.shape[1])
        memory_key_padding_mask = None
        if enc_len is not None:
            memory_key_padding_mask = get_key_padding_mask(
                enc_len, encoder_out.shape[1]
            )
        emb = self.custom_tgt_module(tgt)
        emb = emb + self.pos_enc_dec(emb)
        out, self_attns, cross_attns = self.decoder(
            emb, encoder_out, tgt_mask=tgt_mask,
            memory_key_padding_mask=memory_key_padding_mask, train=train,
        )
        return out, cross_attns[-1]

    def init_decoder_cache(self, batch_size, max_len, dtype=jnp.float32):
        """Explicit per-layer KV buffers for incremental decoding
        (decode_step); call via apply(..., method="init_decoder_cache")."""
        return self.decoder.init_cache(batch_size, max_len, dtype)

    def init_decoder_cache_with_cross(self, encoder_out, max_len,
                                      self_batch=None, dtype=jnp.float32):
        """Decode cache with the cross-attention K/V of every layer
        PRECOMPUTED from the encoder states: decode_step then skips the
        per-step re-projection of the (static) memory — 2 x layers x
        d_model^2 x enc_T FLOPs saved per generated token (the standard
        encoder-decoder serving optimization).

        For beam search, pass the UNINFLATED encoder states with
        ``self_batch=batch*beam``: the cross K/V stay one-per-utterance
        (the attention broadcasts them over the beams) while the
        per-hypothesis self K/V buffers are allocated at batch*beam —
        at beam 66 this avoids gigabytes of replicated encoder K/V."""
        cross = self.decoder(
            None, encoder_out, cache="precompute_cross_kv"
        )
        cache = self.decoder.init_cache(
            self_batch or encoder_out.shape[0], max_len, dtype
        )
        return [
            {"self": c["self"], "cross": x}
            for c, x in zip(cache, cross)
        ]

    def decode_step(self, tgt_tokens, encoder_out, cache, step, enc_len=None,
                    anc=None):
        """KV-cached decode of ONE token: tgt_tokens (B,) int32 just
        consumed -> (decoder out (B, D), new_cache, last cross-attn).
        O(enc_T + step) work per step vs the full-buffer decode's
        O(L * (enc_T + L)) — the serving-speed path for beam search."""
        import jax

        emb = self.custom_tgt_module(tgt_tokens[:, None])  # (B, 1, D)
        L = cache[0]["self"]["k"].shape[1]
        pe = self.pos_enc_dec(jnp.zeros((1, L, emb.shape[-1]), emb.dtype))
        emb = emb + jax.lax.dynamic_slice_in_dim(pe, step, 1, axis=1)
        memory_key_padding_mask = None
        if enc_len is not None:
            memory_key_padding_mask = get_key_padding_mask(
                enc_len, encoder_out.shape[1]
            )
        out, new_cache, cross_attns = self.decoder(
            emb, encoder_out,
            memory_key_padding_mask=memory_key_padding_mask,
            cache=cache, cache_index=step, anc=anc,
        )
        return out[:, 0], new_cache, cross_attns[-1]

    def __call__(self, src, tgt, wav_len=None, pad_idx=0,
                 dynchunktrain_config=None, train=False):
        src_proj, pos_embs = self._embed_src(src)
        (
            src_key_padding_mask,
            tgt_key_padding_mask,
            src_mask,
            tgt_mask,
        ) = make_transformer_src_tgt_masks(
            src_proj, tgt, wav_len, pad_idx, dynchunktrain_config
        )
        enc_out, _ = self.encoder(
            src_proj,
            src_key_padding_mask=src_key_padding_mask,
            pos_embs=pos_embs,
            **(
                {"dynchunktrain_config": dynchunktrain_config}
                if self.encoder_module == "conformer"
                else {}
            ),
            **(
                {} if self.encoder_module == "branchformer"
                else {"src_mask": src_mask}
            ),
            train=train,
        )
        if self.num_decoder_layers == 0 or tgt is None:
            return enc_out, None
        emb = self.custom_tgt_module(tgt)
        emb = emb + self.pos_enc_dec(emb)
        dec_out, _, _ = self.decoder(
            emb,
            enc_out,
            tgt_mask=tgt_mask,
            tgt_key_padding_mask=tgt_key_padding_mask,
            memory_key_padding_mask=src_key_padding_mask,
            train=train,
        )
        return enc_out, dec_out


class EncoderWrapper(nn.Module):
    """Expose only the encoder of a TransformerASR as (x, lengths) -> enc
    (reference TransformerASR.py:678), for CTC-only training."""

    transformer: TransformerASR

    @nn.compact
    def __call__(self, x, lengths=None, train=False, dynchunktrain_config=None):
        return self.transformer.encode(
            x, lengths, dynchunktrain_config=dynchunktrain_config, train=train
        )
