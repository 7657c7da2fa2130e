"""G2P seq2seq models.

Capability parity with the reference's
``speechbrain/lobes/models/g2p/model.py`` (AttentionSeq2Seq :582,
TransformerG2P): grapheme embedding -> encoder -> attentional decoder ->
phoneme logits. Reuses the toolkit's RNN/Transformer stacks.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from speechbrain_tpu.nnet.embedding import Embedding
from speechbrain_tpu.nnet.linear import Linear
from speechbrain_tpu.nnet.RNN import LSTM, AttentionalRNNDecoder


class AttentionSeq2Seq(nn.Module):
    """RNN G2P: (graphemes, phoneme-prefix) -> phoneme log-probs.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> net = AttentionSeq2Seq(num_graphemes=30, num_phonemes=40,
    ...     emb_dim=16, enc_neurons=16, dec_neurons=16)
    >>> g = jnp.ones((2, 8), dtype=jnp.int32)
    >>> p = jnp.ones((2, 5), dtype=jnp.int32)
    >>> v = net.init(jax.random.PRNGKey(0), g, jnp.ones(2), p)
    >>> out = net.apply(v, g, jnp.ones(2), p)
    >>> out.shape
    (2, 5, 40)
    """

    num_graphemes: int
    num_phonemes: int
    emb_dim: int = 128
    enc_neurons: int = 256
    dec_neurons: int = 256
    enc_layers: int = 2

    @nn.compact
    def __call__(self, grapheme_encoded, grapheme_lens, phn_encoded, train=False):
        g_emb = Embedding(
            num_embeddings=self.num_graphemes, embedding_dim=self.emb_dim,
            name="grapheme_emb",
        )(grapheme_encoded)
        enc, _ = LSTM(
            hidden_size=self.enc_neurons,
            num_layers=self.enc_layers,
            bidirectional=True,
            name="encoder",
        )(g_emb, train=train)
        p_emb = Embedding(
            num_embeddings=self.num_phonemes, embedding_dim=self.emb_dim,
            name="phoneme_emb",
        )(phn_encoded)
        dec_out, attn = AttentionalRNNDecoder(
            hidden_size=self.dec_neurons,
            attn_dim=self.dec_neurons,
            attn_type="content",
            name="decoder",
        )(p_emb, enc, grapheme_lens)
        logits = Linear(self.num_phonemes, name="out")(dec_out)
        return jax.nn.log_softmax(logits, axis=-1)


class TransformerG2P(nn.Module):
    """Transformer G2P (reference g2p/model.py TransformerG2P)."""

    num_graphemes: int
    num_phonemes: int
    d_model: int = 256
    nhead: int = 4
    num_encoder_layers: int = 4
    num_decoder_layers: int = 4
    d_ffn: int = 1024

    @nn.compact
    def __call__(self, grapheme_encoded, grapheme_lens, phn_encoded, train=False):
        from speechbrain_tpu.lobes.models.transformer.Transformer import (
            NormalizedEmbedding,
            PositionalEncoding,
            TransformerDecoder,
            TransformerEncoder,
            get_key_padding_mask,
            get_lookahead_mask,
        )

        src = NormalizedEmbedding(
            d_model=self.d_model, vocab=self.num_graphemes, name="g_emb"
        )(grapheme_encoded)
        src = src + PositionalEncoding(input_size=self.d_model, name="pos_e")(src)
        kpm = get_key_padding_mask(grapheme_lens, src.shape[1])
        enc, _ = TransformerEncoder(
            num_layers=self.num_encoder_layers, nhead=self.nhead,
            d_ffn=self.d_ffn, d_model=self.d_model, name="encoder",
        )(src, src_key_padding_mask=kpm, train=train)
        tgt = NormalizedEmbedding(
            d_model=self.d_model, vocab=self.num_phonemes, name="p_emb"
        )(phn_encoded)
        tgt = tgt + PositionalEncoding(input_size=self.d_model, name="pos_d")(tgt)
        dec, _, _ = TransformerDecoder(
            num_layers=self.num_decoder_layers, nhead=self.nhead,
            d_ffn=self.d_ffn, d_model=self.d_model, name="decoder",
        )(tgt, enc, tgt_mask=get_lookahead_mask(tgt.shape[1]),
          memory_key_padding_mask=kpm, train=train)
        from speechbrain_tpu.nnet.linear import Linear as _Linear

        logits = _Linear(self.num_phonemes, name="out")(dec)
        import jax as _jax

        return _jax.nn.log_softmax(logits, axis=-1)
