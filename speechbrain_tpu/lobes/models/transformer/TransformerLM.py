"""Decoder-only Transformer language model.

Capability parity with the reference's
``speechbrain/lobes/models/transformer/TransformerLM.py`` (TransformerLM):
token embedding + causal self-attention encoder stack + output head,
returning log-probabilities for shallow fusion / rescoring.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from speechbrain_tpu.lobes.models.transformer.Transformer import (
    NormalizedEmbedding,
    PositionalEncoding,
    TransformerEncoder,
    get_lookahead_mask,
)
from speechbrain_tpu.nnet.linear import Linear


class TransformerLM(nn.Module):
    """Causal transformer LM: (B, U) ids -> (B, U, vocab) logits.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> lm = TransformerLM(vocab=100, d_model=32, nhead=4, num_encoder_layers=2, d_ffn=64)
    >>> x = jnp.ones((2, 7), dtype=jnp.int32)
    >>> v = lm.init(jax.random.PRNGKey(0), x)
    >>> lm.apply(v, x).shape
    (2, 7, 100)
    """

    vocab: int
    d_model: int = 768
    nhead: int = 12
    num_encoder_layers: int = 12
    d_ffn: int = 3072
    dropout: float = 0.0
    activation: str = "gelu"
    normalize_before: bool = False
    d_embedding: int = None
    attention_type: str = "regularMHA"

    @nn.compact
    def __call__(self, x, hx=None, train=False):
        emb_dim = self.d_embedding or self.d_model
        emb = NormalizedEmbedding(d_model=emb_dim, vocab=self.vocab, name="emb")(x)
        if emb_dim != self.d_model:
            emb = Linear(self.d_model, name="emb_proj")(emb)
        emb = emb + PositionalEncoding(input_size=self.d_model, name="pos")(emb)
        mask = get_lookahead_mask(x.shape[1])
        out, _ = TransformerEncoder(
            num_layers=self.num_encoder_layers,
            nhead=self.nhead,
            d_ffn=self.d_ffn,
            d_model=self.d_model,
            dropout=self.dropout,
            activation=self.activation,
            normalize_before=self.normalize_before,
            attention_type=self.attention_type,
            name="encoder",
        )(emb, src_mask=mask, train=train)
        logits = Linear(self.vocab, name="out")(out)
        return logits
