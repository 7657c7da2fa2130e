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

    def setup(self):
        emb_dim = self.d_embedding or self.d_model
        self.emb = NormalizedEmbedding(
            d_model=emb_dim, vocab=self.vocab, name="emb"
        )
        self.emb_proj = (
            Linear(self.d_model, name="emb_proj")
            if emb_dim != self.d_model else None
        )
        self.pos = PositionalEncoding(input_size=self.d_model, name="pos")
        self.encoder = TransformerEncoder(
            num_layers=self.num_encoder_layers,
            nhead=self.nhead,
            d_ffn=self.d_ffn,
            d_model=self.d_model,
            dropout=self.dropout,
            activation=self.activation,
            normalize_before=self.normalize_before,
            attention_type=self.attention_type,
            name="encoder",
        )
        # reference output head: Linear -> LayerNorm(eps 1e-6) -> Linear
        # (ref TransformerLM.py:114-118 output_proj ModuleList)
        self.out_proj = Linear(self.d_model, name="out_proj")
        self.out_norm = nn.LayerNorm(epsilon=1e-6, name="out_norm")
        self.out = Linear(self.vocab, name="out")

    def _embed(self, x):
        emb = self.emb(x)
        if self.emb_proj is not None:
            emb = self.emb_proj(emb)
        return emb

    def _head(self, x):
        return self.out(self.out_norm(self.out_proj(x)))

    def __call__(self, x, hx=None, train=False):
        emb = self._embed(x)
        emb = emb + self.pos(emb)
        mask = get_lookahead_mask(x.shape[1])
        out, _ = self.encoder(emb, src_mask=mask, train=train)
        return self._head(out)

    def embed_tokens(self, ids):
        """Token ids -> model-space embeddings (the multimodal-prefix
        hook: SpeechLLM projects audio features into this space);
        call via apply(..., method="embed_tokens")."""
        return self._embed(ids)

    def forward_embeds(self, embeds, train=False):
        """Causal LM over a PRE-EMBEDDED sequence (B, T, d_model) ->
        (B, T, vocab) logits. The speech-LLM path: audio embeddings and
        token embeddings are concatenated by the caller and scored as
        one causal stream (reference integrations delegate this to the
        HF LLM's inputs_embeds)."""
        emb = embeds + self.pos(embeds)
        mask = get_lookahead_mask(embeds.shape[1])
        out, _ = self.encoder(emb, src_mask=mask, train=train)
        return self._head(out)

    def init_cache(self, batch_size, max_len, dtype=jnp.float32):
        """Per-layer KV buffers for incremental scoring (score_step);
        call via apply(..., method="init_cache")."""
        return self.encoder.init_cache(batch_size, max_len, dtype)

    def score_step(self, tokens, cache, step, anc=None):
        """KV-cached scoring of ONE token: tokens (B,) int32 just
        consumed -> (next-token logits (B, vocab), new_cache). O(step)
        work per step vs the full-buffer forward's O(L^2) — the shallow-
        fusion serving path inside jitted beam search (pairs with
        decoders.scorer.KVTransformerLMScorer)."""
        emb = self._embed(tokens[:, None])  # (B, 1, D)
        L = cache[0]["self"]["k"].shape[1]
        pe = self.pos(jnp.zeros((1, L, self.d_model), emb.dtype))
        emb = emb + jax.lax.dynamic_slice_in_dim(pe, step, 1, axis=1)
        out, new_cache = self.encoder(emb, cache=cache, cache_index=step,
                                      anc=anc)
        return self._head(out[:, 0]), new_cache
