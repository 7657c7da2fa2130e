"""BEATs: audio pre-training with acoustic tokenizers.

Capability parity with the reference's ``speechbrain/lobes/models/beats.py``
(BEATs at beats.py:30, preprocess at beats.py:156, extract_features at
beats.py:227, TransformerEncoder at beats.py:649), re-designed for TPU:

- Patch embedding is one strided (16, 16) conv over the (B, T, 128, 1)
  fbank grid — a single MXU-friendly matmul per patch.
- Transformer layers use a T5-style bucketed relative attention bias
  shared across layers (the first layer owns the table), matching
  BEATs' relative_position_embedding.
- The fbank frontend is a jittable Kaldi-compatible fbank
  (processing/features.py kaldi_fbank — povey window, snip edges,
  natural log, mel-domain triangles), matching the
  torchaudio.compliance.kaldi features the original checkpoints were
  trained on.
- Frozen mode wraps features in ``lax.stop_gradient`` instead of
  ``torch.no_grad``.
"""

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from speechbrain_tpu.nnet.attention import MultiheadAttention



def _relative_buckets(n_query, n_key, num_buckets=320, max_distance=800):
    """T5-style symmetric relative position bucketing."""
    ctx = jnp.arange(n_query)[:, None]
    mem = jnp.arange(n_key)[None, :]
    rel = mem - ctx
    num = num_buckets // 2
    ret = jnp.where(rel > 0, num, 0)
    n = jnp.abs(rel)
    max_exact = num // 4
    is_small = n < max_exact
    large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-9)
        / jnp.log(max_distance / max_exact)
        * (num - max_exact)
    ).astype(jnp.int32)
    large = jnp.minimum(large, num - 1)
    return ret + jnp.where(is_small, n, large)


class BEATsEncoderLayer(nn.Module):
    """Post-norm (deep-norm) transformer layer (reference beats.py:649)."""

    embed_dim: int = 768
    ffn_dim: int = 3072
    nhead: int = 12
    dropout: float = 0.1
    deep_norm_alpha: float = 1.0

    @nn.compact
    def __call__(self, x, attn_bias=None, key_padding_mask=None, train=False):
        attn, _ = MultiheadAttention(
            nhead=self.nhead, d_model=self.embed_dim, dropout=self.dropout,
            name="self_attn",
        )(x, x, x, attn_mask=attn_bias, key_padding_mask=key_padding_mask,
          train=train)
        x = nn.LayerNorm(name="ln1")(x * self.deep_norm_alpha + attn)
        h = nn.Dense(self.ffn_dim, name="fc1")(x)
        h = nn.gelu(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Dense(self.embed_dim, name="fc2")(h)
        return nn.LayerNorm(name="ln2")(x * self.deep_norm_alpha + h)


class BEATs(nn.Module):
    """BEATs audio encoder (+ optional tagging predictor)
    (reference beats.py:30).

    ``__call__(wav, wav_lens)`` returns encoder features
    (B, n_patches, D) — or class probabilities (B, n_classes) when
    ``predictor_class`` is set; ``output_all_hiddens=True`` stacks all
    layer outputs on axis 0.
    """

    input_patch_size: int = 16
    embed_dim: int = 512
    encoder_embed_dim: int = 768
    encoder_layers: int = 12
    encoder_ffn_embed_dim: int = 3072
    encoder_attention_heads: int = 12
    dropout: float = 0.1
    relative_position_embedding: bool = True
    num_buckets: int = 320
    max_distance: int = 800
    predictor_class: Optional[int] = None
    predictor_dropout: float = 0.1
    freeze: bool = False
    output_all_hiddens: bool = False
    fbank_mean: float = 15.41663
    fbank_std: float = 6.55582

    def setup(self):
        self.patch_embedding = nn.Conv(
            self.embed_dim,
            (self.input_patch_size, self.input_patch_size),
            strides=(self.input_patch_size, self.input_patch_size),
            padding="VALID", name="patch_embedding",
        )
        self.layer_norm = nn.LayerNorm(name="layer_norm")
        if self.embed_dim != self.encoder_embed_dim:
            self.post_extract_proj = nn.Dense(
                self.encoder_embed_dim, name="post_extract_proj"
            )
        else:
            self.post_extract_proj = None
        import math

        alpha = math.pow(2 * self.encoder_layers, 1 / 4)
        self.layers = [
            BEATsEncoderLayer(
                embed_dim=self.encoder_embed_dim,
                ffn_dim=self.encoder_ffn_embed_dim,
                nhead=self.encoder_attention_heads,
                dropout=self.dropout,
                deep_norm_alpha=alpha,
                name=f"layer_{i}",
            )
            for i in range(self.encoder_layers)
        ]
        if self.relative_position_embedding:
            self.rel_bias = nn.Embed(
                self.num_buckets, self.encoder_attention_heads,
                name="rel_bias",
            )
        if self.predictor_class is not None:
            self.predictor = nn.Dense(self.predictor_class, name="predictor")
        self.dropout_input = nn.Dropout(self.dropout)
        self.dropout_predictor = nn.Dropout(self.predictor_dropout)

    def preprocess(self, source):
        """Waveform (B, T) -> normalized 128-bin log-mel (B, frames, 128)
        (reference beats.py:156). Uses the Kaldi-compatible fbank (povey
        window, snip edges, natural log, mel-domain triangles, waveform
        scaled by 2**15) so original BEATs checkpoints see the frontend
        they were trained on."""
        from speechbrain_tpu.processing.features import kaldi_fbank

        fb = kaldi_fbank(source * 32768.0, num_mel_bins=128)
        return (fb - self.fbank_mean) / (2 * self.fbank_std)

    def __call__(self, wav, wav_lens=None, train=False):
        out = self.extract_features(wav, wav_lens, train=train)
        if self.freeze:
            out = jax.tree_util.tree_map(jax.lax.stop_gradient, out)
        return out

    def extract_features(self, wav, wav_lens=None, train=False):
        fbank = self.preprocess(wav)
        # trim mel frames to a patch multiple so the grid is exact
        P = self.input_patch_size
        T = (fbank.shape[1] // P) * P
        fbank = fbank[:, :T]
        feats = self.patch_embedding(fbank[..., None])
        B, tP, fP, D = feats.shape
        feats = feats.reshape(B, tP * fP, D)
        feats = self.layer_norm(feats)
        if self.post_extract_proj is not None:
            feats = self.post_extract_proj(feats)
        feats = self.dropout_input(feats, deterministic=not train)

        key_padding_mask = None
        if wav_lens is not None:
            frame_mask = (
                jnp.arange(tP)[None, :]
                < jnp.round(wav_lens * tP)[:, None]
            )  # patch rows align with time
            key_padding_mask = ~jnp.repeat(frame_mask, fP, axis=1)

        attn_bias = None
        if self.relative_position_embedding:
            n = feats.shape[1]
            buckets = _relative_buckets(
                n, n, self.num_buckets, self.max_distance
            )
            attn_bias = jnp.moveaxis(self.rel_bias(buckets), -1, 0)

        x = feats
        hiddens = [x]
        for layer in self.layers:
            x = layer(x, attn_bias=attn_bias,
                      key_padding_mask=key_padding_mask, train=train)
            hiddens.append(x)

        if self.predictor_class is not None:
            h = self.dropout_predictor(x, deterministic=not train)
            logits = self.predictor(h)
            if key_padding_mask is not None:
                keep = (~key_padding_mask).astype(logits.dtype)[..., None]
                logits = (logits * keep).sum(1) / jnp.maximum(
                    keep.sum(1), 1.0
                )
            else:
                logits = logits.mean(1)
            return jax.nn.sigmoid(logits)

        if self.output_all_hiddens:
            return jnp.stack(hiddens, axis=0)
        return x
