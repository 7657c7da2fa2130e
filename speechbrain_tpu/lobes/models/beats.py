"""BEATs: audio pre-training with acoustic tokenizers.

Capability parity with the reference's ``speechbrain/lobes/models/beats.py``
(BEATs at beats.py:30, preprocess at beats.py:156, extract_features at
beats.py:227, TransformerEncoder at beats.py:634, gated-relative-position
MultiheadAttention at beats.py:1030), re-designed for TPU but numerically
faithful so published BEATs checkpoints pour 1:1
(utils/torch_convert.beats_key_map):

- Patch embedding is one strided (16, 16) conv over the (B, T, 128, 1)
  fbank grid — a single MXU-friendly matmul per patch; flattening order
  matches the reference's (B, D, tP, fP).reshape/transpose.
- A grouped-conv positional embedding (conv_pos=128, groups=16, SamePad,
  erf-GELU) is added before the stack (ref :651-670).
- Transformer layers are post-norm deep-norm blocks; the T5-style bucketed
  relative position bias is computed ONCE (the first layer owns the
  table, ref extract_features passes pos_bias along) and each layer
  applies its own GRU-style gate (grep_linear/grep_a, ref :1520-1535).
- The fbank frontend is a jittable Kaldi-compatible fbank
  (processing/features.py kaldi_fbank — povey window, snip edges,
  natural log, mel-domain triangles), matching the
  torchaudio.compliance.kaldi features the original checkpoints were
  trained on.
- Frozen mode wraps features in ``lax.stop_gradient`` instead of
  ``torch.no_grad``.
"""

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

NEG_INF = -1e9


def _relative_buckets(n_query, n_key, num_buckets=320, max_distance=800):
    """T5-style symmetric relative position bucketing (ref beats.py:1188)."""
    ctx = jnp.arange(n_query)[:, None]
    mem = jnp.arange(n_key)[None, :]
    rel = mem - ctx
    num = num_buckets // 2
    ret = jnp.where(rel > 0, num, 0)
    n = jnp.abs(rel)
    max_exact = num // 2
    is_small = n < max_exact
    large = max_exact + (
        jnp.log(jnp.maximum(n.astype(jnp.float32), 1.0) / max_exact)
        / math.log(max_distance / max_exact)
        * (num - max_exact)
    ).astype(jnp.int32)
    large = jnp.minimum(large, num - 1)
    return ret + jnp.where(is_small, n, large)


class BEATsSelfAttention(nn.Module):
    """BEATs multi-head self-attention with gated relative position bias
    (reference beats.py:1030). The reference's alpha=32 max-subtraction
    rescaling (:1640-1643) is a softmax-invariant row shift, so the
    standard scaled-dot-product form here is numerically equivalent."""

    embed_dim: int = 768
    nhead: int = 12
    gru_rel_pos: bool = True

    @nn.compact
    def __call__(self, x, pos_bias=None, key_padding_mask=None):
        B, L, D = x.shape
        H = self.nhead
        hd = D // H
        q = nn.Dense(D, name="q_proj")(x)
        k = nn.Dense(D, name="k_proj")(x)
        v = nn.Dense(D, name="v_proj")(x)
        qh = q.reshape(B, L, H, hd).transpose(0, 2, 1, 3)  # (B,H,L,hd)
        kh = k.reshape(B, L, H, hd).transpose(0, 2, 1, 3)
        vh = v.reshape(B, L, H, hd).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) * (hd**-0.5)
        if pos_bias is not None:
            bias = pos_bias[None]  # (1, H, L, L)
            if self.gru_rel_pos:
                # gate from the RAW query (ref :1520-1526 rescales q back)
                gates = nn.Dense(8, name="grep_linear")(qh)
                gates = jax.nn.sigmoid(
                    gates.reshape(B, H, L, 2, 4).sum(-1)
                )
                gate_a, gate_b = gates[..., 0], gates[..., 1]
                grep_a = self.param(
                    "grep_a", nn.initializers.ones, (1, H, 1, 1)
                )
                gate = gate_a * (gate_b * grep_a[..., 0, 0][:, :, None] - 1.0) + 2.0
                bias = gate[..., None] * bias  # (B,H,L,1)*(1,H,L,L)
            scores = scores + bias
        if key_padding_mask is not None:
            scores = jnp.where(
                key_padding_mask[:, None, None, :], NEG_INF, scores
            )
        w = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", w, vh)
        out = out.transpose(0, 2, 1, 3).reshape(B, L, D)
        return nn.Dense(D, name="out_proj")(out)


class BEATsEncoderLayer(nn.Module):
    """Post-norm (deep-norm) transformer layer (reference beats.py:841)."""

    embed_dim: int = 768
    ffn_dim: int = 3072
    nhead: int = 12
    dropout: float = 0.1
    deep_norm_alpha: float = 1.0
    gru_rel_pos: bool = True

    @nn.compact
    def __call__(self, x, pos_bias=None, key_padding_mask=None, train=False):
        attn = BEATsSelfAttention(
            embed_dim=self.embed_dim, nhead=self.nhead,
            gru_rel_pos=self.gru_rel_pos, name="self_attn",
        )(x, pos_bias=pos_bias, key_padding_mask=key_padding_mask)
        if train and self.dropout > 0:
            attn = nn.Dropout(self.dropout, deterministic=False)(attn)
        x = nn.LayerNorm(name="ln1")(x * self.deep_norm_alpha + attn)
        h = nn.Dense(self.ffn_dim, name="fc1")(x)
        h = nn.gelu(h, approximate=False)
        if train and self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=False)(h)
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
    conv_pos: int = 128
    conv_pos_groups: int = 16
    relative_position_embedding: bool = True
    num_buckets: int = 320
    max_distance: int = 800
    gru_rel_pos: bool = True
    deep_norm: bool = True
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
            padding="VALID", use_bias=False, name="patch_embedding",
        )
        self.layer_norm = nn.LayerNorm(name="layer_norm")
        if self.embed_dim != self.encoder_embed_dim:
            self.post_extract_proj = nn.Dense(
                self.encoder_embed_dim, name="post_extract_proj"
            )
        else:
            self.post_extract_proj = None
        self.pos_conv = nn.Conv(
            self.encoder_embed_dim, (self.conv_pos,),
            feature_group_count=self.conv_pos_groups,
            padding=self.conv_pos // 2, name="pos_conv",
        )
        self.encoder_layer_norm = nn.LayerNorm(name="encoder_layer_norm")
        alpha = (
            math.pow(2 * self.encoder_layers, 1 / 4) if self.deep_norm
            else 1.0
        )
        self.layers = [
            BEATsEncoderLayer(
                embed_dim=self.encoder_embed_dim,
                ffn_dim=self.encoder_ffn_embed_dim,
                nhead=self.encoder_attention_heads,
                dropout=self.dropout,
                deep_norm_alpha=alpha,
                gru_rel_pos=self.gru_rel_pos,
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

    def encode_fbank(self, fbank, key_padding_mask=None, train=False):
        """Patch-embed + transformer stack over a preprocessed fbank grid
        (B, T, 128): the post-frontend half of extract_features."""
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

        # grouped-conv positional embedding: SamePad trims the trailing
        # element for even kernels (ref SamePad, beats.py:399)
        x = feats
        if key_padding_mask is not None:
            x = jnp.where(key_padding_mask[..., None], 0.0, x)
        x_conv = self.pos_conv(x)
        if self.conv_pos % 2 == 0:
            x_conv = x_conv[:, :-1]
        x = x + nn.gelu(x_conv, approximate=False)
        x = self.encoder_layer_norm(x)

        pos_bias = None
        if self.relative_position_embedding:
            n = x.shape[1]
            buckets = _relative_buckets(
                n, n, self.num_buckets, self.max_distance
            )
            pos_bias = jnp.moveaxis(self.rel_bias(buckets), -1, 0)

        hiddens = [x]
        for layer in self.layers:
            x = layer(x, pos_bias=pos_bias,
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

    def extract_features(self, wav, wav_lens=None, train=False):
        fbank = self.preprocess(wav)
        P = self.input_patch_size
        tP = (fbank.shape[1] // P)
        key_padding_mask = None
        if wav_lens is not None:
            frame_mask = (
                jnp.arange(tP)[None, :]
                < jnp.round(wav_lens * tP)[:, None]
            )  # patch rows align with time
            key_padding_mask = ~jnp.repeat(frame_mask, 128 // P, axis=1)
        return self.encode_fbank(
            fbank, key_padding_mask=key_padding_mask, train=train
        )
