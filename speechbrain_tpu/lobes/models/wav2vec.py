"""wav2vec 2.0 SSL pretraining components (SpeechBrain-native flavor).

Capability parity with the reference's
``speechbrain/lobes/models/wav2vec.py`` (W2VLatentExtractor :26,
W2VTargetQuantiser :108, EncoderWrapper, sample_negatives, w2v_mask):
conv latent extractor, Gumbel target quantizer, masking and negative
sampling for the contrastive objective.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from speechbrain_tpu.nnet.CNN import Conv1d
from speechbrain_tpu.nnet.linear import Linear
from speechbrain_tpu.nnet.normalization import LayerNorm
from speechbrain_tpu.nnet.quantisers import GumbelVectorQuantizer


class W2VLatentExtractor(nn.Module):
    """Strided conv feature extractor, 320x downsampling
    (reference wav2vec.py:26).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> ext = W2VLatentExtractor(out_channels=(8, 8, 8), kernel_sizes=(11, 3, 3), strides=(5, 2, 2))
    >>> x = jnp.ones((2, 4000))
    >>> v = ext.init(jax.random.PRNGKey(0), x)
    >>> ext.apply(v, x).shape
    (2, 198, 8)
    """

    out_channels: tuple = (512,) * 7
    kernel_sizes: tuple = (11, 3, 3, 3, 3, 3, 3)
    strides: tuple = (5, 2, 2, 2, 2, 2, 2)

    @nn.compact
    def __call__(self, x, normalize_signal=True):
        if normalize_signal:
            # reference: parameter-free F.layer_norm over the time axis
            mean = jnp.mean(x, axis=1, keepdims=True)
            var = jnp.var(x, axis=1, keepdims=True)
            x = (x - mean) / jnp.sqrt(var + 1e-5)
        y = x[..., None]
        for i, (c, k, s) in enumerate(
            zip(self.out_channels, self.kernel_sizes, self.strides)
        ):
            # bias-free convs + LN + erf-GELU, matching the reference's
            # ConvolutionFrontEnd(conv_bias=False, norm=LayerNorm,
            # activation=nn.GELU) stack (ref wav2vec.py:70-87)
            y = Conv1d(
                c, k, stride=s, padding="valid", bias=False,
                name=f"conv_{i}",
            )(y)
            y = LayerNorm(name=f"norm_{i}")(y)
            y = jax.nn.gelu(y, approximate=False)
        return nn.LayerNorm(name="norm")(y)


class W2VTargetQuantiser(nn.Module):
    """Gumbel quantizer + target projection (reference wav2vec.py:108)."""

    in_dim: int = 512
    out_dim: int = 256
    quantiser_vars: int = 320
    quantiser_groups: int = 2

    @nn.compact
    def __call__(self, x, train=False):
        out = GumbelVectorQuantizer(
            dim=self.in_dim,
            num_vars=self.quantiser_vars,
            groups=self.quantiser_groups,
            vq_dim=self.out_dim,
            name="quantiser",
        )(x, train=train)
        targets = Linear(self.out_dim, name="proj")(out["x"])
        return targets, out


def w2v_mask(shape, mask_prob, mask_length, rng):
    """Sample span masks (B, T) bool for contrastive training
    (reference wav2vec.py compute_mask)."""
    B, T = shape
    n_starts = max(1, int(mask_prob * T / mask_length))
    starts = jax.random.randint(rng, (B, n_starts), 0, max(T - mask_length, 1))
    pos = jnp.arange(T)[None, None, :]
    spans = (pos >= starts[..., None]) & (pos < (starts + mask_length)[..., None])
    return jnp.any(spans, axis=1)


def sample_negatives(y, num_neg, rng):
    """Sample negative targets from other timesteps of the same utterance
    (reference wav2vec.py sample_negatives). y: (B, T, C) ->
    (num_neg, B, T, C)."""
    B, T, C = y.shape
    # random distinct-from-self indices
    idx = jax.random.randint(rng, (num_neg, B, T), 0, T - 1)
    self_idx = jnp.arange(T)[None, None, :]
    idx = jnp.where(idx >= self_idx, idx + 1, idx) % T
    return jax.vmap(
        lambda ids: jnp.take_along_axis(y, ids[..., None], axis=1), in_axes=0
    )(idx)


def w2v_contrastive_loss(predictions, targets, negatives, mask, temperature=0.1):
    """InfoNCE over masked positions (reference losses.py ContrastiveLoss)."""
    def cos(a, b):
        num = jnp.sum(a * b, axis=-1)
        den = jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(b, axis=-1)
        return num / jnp.maximum(den, 1e-8)

    pos_sim = cos(predictions, targets)[None]  # (1, B, T)
    neg_sim = cos(predictions[None], negatives)  # (N, B, T)
    logits = jnp.concatenate([pos_sim, neg_sim], axis=0) / temperature
    logp = jax.nn.log_softmax(logits, axis=0)
    loss = -logp[0]
    mask = mask.astype(loss.dtype)
    return jnp.sum(loss * mask) / jnp.maximum(jnp.sum(mask), 1.0)
