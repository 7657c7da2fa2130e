"""Vision-Transformer encoder over spectrogram "images".

The reference's ESC50 vit/amt_vit configs pull a pretrained
``transformers.ViTModel`` backbone and mean-pool its tokens
(ref recipes/ESC50/classification/hparams/vit.yaml:97); this module is
the framework-native equivalent: patchify the (B, T, F) spectrogram
with a strided conv, prepend a CLS token, and run a standard
pre-norm transformer encoder. The attention maps are exposed for the
attention-rollout interpreter (interpret_amt).
"""

import flax.linen as nn
import jax.numpy as jnp

from speechbrain_tpu.lobes.models.transformer.Transformer import (
    TransformerEncoder,
)
from speechbrain_tpu.nnet.CNN import Conv2d


class ViTEncoder(nn.Module):
    """(B, T, F) spectrogram -> (B, 1 + N_patches, d_model) tokens.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> vit = ViTEncoder(d_model=16, nhead=4, num_layers=2, d_ffn=32,
    ...                  patch_size=(8, 8))
    >>> x = jnp.ones((2, 32, 24))
    >>> v = vit.init(jax.random.PRNGKey(0), x)
    >>> out, attns = vit.apply(v, x)
    >>> out.shape
    (2, 13, 16)
    """

    d_model: int = 768
    nhead: int = 12
    num_layers: int = 12
    d_ffn: int = 3072
    patch_size: tuple = (16, 16)
    dropout: float = 0.0
    max_patches: int = 4096
    # return (tokens, [spatial_map]) for the interpretability heads
    # (the Cnn14 (emb, reps) convention) instead of (tokens, attns)
    return_reps: bool = False

    @nn.compact
    def __call__(self, x, train=False):
        B = x.shape[0]
        h = x[..., None] if x.ndim == 3 else x
        # patch embedding: one strided conv = linear patch projection
        h = Conv2d(
            out_channels=self.d_model,
            kernel_size=self.patch_size,
            stride=self.patch_size,
            padding="valid",
            name="patch_embed",
        )(h)
        gt, gf = h.shape[1], h.shape[2]
        h = h.reshape(B, -1, self.d_model)  # (B, N, d)
        cls = self.param(
            "cls_token", nn.initializers.normal(0.02),
            (1, 1, self.d_model),
        )
        h = jnp.concatenate([jnp.tile(cls, (B, 1, 1)), h], axis=1)
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (1, self.max_patches, self.d_model),
        )
        h = h + pos[:, : h.shape[1]]
        out, attns = TransformerEncoder(
            num_layers=self.num_layers,
            nhead=self.nhead,
            d_ffn=self.d_ffn,
            d_model=self.d_model,
            dropout=self.dropout,
            normalize_before=True,
            name="encoder",
        )(h, train=train)
        if self.return_reps:
            spatial = out[:, 1:].reshape(B, gt, gf, self.d_model)
            return out, [spatial]
        return out, attns
