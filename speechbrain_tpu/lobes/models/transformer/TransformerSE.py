"""Transformer speech enhancement head.

Capability parity with the reference's
``speechbrain/lobes/models/transformer/TransformerSE.py`` (CNNTransformerSE):
encoder-only transformer over spectral features predicting a mask.
"""

import flax.linen as nn
import jax

from speechbrain_tpu.lobes.models.transformer.Transformer import TransformerEncoder
from speechbrain_tpu.nnet.linear import Linear


class CNNTransformerSE(nn.Module):
    """(B, T, F) -> (B, T, F) enhancement mask.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> net = CNNTransformerSE(d_model=16, num_layers=1, nhead=4, d_ffn=32,
    ...                        output_size=20)
    >>> x = jnp.ones((2, 10, 20))
    >>> v = net.init(jax.random.PRNGKey(0), x)
    >>> net.apply(v, x).shape
    (2, 10, 20)
    """

    d_model: int = 256
    num_layers: int = 8
    nhead: int = 8
    d_ffn: int = 512
    output_size: int = 257
    output_activation: str = "relu"
    causal: bool = True
    custom_emb_module: object = None

    @nn.compact
    def __call__(self, x, src_key_padding_mask=None, train=False):
        from speechbrain_tpu.nnet.activations import get_activation
        from speechbrain_tpu.lobes.models.transformer.Transformer import (
            get_lookahead_mask,
        )

        if self.custom_emb_module is not None:
            x = self.custom_emb_module(x)
        x = Linear(self.d_model, name="proj_in")(x)
        mask = get_lookahead_mask(x.shape[1]) if self.causal else None
        out, _ = TransformerEncoder(
            num_layers=self.num_layers, nhead=self.nhead, d_ffn=self.d_ffn,
            d_model=self.d_model, name="encoder",
        )(x, src_mask=mask, src_key_padding_mask=src_key_padding_mask,
          train=train)
        out = Linear(self.output_size, name="proj_out")(out)
        return get_activation(self.output_activation)(out)
