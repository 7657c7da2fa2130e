"""ResNet-style spectral enhancement model.

Capability parity with the reference's
``speechbrain/lobes/models/EnhanceResnet.py``: conv-resnet over spectral
features with squeeze-excitation, predicting a bounded mask.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from speechbrain_tpu.lobes.models.ResNet import PreActBlock
from speechbrain_tpu.nnet.CNN import Conv2d
from speechbrain_tpu.nnet.linear import Linear


class EnhanceResnet(nn.Module):
    """(B, T, F) magnitudes -> (B, T, F) mask in (0, 1).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> net = EnhanceResnet(channels=(4, 8), blocks_per_stage=1)
    >>> x = jnp.ones((2, 20, 16))
    >>> v = net.init(jax.random.PRNGKey(0), x, train=False)
    >>> net.apply(v, x, train=False).shape
    (2, 20, 16)
    """

    channels: tuple = (16, 32, 64)
    blocks_per_stage: int = 2
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, train=False):
        n_freq = x.shape[-1]
        y = x[..., None]
        for s, ch in enumerate(self.channels):
            for b in range(self.blocks_per_stage):
                y = PreActBlock(
                    out_channels=ch, use_se=True, name=f"block_{s}_{b}"
                )(y, train=train)
        y = Conv2d(1, (1, 1), name="proj")(y)[..., 0]
        mask = jax.nn.sigmoid(Linear(n_freq, name="mask")(y))
        return mask
