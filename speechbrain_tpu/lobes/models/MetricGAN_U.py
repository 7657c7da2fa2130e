"""MetricGAN-U (unsupervised) models.

Capability parity with the reference's
``speechbrain/lobes/models/MetricGAN_U.py``: same generator family as
MetricGAN+ but the discriminator predicts a non-intrusive quality metric
(e.g. DNSMOS-style) from the enhanced spectrogram alone.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from speechbrain_tpu.lobes.models.MetricGAN import EnhancementGenerator  # noqa: F401
from speechbrain_tpu.nnet.CNN import Conv2d
from speechbrain_tpu.nnet.linear import Linear
from speechbrain_tpu.nnet.normalization import BatchNorm1d


class MetricDiscriminator(nn.Module):
    """CNN metric predictor over a SINGLE spectrogram (B, T, F, 1)
    (unsupervised variant: no clean target channel)."""

    kernel_size: tuple = (5, 5)
    base_channels: int = 15

    @nn.compact
    def __call__(self, x, train=False):
        if x.ndim == 3:
            x = x[..., None]
        y = BatchNorm1d(name="bn_in")(x, train=train)
        for i in range(4):
            y = Conv2d(self.base_channels, self.kernel_size, name=f"conv_{i}")(y)
            y = jax.nn.leaky_relu(y, 0.3)
        y = jnp.mean(y, axis=(1, 2))
        y = jax.nn.leaky_relu(Linear(50, name="fc1")(y), 0.3)
        y = jax.nn.leaky_relu(Linear(10, name="fc2")(y), 0.3)
        return Linear(1, name="out")(y)
