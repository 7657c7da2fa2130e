"""Signal downsampling front-ends.

Capability parity with the reference's
``speechbrain/lobes/models/downsampling.py`` (SignalDownsampler,
Conv1DDownsampler, PoolingDownsampler): reduce input length before SSL
encoders.
"""

import flax.linen as nn
import jax.numpy as jnp

from speechbrain_tpu.nnet.CNN import Conv1d
from speechbrain_tpu.nnet.pooling import Pooling1d


class SignalDownsampler:
    """Decimation-based downsampling (reference downsampling.py)."""

    def __init__(self, downsampling_factor, initial_sampling_rate=16000):
        from speechbrain_tpu.augment.time_domain import Resample

        self.factor = downsampling_factor
        self.resampler = Resample(
            orig_freq=initial_sampling_rate,
            new_freq=initial_sampling_rate // downsampling_factor,
        )

    def __call__(self, x, lengths=None):
        return self.resampler(x)


class Conv1DDownsampler(nn.Module):
    """Learned strided-conv downsampler."""

    downsampling_factor: int = 2
    kernel_size: int = 161

    @nn.compact
    def __call__(self, x):
        squeeze = x.ndim == 2
        if squeeze:
            x = x[..., None]
        y = Conv1d(
            out_channels=1,
            kernel_size=self.kernel_size,
            stride=self.downsampling_factor,
            name="conv",
        )(x)
        return y[..., 0] if squeeze else y


class PoolingDownsampler(nn.Module):
    """Average-pooling downsampler."""

    downsampling_factor: int = 2
    kernel_size: int = 2

    @nn.compact
    def __call__(self, x):
        squeeze = x.ndim == 2
        if squeeze:
            x = x[..., None]
        y = Pooling1d("avg", self.kernel_size, stride=self.downsampling_factor)(x)
        return y[..., 0] if squeeze else y
