"""Convolutional front-ends.

Capability parity with the reference's
``speechbrain/lobes/models/convolution.py`` (ConvolutionFrontEnd :116):
the strided Conv2d subsampler placed before Conformer/Transformer ASR
encoders (4x time reduction with two stride-2 convs).
"""

import flax.linen as nn
import jax.numpy as jnp

from speechbrain_tpu.nnet.CNN import Conv2d
from speechbrain_tpu.nnet.normalization import BatchNorm1d, LayerNorm


class ConvolutionFrontEnd(nn.Module):
    """Stack of strided 2D conv blocks over (batch, time, freq[, channel]).

    Output is (batch, time/prod(strides), ceil(freq/prod(strides)) * out_channels[-1])
    after flattening the channel axis — ready for a Linear into d_model.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> fe = ConvolutionFrontEnd(num_blocks=2, out_channels=(8, 16), strides=(2, 2))
    >>> x = jnp.ones((2, 64, 40))
    >>> v = fe.init(jax.random.PRNGKey(0), x, train=False)
    >>> fe.apply(v, x, train=False).shape
    (2, 16, 160)
    """

    num_blocks: int = 3
    num_layers_per_block: int = 1
    out_channels: tuple = (128, 200, 256)
    kernel_sizes: tuple = (3, 3, 3)
    strides: tuple = (2, 2, 1)
    dilations: tuple = (1, 1, 1)
    residuals: tuple = (True, True, True)
    activation: str = "leaky_relu"
    norm: str = "layernorm"
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, train=False):
        from speechbrain_tpu.nnet.activations import get_activation

        act = get_activation(self.activation)
        if x.ndim == 3:
            x = x[..., None]  # (B, T, F, 1)
        for b in range(self.num_blocks):
            for l in range(self.num_layers_per_block):
                stride = self.strides[b] if l == self.num_layers_per_block - 1 else 1
                y = Conv2d(
                    out_channels=self.out_channels[b],
                    kernel_size=(self.kernel_sizes[b], self.kernel_sizes[b]),
                    stride=(stride, stride),
                    dilation=(self.dilations[b], self.dilations[b]),
                    name=f"conv_{b}_{l}",
                )(x if l == 0 else y)
            if self.norm == "layernorm":
                y = LayerNorm(name=f"norm_{b}")(y)
            elif self.norm == "batchnorm":
                y = BatchNorm1d(name=f"norm_{b}")(y, train=train)
            y = act(y)
            if train and self.dropout > 0:
                y = nn.Dropout(self.dropout, deterministic=False)(y)
            x = y
        B, T, F, C = x.shape
        return x.reshape(B, T, F * C)
