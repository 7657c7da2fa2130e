"""MetricGAN+ enhancement models.

Capability parity with the reference's
``speechbrain/lobes/models/MetricGAN.py`` (EnhancementGenerator :59 with
learnable sigmoid, MetricDiscriminator :122): BLSTM masker over magnitude
spectra + CNN discriminator predicting the target metric (PESQ).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from speechbrain_tpu.nnet.CNN import Conv2d
from speechbrain_tpu.nnet.linear import Linear
from speechbrain_tpu.nnet.RNN import LSTM
from speechbrain_tpu.nnet.normalization import BatchNorm1d


class LearnableSigmoid(nn.Module):
    """Per-frequency sigmoid slope (reference MetricGAN.py:31)."""

    in_features: int
    beta: float = 1.2

    @nn.compact
    def __call__(self, x):
        slope = self.param("slope", nn.initializers.ones, (self.in_features,))
        return self.beta * jax.nn.sigmoid(slope * x)


class EnhancementGenerator(nn.Module):
    """BLSTM masker: magnitude spectrum -> mask in (0, beta)
    (reference MetricGAN.py:59).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> g = EnhancementGenerator(lstm_neurons=16, dnn_neurons=16)
    >>> x = jnp.ones((2, 30, 257))
    >>> v = g.init(jax.random.PRNGKey(0), x)
    >>> g.apply(v, x).shape
    (2, 30, 257)
    """

    lstm_neurons: int = 200
    dnn_neurons: int = 300
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, lengths=None, train=False):
        n_freq = x.shape[-1]
        y, _ = LSTM(
            hidden_size=self.lstm_neurons,
            num_layers=2,
            bidirectional=True,
            dropout=self.dropout,
            name="blstm",
        )(x, train=train)
        y = Linear(self.dnn_neurons, name="linear1")(y)
        y = jax.nn.leaky_relu(y, 0.3)
        if train and self.dropout > 0:
            y = nn.Dropout(self.dropout, deterministic=False)(y)
        y = Linear(n_freq, name="linear2")(y)
        return LearnableSigmoid(in_features=n_freq, name="lsigmoid")(y)


class MetricDiscriminator(nn.Module):
    """CNN metric predictor over (target, enhanced) spectrogram pairs
    (reference MetricGAN.py:122).

    Input (B, T, F, 2) -> scalar metric estimate per utterance.
    """

    kernel_size: tuple = (5, 5)
    base_channels: int = 15
    activation: str = "leaky_relu"

    @nn.compact
    def __call__(self, x, train=False):
        from speechbrain_tpu.nnet.activations import get_activation

        act = get_activation(self.activation)
        # spectral normalization approximated by weight-norm-free convs + BN
        y = BatchNorm1d(name="bn_in")(x, train=train)
        for i in range(4):
            y = Conv2d(
                out_channels=self.base_channels,
                kernel_size=self.kernel_size,
                name=f"conv_{i}",
            )(y)
            y = act(y)
        y = jnp.mean(y, axis=(1, 2))  # global average pool
        y = Linear(50, name="linear1")(y)
        y = act(y)
        y = Linear(10, name="linear2")(y)
        y = act(y)
        return Linear(1, name="out")(y)
