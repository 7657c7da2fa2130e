"""X-vector speaker embedding model.

Capability parity with the reference's ``speechbrain/lobes/models/Xvector.py``
(Xvector :19, Classifier :118, Discriminator :186): TDNN stack with
dilations, statistics pooling, embedding head — here as flax modules whose
convs run channels-last on the MXU.
"""

import flax.linen as nn
import jax.numpy as jnp

from speechbrain_tpu.nnet.CNN import Conv1d
from speechbrain_tpu.nnet.linear import Linear
from speechbrain_tpu.nnet.normalization import BatchNorm1d
from speechbrain_tpu.nnet.pooling import StatisticsPooling


class Xvector(nn.Module):
    """TDNN x-vector extractor: (batch, time, feat) -> (batch, 1, lin_neurons).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> model = Xvector(in_channels=40)
    >>> x = jnp.ones((2, 120, 40))
    >>> vars_ = model.init(jax.random.PRNGKey(0), x, train=False)
    >>> model.apply(vars_, x, train=False).shape
    (2, 1, 512)
    """

    in_channels: int = 40
    activation: str = "leaky_relu"
    tdnn_blocks: int = 5
    tdnn_channels: tuple = (512, 512, 512, 512, 1500)
    tdnn_kernel_sizes: tuple = (5, 3, 3, 1, 1)
    tdnn_dilations: tuple = (1, 2, 3, 1, 1)
    lin_neurons: int = 512

    @nn.compact
    def __call__(self, x, lengths=None, train=True):
        from speechbrain_tpu.nnet.activations import get_activation

        act = get_activation(self.activation)
        for i in range(self.tdnn_blocks):
            x = Conv1d(
                out_channels=self.tdnn_channels[i],
                kernel_size=self.tdnn_kernel_sizes[i],
                dilation=self.tdnn_dilations[i],
                name=f"tdnn_{i}",
            )(x)
            x = act(x)
            x = BatchNorm1d(name=f"bn_{i}")(x, train=train)
        x = StatisticsPooling(name="stats_pool")(x, lengths=lengths)
        x = Linear(n_neurons=self.lin_neurons, name="embedding")(x)
        return x


class Classifier(nn.Module):
    """MLP classifier head over x-vectors with log-softmax output
    (reference Xvector.py:118).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> clf = Classifier(out_neurons=10)
    >>> x = jnp.ones((4, 1, 512))
    >>> v = clf.init(jax.random.PRNGKey(0), x, train=False)
    >>> clf.apply(v, x, train=False).shape
    (4, 1, 10)
    """

    out_neurons: int
    activation: str = "leaky_relu"
    lin_blocks: int = 1
    lin_neurons: int = 512

    @nn.compact
    def __call__(self, x, train=True):
        import jax

        from speechbrain_tpu.nnet.activations import get_activation

        act = get_activation(self.activation)
        x = act(x)
        x = BatchNorm1d(name="norm_in")(x, train=train)
        for i in range(self.lin_blocks):
            x = Linear(n_neurons=self.lin_neurons, name=f"linear_{i}")(x)
            x = act(x)
            x = BatchNorm1d(name=f"norm_{i}")(x, train=train)
        x = Linear(n_neurons=self.out_neurons, name="out")(x)
        return jax.nn.log_softmax(x, axis=-1)


class Discriminator(nn.Module):
    """Binary discriminator over embeddings (reference Xvector.py:186)."""

    activation: str = "leaky_relu"
    lin_blocks: int = 1
    lin_neurons: int = 512

    @nn.compact
    def __call__(self, x, train=True):
        from speechbrain_tpu.nnet.activations import get_activation

        act = get_activation(self.activation)
        for i in range(self.lin_blocks):
            x = Linear(n_neurons=self.lin_neurons, bias=True, name=f"linear_{i}")(x)
            x = BatchNorm1d(name=f"norm_{i}")(x, train=train)
            x = act(x)
        return Linear(n_neurons=1, name="out")(x)
