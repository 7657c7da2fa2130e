"""CNN14 audio tagging encoder.

Capability parity with the reference's ``speechbrain/lobes/models/Cnn14.py``
(Cnn14 :422): 6 VGG-ish conv blocks with avg-pooling, used for audio
classification / interpretability recipes (PIQ/L2I).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from speechbrain_tpu.nnet.CNN import Conv2d
from speechbrain_tpu.nnet.normalization import BatchNorm1d
from speechbrain_tpu.nnet.pooling import Pooling2d


class ConvBlock(nn.Module):
    """Two 3x3 convs + BN + pooling (CNN14 building block)."""
    out_channels: int

    @nn.compact
    def __call__(self, x, train=False):
        y = Conv2d(self.out_channels, (3, 3), bias=False, name="conv1")(x)
        y = BatchNorm1d(name="bn1")(y, train=train)
        y = jax.nn.relu(y)
        y = Conv2d(self.out_channels, (3, 3), bias=False, name="conv2")(y)
        y = BatchNorm1d(name="bn2")(y, train=train)
        return jax.nn.relu(y)


class Cnn14(nn.Module):
    """(B, T, F) mel input -> (B, T', emb_dim) embeddings
    (reference Cnn14.py:422).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> net = Cnn14(mel_bins=24, emb_dim=32, base_channels=4)
    >>> x = jnp.ones((2, 64, 24))
    >>> v = net.init(jax.random.PRNGKey(0), x, train=False)
    >>> net.apply(v, x, train=False).shape
    (2, 2, 32)
    """

    mel_bins: int = 80
    emb_dim: int = 2048
    norm_type: str = "bn"
    base_channels: int = 64
    return_reps: bool = False

    @nn.compact
    def __call__(self, x, train=False):
        y = x[..., None]
        ch = self.base_channels
        reps = []
        for b in range(6):
            y = ConvBlock(out_channels=min(ch, self.emb_dim), name=f"block_{b}")(
                y, train=train
            )
            if b < 5:
                y = Pooling2d("avg", (2, 2), name=f"pool_{b}")(y)
            if b >= 3:
                reps.append(y)  # multi-resolution maps for interpreters
            ch *= 2
        # collapse frequency, keep time
        y = jnp.mean(y, axis=2)  # (B, T', C)
        from speechbrain_tpu.nnet.linear import Linear

        emb = jax.nn.relu(Linear(self.emb_dim, name="fc")(y))
        if self.return_reps:
            # coarsest first, channels-last (the L2I/PIQ/L-MAC contract,
            # reference Cnn14.py:422 returns the analogous torch maps)
            return emb, reps[::-1]
        return emb
