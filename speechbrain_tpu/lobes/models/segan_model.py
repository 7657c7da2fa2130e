"""SEGAN: speech enhancement GAN on raw waveforms.

Capability parity with the reference's
``speechbrain/lobes/models/segan_model.py`` (Generator encoder-decoder
with skip connections + latent noise, Discriminator).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from speechbrain_tpu.nnet.CNN import Conv1d, ConvTranspose1d


class Generator(nn.Module):
    """Waveform autoencoder with skips and latent z
    (reference segan_model.py Generator).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> g = Generator(kernel_size=32, channels=(4, 8))
    >>> x = jnp.ones((1, 1024))
    >>> v = g.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, x)
    >>> out = g.apply(v, x, rngs={"noise": jax.random.PRNGKey(2)})
    >>> out.shape
    (1, 1024)
    """

    kernel_size: int = 32
    channels: tuple = (16, 32, 32, 64, 64, 128)
    latent_noise: bool = True

    @nn.compact
    def __call__(self, x):
        squeeze = x.ndim == 2
        y = x[..., None] if squeeze else x
        skips = []
        for i, ch in enumerate(self.channels):
            y = Conv1d(ch, self.kernel_size, stride=2, name=f"enc_{i}")(y)
            y = jnp.where(y >= 0, y, 0.3 * y)  # prelu-ish
            skips.append(y)
        if self.latent_noise:
            z = jax.random.normal(self.make_rng("noise"), y.shape)
            y = jnp.concatenate([y, z], axis=-1)
        for i, ch in enumerate(reversed(self.channels[:-1])):
            y = ConvTranspose1d(
                ch, self.kernel_size, stride=2,
                padding=(self.kernel_size - 2) // 2, name=f"dec_{i}",
            )(y)
            y = jnp.where(y >= 0, y, 0.3 * y)
            skip = skips[-(i + 2)]
            T = min(y.shape[1], skip.shape[1])
            y = y[:, :T] + skip[:, :T]
        y = ConvTranspose1d(
            1, self.kernel_size, stride=2,
            padding=(self.kernel_size - 2) // 2, name="dec_out",
        )(y)
        y = jnp.tanh(y)
        T_out = x.shape[1]
        if y.shape[1] < T_out:
            y = jnp.pad(y, ((0, 0), (0, T_out - y.shape[1]), (0, 0)))
        y = y[:, :T_out]
        return y[..., 0] if squeeze else y


class Discriminator(nn.Module):
    """Conv discriminator over (noisy, enhanced) waveform pairs."""

    kernel_size: int = 32
    channels: tuple = (16, 32, 32, 64, 64, 128)

    @nn.compact
    def __call__(self, x, train=False):
        # x: (B, T, 2)
        y = x
        for i, ch in enumerate(self.channels):
            y = Conv1d(ch, self.kernel_size, stride=2, name=f"conv_{i}")(y)
            y = jax.nn.leaky_relu(y, 0.3)
        y = jnp.mean(y, axis=1)
        from speechbrain_tpu.nnet.linear import Linear

        return Linear(1, name="out")(y)
