"""Autoencoders.

Capability parity with the reference's ``speechbrain/nnet/autoencoders.py``
(Autoencoder, AutoencoderOutput, VariationalAutoencoder,
NormalizingAutoencoder): generic encode/decode wrappers + VAE with
reparameterization ("latent" rng collection).
"""

from dataclasses import dataclass
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclass
class AutoencoderOutput:
    """Output bundle: rec + latent."""
    rec: Any
    latent: Any


@dataclass
class VariationalAutoencoderOutput:
    """Output bundle: rec, mean, log_var, latent, latent_sample."""
    rec: Any
    mean: Any
    log_var: Any
    latent: Any
    latent_sample: Any


class Autoencoder(nn.Module):
    """Wrap (encoder, decoder) modules with the reference's API."""

    encoder: nn.Module
    decoder: nn.Module

    def encode(self, x, **kwargs):
        return self.encoder(x, **kwargs)

    def decode(self, latent, **kwargs):
        return self.decoder(latent, **kwargs)

    @nn.compact
    def __call__(self, x):
        latent = self.encoder(x)
        rec = self.decoder(latent)
        return AutoencoderOutput(rec=rec, latent=latent)


class VariationalAutoencoder(nn.Module):
    """VAE: encoder -> (mean, log_var) heads -> sample -> decoder
    (reference autoencoders.py VariationalAutoencoder).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> from speechbrain_tpu.nnet.linear import Linear
    >>> vae = VariationalAutoencoder(
    ...     encoder=Linear(n_neurons=8), decoder=Linear(n_neurons=16),
    ...     latent_dim=4)
    >>> x = jnp.ones((2, 16))
    >>> v = vae.init({"params": jax.random.PRNGKey(0), "latent": jax.random.PRNGKey(1)}, x)
    >>> out = vae.apply(v, x, rngs={"latent": jax.random.PRNGKey(2)})
    >>> out.rec.shape
    (2, 16)
    """

    encoder: nn.Module
    decoder: nn.Module
    latent_dim: int

    @nn.compact
    def __call__(self, x, sample=True):
        from speechbrain_tpu.nnet.linear import Linear

        h = self.encoder(x)
        mean = Linear(self.latent_dim, name="mean")(h)
        log_var = Linear(self.latent_dim, name="log_var")(h)
        if sample:
            rng = self.make_rng("latent")
            eps = jax.random.normal(rng, mean.shape)
            latent_sample = mean + jnp.exp(0.5 * log_var) * eps
        else:
            latent_sample = mean
        rec = self.decoder(latent_sample)
        return VariationalAutoencoderOutput(
            rec=rec, mean=mean, log_var=log_var, latent=mean,
            latent_sample=latent_sample,
        )


class NormalizingAutoencoder(nn.Module):
    """Autoencoder with a normalization of the latent space
    (reference autoencoders.py NormalizingAutoencoder)."""

    encoder: nn.Module
    decoder: nn.Module
    norm_mean: float = 0.0
    norm_std: float = 1.0

    @nn.compact
    def __call__(self, x):
        latent = self.encoder(x)
        mean = jnp.mean(latent, axis=-1, keepdims=True)
        std = jnp.std(latent, axis=-1, keepdims=True) + 1e-8
        latent_n = (latent - mean) / std * self.norm_std + self.norm_mean
        rec = self.decoder(latent_n)
        return AutoencoderOutput(rec=rec, latent=latent_n)
