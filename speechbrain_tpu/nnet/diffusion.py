"""Denoising diffusion.

Capability parity with the reference's ``speechbrain/nnet/diffusion.py``
(Diffuser :24, DenoisingDiffusion :131, GaussianNoise, LatentDiffusion
:360): DDPM-style forward noising, training-sample generation, and
ancestral sampling — rng-explicit and scan-based (the reference's Python
sampling loop becomes a lax.scan over timesteps).
"""

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def linear_beta_schedule(timesteps, beta_start=0.0001, beta_end=0.02):
    """Linear beta noise schedule over ``timesteps``."""
    return np.linspace(beta_start, beta_end, timesteps, dtype=np.float32)


class Diffuser:
    """Base diffusion utility (reference diffusion.py:24): add noise at a
    sampled timestep; subclasses implement distort/train_sample."""

    def __init__(self, model, timesteps=1000, noise=None):
        self.model = model
        self.timesteps = timesteps

    def distort(self, x, rng, timesteps=None):
        raise NotImplementedError

    def train_sample(self, x, rng, **kwargs):
        """Returns (noisy, noise, timesteps) for a training step."""
        k1, k2 = jax.random.split(rng)
        t = jax.random.randint(k1, (x.shape[0],), 0, self.timesteps)
        noisy, noise = self.distort(x, k2, t)
        return noisy, noise, t


class DenoisingDiffusion(Diffuser):
    """DDPM (reference diffusion.py:131).

    ``model(x, t)`` predicts the noise eps.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> dd = DenoisingDiffusion(model=lambda x, t: jnp.zeros_like(x), timesteps=10)
    >>> x = jnp.ones((2, 8))
    >>> noisy, noise, t = dd.train_sample(x, jax.random.PRNGKey(0))
    >>> noisy.shape
    (2, 8)
    """

    def __init__(self, model, timesteps=1000, noise=None, beta_start=0.0001,
                 beta_end=0.02, sample_min=None, sample_max=None,
                 show_progress=False):
        super().__init__(model, timesteps)
        betas = linear_beta_schedule(timesteps, beta_start, beta_end)
        alphas = 1.0 - betas
        self.betas = jnp.asarray(betas)
        self.alphas_cumprod = jnp.asarray(np.cumprod(alphas))
        self.sqrt_ac = jnp.sqrt(self.alphas_cumprod)
        self.sqrt_one_minus_ac = jnp.sqrt(1.0 - self.alphas_cumprod)
        self.sample_min = sample_min
        self.sample_max = sample_max

    def distort(self, x, rng, timesteps=None):
        """q(x_t | x_0): returns (noisy_x, noise)."""
        if timesteps is None:
            timesteps = jnp.full((x.shape[0],), self.timesteps - 1, jnp.int32)
        noise = jax.random.normal(rng, x.shape)
        shape = (-1,) + (1,) * (x.ndim - 1)
        sqrt_ac = self.sqrt_ac[timesteps].reshape(shape)
        sqrt_om = self.sqrt_one_minus_ac[timesteps].reshape(shape)
        return sqrt_ac * x + sqrt_om * noise, noise

    def sample(self, shape, rng, model=None, **model_kwargs):
        """Ancestral sampling x_T -> x_0 as one lax.scan."""
        model = model or self.model
        k0, rng = jax.random.split(rng)
        x_init = jax.random.normal(k0, shape)
        betas = self.betas
        alphas = 1.0 - betas
        ac = self.alphas_cumprod

        def step(x, inputs):
            t, key = inputs
            eps = model(x, jnp.full((shape[0],), t, jnp.int32), **model_kwargs)
            coef = betas[t] / jnp.sqrt(1.0 - ac[t])
            mean = (x - coef * eps) / jnp.sqrt(alphas[t])
            noise = jax.random.normal(key, shape)
            sigma = jnp.sqrt(betas[t])
            x_new = mean + jnp.where(t > 0, sigma, 0.0) * noise
            if self.sample_min is not None or self.sample_max is not None:
                x_new = jnp.clip(x_new, self.sample_min, self.sample_max)
            return x_new, None

        ts = jnp.arange(self.timesteps - 1, -1, -1)
        keys = jax.random.split(rng, self.timesteps)
        x_final, _ = jax.lax.scan(step, x_init, (ts, keys))
        return x_final


class LatentDiffusion(DenoisingDiffusion):
    """Diffusion in an autoencoder's latent space (reference :360)."""

    def __init__(self, autoencoder, model, timesteps=1000, **kwargs):
        super().__init__(model, timesteps, **kwargs)
        self.autoencoder = autoencoder

    def train_sample_latent(self, x, rng, **kwargs):
        latent = self.autoencoder.encode(x)
        return super().train_sample(latent, rng, **kwargs), latent

    def decode_sample(self, latent):
        return self.autoencoder.decode(latent)
