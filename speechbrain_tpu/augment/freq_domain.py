"""Frequency-domain (spectrogram) augmentations — the SpecAugment family.

Capability parity with the reference's ``speechbrain/augment/freq_domain.py``
(SpectrogramDrop :17, Warping :214, RandomShift :327). RNG is explicit;
masks are computed with static shapes (jit-safe inside compute_forward).
"""

import jax
import jax.numpy as jnp
import numpy as np


class SpectrogramDrop:
    """Drop random time or frequency stripes (SpecAugment masks;
    reference freq_domain.py:17).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> drop = SpectrogramDrop(dim=1, drop_count_high=2)
    >>> x = jnp.ones((2, 50, 40))
    >>> drop(x, rng=jax.random.PRNGKey(0)).shape
    (2, 50, 40)
    """

    def __init__(self, drop_length_low=5, drop_length_high=15,
                 drop_count_low=1, drop_count_high=3, replace="zeros", dim=1):
        self.drop_length_low = drop_length_low
        self.drop_length_high = drop_length_high
        self.drop_count_low = drop_count_low
        self.drop_count_high = drop_count_high
        self.replace = replace
        self.dim = dim

    def __call__(self, spectrogram, rng=None):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        B = spectrogram.shape[0]
        D = spectrogram.shape[self.dim]
        k1, k2, k3 = jax.random.split(rng, 3)
        n_masks = self.drop_count_high
        # sample per-batch, per-mask (start, length); masks beyond the
        # sampled count are disabled (len 0) — static shapes
        count = jax.random.randint(
            k1, (B, 1), self.drop_count_low, self.drop_count_high + 1
        )
        lengths = jax.random.randint(
            k2, (B, n_masks), self.drop_length_low, self.drop_length_high + 1
        )
        active = jnp.arange(n_masks)[None, :] < count
        lengths = jnp.where(active, lengths, 0)
        starts = (
            jax.random.uniform(k3, (B, n_masks))
            * jnp.maximum(D - lengths, 1)
        ).astype(jnp.int32)
        pos = jnp.arange(D)[None, None, :]
        dropped = (pos >= starts[..., None]) & (pos < (starts + lengths)[..., None])
        mask = jnp.any(dropped, axis=1)  # (B, D)
        shape = [1] * spectrogram.ndim
        shape[0] = B
        shape[self.dim] = D
        mask = mask.reshape(shape)
        if self.replace == "mean":
            fill = jnp.mean(spectrogram, axis=(1, 2), keepdims=True)
        else:
            fill = 0.0
        return jnp.where(mask, fill, spectrogram)


class Warping:
    """Time warping along a chosen axis via linear interpolation around a
    random center (reference freq_domain.py:214)."""

    def __init__(self, warp_window=5, warp_mode="bicubic", dim=1):
        self.warp_window = warp_window
        self.dim = dim

    def __call__(self, spectrogram, rng=None):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        T = spectrogram.shape[self.dim]
        if T <= 2 * self.warp_window + 2:
            return spectrogram
        k1, k2 = jax.random.split(rng)
        center = int(
            jax.random.randint(k1, (), self.warp_window + 1, T - self.warp_window - 1)
        )
        shift = int(
            jax.random.randint(k2, (), -self.warp_window, self.warp_window + 1)
        )
        new_center = center + shift
        # piecewise-linear index map (host-computed, static)
        left = np.linspace(0, center, new_center, endpoint=False)
        right = np.linspace(center, T - 1, T - new_center)
        coords = np.concatenate([left, right])
        lo = np.floor(coords).astype(int)
        hi = np.minimum(lo + 1, T - 1)
        frac = jnp.asarray((coords - lo).astype(np.float32))
        x = jnp.moveaxis(spectrogram, self.dim, 1)
        out = x[:, lo] * (1 - frac)[None, :, None] + x[:, hi] * frac[None, :, None]
        return jnp.moveaxis(out, 1, self.dim)


class RandomShift:
    """Roll the signal along time or frequency by a random amount
    (reference freq_domain.py:327)."""

    def __init__(self, min_shift=0, max_shift=0, dim=1):
        self.min_shift = min_shift
        self.max_shift = max_shift
        self.dim = dim

    def __call__(self, waveforms, lengths=None, rng=None):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        shift = int(
            jax.random.randint(rng, (), self.min_shift, self.max_shift + 1)
        )
        return jnp.roll(waveforms, shift, axis=self.dim)
