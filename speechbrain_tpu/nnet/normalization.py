"""Normalization layers.

Capability parity with the reference's ``speechbrain/nnet/normalization.py``
(BatchNorm1d :13, BatchNorm2d, LayerNorm, InstanceNorm1d/2d, GroupNorm,
ExponentialMovingAverage :472, PCEN :557). Batch statistics live in the
"batch_stats" mutable collection (flax convention) — they ride in the
Brain's model_state pytree and checkpoint with it. On multi-device data
parallelism, flax's BatchNorm cross-replica axis_name gives SyncBatchNorm
semantics for free (reference _wrap_distributed's convert_sync_batchnorm).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp


class BatchNorm1d(nn.Module):
    """BatchNorm over the channel (last) axis of (batch, time, channel)
    or (batch, channel) inputs.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> bn = BatchNorm1d()
    >>> x = jnp.ones((8, 120, 40))
    >>> vars_ = bn.init(jax.random.PRNGKey(0), x, train=False)
    >>> bn.apply(vars_, x, train=False).shape
    (8, 120, 40)
    """

    eps: float = 1e-5
    momentum: float = 0.9  # running-stat decay (torch momentum 0.1 ≡ 0.9 here)
    affine: bool = True
    axis_name: str = None  # set to mesh axis for sync-BN across devices

    @nn.compact
    def __call__(self, x, train=True):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=self.eps,
            use_bias=self.affine,
            use_scale=self.affine,
            axis_name=self.axis_name,
        )(x)


class BatchNorm2d(BatchNorm1d):
    """BatchNorm for (batch, time, feat, channel) inputs (NHWC)."""


class LayerNorm(nn.Module):
    """LayerNorm over the trailing feature axes
    (reference nnet/normalization.py:158).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> ln = LayerNorm()
    >>> x = jnp.ones((4, 10, 40))
    >>> p = ln.init(jax.random.PRNGKey(0), x)
    >>> ln.apply(p, x).shape
    (4, 10, 40)
    """

    eps: float = 1e-05
    elementwise_affine: bool = True

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(
            epsilon=self.eps,
            use_bias=self.elementwise_affine,
            use_scale=self.elementwise_affine,
        )(x)


class InstanceNorm1d(nn.Module):
    """Per-sample, per-channel normalization over time
    (reference nnet/normalization.py:262)."""

    eps: float = 1e-05
    affine: bool = False
    track_running_stats: bool = False

    @nn.compact
    def __call__(self, x):
        mean = jnp.mean(x, axis=1, keepdims=True)
        var = jnp.var(x, axis=1, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        if self.affine:
            scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
            bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
            y = y * scale + bias
        return y


class InstanceNorm2d(nn.Module):
    """Instance norm over (time, feat) of NHWC inputs."""

    eps: float = 1e-05
    affine: bool = False

    @nn.compact
    def __call__(self, x):
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        if self.affine:
            scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
            bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
            y = y * scale + bias
        return y


class GroupNorm(nn.Module):
    """GroupNorm over channel groups (reference nnet/normalization.py:397)."""

    num_groups: int = 32
    eps: float = 1e-05
    affine: bool = True

    @nn.compact
    def __call__(self, x):
        return nn.GroupNorm(
            num_groups=self.num_groups,
            epsilon=self.eps,
            use_bias=self.affine,
            use_scale=self.affine,
        )(x)


class ExponentialMovingAverage(nn.Module):
    """First-order lowpass s[t] = w*x[t] + (1-w)*s[t-1] with a learnable
    (clamped) smoothing coefficient, over time via lax.scan — the PCEN
    smoother (reference nnet/normalization.py:472)."""

    coeff_init: float = 0.04
    per_channel: bool = False
    trainable: bool = True

    @nn.compact
    def __call__(self, x):
        # x: (batch, time, channel)
        shape = (x.shape[-1],) if self.per_channel else (1,)
        weights = self.param(
            "weights", nn.initializers.constant(self.coeff_init), shape
        )
        w = jnp.clip(weights, 0.0, 1.0)

        def step(prev, xt):
            s = w * xt + (1.0 - w) * prev
            return s, s

        initial = x[:, 0, :]
        _, out = jax.lax.scan(step, initial, jnp.moveaxis(x, 1, 0))
        return jnp.moveaxis(out, 0, 1)


class PCEN(nn.Module):
    """Per-Channel Energy Normalization (trainable; reference
    nnet/normalization.py:557):  (x / (eps + EMA(x))^alpha + delta)^r - delta^r.
    """

    alpha: float = 0.96
    smooth_coef: float = 0.04
    delta: float = 2.0
    root: float = 2.0
    floor: float = 1e-12
    trainable: bool = True
    per_channel_smooth_coef: bool = True

    @nn.compact
    def __call__(self, x):
        n_ch = x.shape[-1]
        alpha = self.param(
            "alpha", nn.initializers.constant(self.alpha), (n_ch,)
        )
        delta = self.param(
            "delta", nn.initializers.constant(self.delta), (n_ch,)
        )
        root = self.param("root", nn.initializers.constant(self.root), (n_ch,))
        ema = ExponentialMovingAverage(
            coeff_init=self.smooth_coef,
            per_channel=self.per_channel_smooth_coef,
            trainable=self.trainable,
            name="ema",
        )(x)
        alpha = jnp.minimum(alpha, 1.0)
        root = jnp.maximum(root, 1.0)
        one_over_root = 1.0 / root
        return (
            x / (self.floor + ema) ** alpha + delta
        ) ** one_over_root - delta**one_over_root
