"""1-D Focal Modulation networks for neural audio codecs.

Capability parity with the FocalCodec compressor/decompressor the
reference's LibriTTS focalcodec recipes import from the external
``focalcodec`` pip package (``focalcodec.focalnet.FocalEncoder`` /
``FocalDecoder``, used by reference
``recipes/LibriTTS/focalcodec/train_quantizer.py``): focal modulation
(Yang et al. 2022) replaces attention — a query is multiplicatively
modulated by hierarchically gated depthwise-conv context at growing
receptive fields plus a global level. Re-expressed natively for TPU:
every op is a conv/matmul over static shapes, no gather/attention, so
XLA maps the whole stack onto the MXU.

Layout is (B, T, C) throughout (lax.conv via flax nn.Conv).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from speechbrain_tpu.nnet.linear import Linear


class FocalModulation1d(nn.Module):
    """Focal modulation over time: out = proj(q(x) * modulator(ctx)).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> m = FocalModulation1d(dim=16)
    >>> x = jnp.ones((2, 20, 16))
    >>> p = m.init(jax.random.PRNGKey(0), x)
    >>> m.apply(p, x).shape
    (2, 20, 16)
    """

    dim: int
    focal_window: int = 7
    focal_level: int = 2
    focal_factor: int = 2
    normalize_modulator: bool = False
    causal: bool = False

    @nn.compact
    def __call__(self, x):
        B, T, C = x.shape
        f = Linear(2 * self.dim + self.focal_level + 1, name="f")(x)
        q, ctx, gates = jnp.split(
            f, [self.dim, 2 * self.dim], axis=-1
        )
        ctx_all = jnp.zeros_like(ctx)
        for level in range(self.focal_level):
            k = self.focal_factor * level + self.focal_window
            pad = ((k - 1, 0),) if self.causal else "SAME"
            ctx = nn.Conv(
                features=self.dim, kernel_size=(k,),
                feature_group_count=self.dim, padding=pad, use_bias=False,
                name=f"focal_conv_{level}",
            )(ctx)
            ctx = jax.nn.gelu(ctx)
            ctx_all = ctx_all + ctx * gates[..., level : level + 1]
        # global (sequence-mean) context level
        glob = jax.nn.gelu(jnp.mean(ctx, axis=1, keepdims=True))
        ctx_all = ctx_all + glob * gates[..., self.focal_level :]
        if self.normalize_modulator:
            ctx_all = ctx_all / (self.focal_level + 1)
        modulator = nn.Conv(
            features=self.dim, kernel_size=(1,), name="h"
        )(ctx_all)
        return Linear(self.dim, name="proj")(q * modulator)


class FocalBlock1d(nn.Module):
    """Pre-norm focal modulation + MLP, each with residual and
    optional LayerScale."""

    dim: int
    focal_window: int = 7
    focal_level: int = 2
    focal_factor: int = 2
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    use_post_norm: bool = False
    use_layerscale: bool = False
    layerscale_init: float = 1e-4
    normalize_modulator: bool = False
    causal: bool = False

    @nn.compact
    def __call__(self, x, train=False):
        def scaled(name, y):
            if not self.use_layerscale:
                return y
            gamma = self.param(
                name, nn.initializers.constant(self.layerscale_init),
                (self.dim,),
            )
            return gamma * y

        h = x if self.use_post_norm else nn.LayerNorm(name="norm1")(x)
        h = FocalModulation1d(
            dim=self.dim, focal_window=self.focal_window,
            focal_level=self.focal_level, focal_factor=self.focal_factor,
            normalize_modulator=self.normalize_modulator,
            causal=self.causal, name="modulation",
        )(h)
        if self.use_post_norm:
            h = nn.LayerNorm(name="norm1")(h)
        x = x + scaled("gamma1", h)

        h = x if self.use_post_norm else nn.LayerNorm(name="norm2")(x)
        h = Linear(int(self.dim * self.mlp_ratio), name="mlp_in")(h)
        h = jax.nn.gelu(h)
        if train and self.dropout > 0:
            h = nn.Dropout(rate=self.dropout, deterministic=False)(h)
        h = Linear(self.dim, name="mlp_out")(h)
        if self.use_post_norm:
            h = nn.LayerNorm(name="norm2")(h)
        return x + scaled("gamma2", h)


class _FocalStack(nn.Module):
    """Shared staged encoder/decoder body: per stage, a channel
    projection, a time rescale, and one focal block."""

    hidden_dims: tuple
    scale_factors: tuple
    upsample: bool  # False: strided downsample; True: repeat upsample
    focal_window: int = 7
    focal_level: int = 2
    focal_factor: int = 2
    dropout: float = 0.0
    use_post_norm: bool = False
    use_layerscale: bool = False
    layerscale_init: float = 1e-4
    normalize_modulator: bool = False
    causal: bool = False

    @nn.compact
    def __call__(self, x, train=False):
        for i, (dim, k) in enumerate(
            zip(self.hidden_dims, self.scale_factors)
        ):
            if k > 1 and self.upsample:
                x = jnp.repeat(x, k, axis=1)
            stride = 1 if (self.upsample or k <= 1) else k
            x = nn.Conv(
                features=dim, kernel_size=(max(2 * k, 3),),
                strides=(stride,), padding="SAME", name=f"stage_proj_{i}",
            )(x)
            x = FocalBlock1d(
                dim=dim, focal_window=self.focal_window,
                focal_level=self.focal_level,
                focal_factor=self.focal_factor, dropout=self.dropout,
                use_post_norm=self.use_post_norm,
                use_layerscale=self.use_layerscale,
                layerscale_init=self.layerscale_init,
                normalize_modulator=self.normalize_modulator,
                causal=self.causal, name=f"block_{i}",
            )(x, train=train)
        return x


class FocalEncoder(nn.Module):
    """FocalCodec compressor: (B, T, input_dim) SSL features ->
    (B, T', output_dim) latents on a tanh-bounded range (ready for
    spherical quantization).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> enc = FocalEncoder(input_dim=8, output_dim=4, hidden_dims=(16, 8))
    >>> x = jnp.ones((2, 12, 8))
    >>> p = enc.init(jax.random.PRNGKey(0), x)
    >>> enc.apply(p, x).shape
    (2, 12, 4)
    """

    input_dim: int
    output_dim: int
    hidden_dims: tuple = (1024, 512, 256)
    downscale_factors: tuple = (1, 1, 1)
    focal_window: int = 7
    focal_level: int = 2
    focal_factor: int = 2
    dropout: float = 0.0
    use_post_norm: bool = False
    use_layerscale: bool = False
    layerscale_init: float = 1e-4
    tanhscale_init: float = 0.5
    normalize_modulator: bool = False
    causal: bool = False

    @nn.compact
    def __call__(self, x, train=False):
        x = _FocalStack(
            hidden_dims=tuple(self.hidden_dims),
            scale_factors=tuple(self.downscale_factors),
            upsample=False, focal_window=self.focal_window,
            focal_level=self.focal_level, focal_factor=self.focal_factor,
            dropout=self.dropout, use_post_norm=self.use_post_norm,
            use_layerscale=self.use_layerscale,
            layerscale_init=self.layerscale_init,
            normalize_modulator=self.normalize_modulator,
            causal=self.causal, name="stack",
        )(x, train=train)
        x = Linear(self.output_dim, name="out")(x)
        scale = self.param(
            "tanh_scale", nn.initializers.constant(self.tanhscale_init),
            (),
        )
        return jnp.tanh(scale * x)


class FocalDecoder(nn.Module):
    """FocalCodec decompressor: (B, T', input_dim) quantized codes ->
    (B, T, output_dim) reconstructed SSL features.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> dec = FocalDecoder(input_dim=4, output_dim=8, hidden_dims=(8, 16))
    >>> x = jnp.ones((2, 12, 4))
    >>> p = dec.init(jax.random.PRNGKey(0), x)
    >>> dec.apply(p, x).shape
    (2, 12, 8)
    """

    input_dim: int
    output_dim: int
    hidden_dims: tuple = (256, 512, 1024)
    upscale_factors: tuple = (1, 1, 1)
    focal_window: int = 7
    focal_level: int = 2
    focal_factor: int = 2
    dropout: float = 0.0
    use_post_norm: bool = False
    use_layerscale: bool = False
    layerscale_init: float = 1e-4
    normalize_modulator: bool = False
    causal: bool = False

    @nn.compact
    def __call__(self, x, train=False):
        x = _FocalStack(
            hidden_dims=tuple(self.hidden_dims),
            scale_factors=tuple(self.upscale_factors),
            upsample=True, focal_window=self.focal_window,
            focal_level=self.focal_level, focal_factor=self.focal_factor,
            dropout=self.dropout, use_post_norm=self.use_post_norm,
            use_layerscale=self.use_layerscale,
            layerscale_init=self.layerscale_init,
            normalize_modulator=self.normalize_modulator,
            causal=self.causal, name="stack",
        )(x, train=train)
        return Linear(self.output_dim, name="out")(x)


class FocalNetEncoder(nn.Module):
    """Focal-modulation classification encoder: (B, T, F) spectrogram
    frames -> (B, T', hidden_dims[-1]) embeddings for a pooled
    classifier head.

    The reference's ESC50 focalnet configs wrap a pretrained 2-D
    ``transformers.FocalNetBackbone`` over spectrogram images (ref
    recipes/ESC50/classification/hparams/focalnet.yaml:98); here the
    same focal-modulation mechanism runs natively over the time axis
    with the full mel band as channel features — no image resize, no
    pretrained-vision dependency.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> enc = FocalNetEncoder(hidden_dims=(16, 8), downscale_factors=(2, 2))
    >>> x = jnp.ones((2, 20, 40))
    >>> p = enc.init(jax.random.PRNGKey(0), x)
    >>> enc.apply(p, x).shape
    (2, 5, 8)
    """

    hidden_dims: tuple = (96, 192, 384, 768)
    downscale_factors: tuple = (2, 2, 2, 2)
    focal_window: int = 7
    focal_level: int = 2
    focal_factor: int = 2
    dropout: float = 0.0
    # return (emb, [map (B, T', 1, D)]) for the interpretability heads
    return_reps: bool = False

    @nn.compact
    def __call__(self, x, train=False):
        out = _FocalStack(
            hidden_dims=tuple(self.hidden_dims),
            scale_factors=tuple(self.downscale_factors),
            upsample=False,
            focal_window=self.focal_window,
            focal_level=self.focal_level,
            focal_factor=self.focal_factor,
            dropout=self.dropout,
            name="stack",
        )(x, train=train)
        if self.return_reps:
            return out, [out[:, :, None, :]]
        return out
