"""Descript Audio Codec (DAC) — TPU-native flax implementation.

Capability parity with the reference's
``speechbrain/lobes/models/discrete/dac.py`` (VectorQuantize at
dac.py:227, ResidualVectorQuantize at dac.py:376, Snake1d at dac.py:569,
Encoder/Decoder blocks at dac.py:597-884, DAC at dac.py:885), re-designed
for TPU:

- Channels-last ``(B, T, C)`` layouts so convs map onto the MXU directly.
- VQ codebook lookups are one batched matmul over the l2-normalized
  factorized codes (ViT-VQGAN tricks) instead of a cdist kernel.
- Straight-through estimator via ``lax.stop_gradient``.
- Quantizer dropout takes an explicit rng (functional, jit-safe): the
  per-sample number of active codebooks becomes a mask, never a Python
  branch.
- No weight-norm: flax parametrizes convs directly; weight-norm is a
  torch training trick with no XLA benefit.

Pretrained-weight download from the original repo is not available in
this offline environment; ``DAC(load_pretrained=True)`` raises with a
pointer to ``utils.fetching``.
"""

from typing import Optional, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp


def snake(x, alpha):
    """Snake activation ``x + sin^2(alpha x)/alpha`` (reference dac.py:201)."""
    return x + (jnp.sin(alpha * x) ** 2) / (alpha + 1e-9)


class Snake1d(nn.Module):
    """Learned-frequency snake activation over (B, T, C) (reference dac.py:569)."""

    channels: int

    @nn.compact
    def __call__(self, x):
        alpha = self.param(
            "alpha", nn.initializers.ones, (1, 1, self.channels), jnp.float32
        )
        return snake(x, alpha)


class VectorQuantize(nn.Module):
    """Single VQ stage with factorized, l2-normalized codes
    (reference dac.py:227).

    ``__call__(z)`` with ``z: (B, T, D)`` returns
    ``(z_q, commitment_loss, codebook_loss, indices, z_e)`` where losses
    are per-sample ``(B,)`` and ``indices`` is ``(B, T)``.
    """

    input_dim: int
    codebook_size: int
    codebook_dim: int

    def setup(self):
        self.in_proj = nn.Dense(self.codebook_dim, name="in_proj")
        self.out_proj = nn.Dense(self.input_dim, name="out_proj")
        self.codebook = nn.Embed(
            self.codebook_size, self.codebook_dim, name="codebook"
        )

    def __call__(self, z):
        z_e = self.in_proj(z)
        z_q, indices = self.decode_latents(z_e)

        commitment_loss = jnp.mean(
            (z_e - jax.lax.stop_gradient(z_q)) ** 2, axis=(1, 2)
        )
        codebook_loss = jnp.mean(
            (z_q - jax.lax.stop_gradient(z_e)) ** 2, axis=(1, 2)
        )
        z_q = z_e + jax.lax.stop_gradient(z_q - z_e)
        return self.out_proj(z_q), commitment_loss, codebook_loss, indices, z_e

    def decode_latents(self, latents):
        """Nearest codebook entry under cosine similarity: one matmul on
        normalized vectors (MXU-friendly) instead of pairwise distances."""
        enc = latents / (
            jnp.linalg.norm(latents, axis=-1, keepdims=True) + 1e-8
        )
        cb = self.codebook.embedding
        cbn = cb / (jnp.linalg.norm(cb, axis=-1, keepdims=True) + 1e-8)
        sim = jnp.einsum("btd,kd->btk", enc, cbn)
        indices = jnp.argmax(sim, axis=-1)
        return self.decode_code(indices), indices

    def embed_code(self, embed_id):
        return self.codebook(embed_id)

    def decode_code(self, embed_id):
        return self.codebook(embed_id)


class ResidualVectorQuantize(nn.Module):
    """Residual VQ stack (SoundStream; reference dac.py:376).

    ``__call__(z, n_quantizers=None, train=False)`` with ``z: (B, T, D)``
    returns ``(z_q, codes, latents, commitment_loss, codebook_loss)``:
    codes ``(B, N, T)``, latents ``(B, T, sum(codebook_dim))``.
    Quantizer dropout uses the "dropout" rng when ``train=True``.
    """

    input_dim: int = 512
    n_codebooks: int = 9
    codebook_size: int = 1024
    codebook_dim: Union[int, Sequence[int]] = 8
    quantizer_dropout: float = 0.0

    def setup(self):
        dims = self.codebook_dim
        if isinstance(dims, int):
            dims = [dims] * self.n_codebooks
        self._dims = tuple(dims)
        self.quantizers = [
            VectorQuantize(
                self.input_dim, self.codebook_size, dims[i], name=f"vq_{i}"
            )
            for i in range(self.n_codebooks)
        ]

    def __call__(self, z, n_quantizers: Optional[int] = None, train=False):
        B = z.shape[0]
        if n_quantizers is None:
            n_q = jnp.full((B,), self.n_codebooks)
        else:
            n_q = jnp.full((B,), n_quantizers)
        if train and self.quantizer_dropout > 0:
            rng = self.make_rng("dropout")
            r_drop, r_n = jax.random.split(rng)
            rand_n = jax.random.randint(
                r_n, (B,), 1, self.n_codebooks + 1
            )
            use_drop = (
                jax.random.uniform(r_drop, (B,)) < self.quantizer_dropout
            )
            n_q = jnp.where(use_drop, rand_n, self.n_codebooks)

        z_q = jnp.zeros_like(z)
        residual = z
        commitment_loss = jnp.zeros((B,))
        codebook_loss = jnp.zeros((B,))
        codes, latents = [], []
        # static unrolled loop over codebooks: each stage's contribution is
        # masked per-sample (jit-safe, no data-dependent trip count)
        for i, q in enumerate(self.quantizers):
            z_q_i, commit_i, cb_i, idx_i, z_e_i = q(residual)
            mask = (i < n_q).astype(z.dtype)
            z_q = z_q + z_q_i * mask[:, None, None]
            residual = residual - z_q_i
            commitment_loss = commitment_loss + commit_i * mask
            codebook_loss = codebook_loss + cb_i * mask
            codes.append(idx_i)
            latents.append(z_e_i)
        return (
            z_q,
            jnp.stack(codes, axis=1),
            jnp.concatenate(latents, axis=-1),
            jnp.mean(commitment_loss),
            jnp.mean(codebook_loss),
        )

    def from_codes(self, codes):
        """Reconstruct ``z_q`` from code indices ``(B, N, T)``; returns
        ``(z_q, z_p, codes)`` like the reference."""
        z_q = 0.0
        z_ps = []
        n = codes.shape[1]
        for i in range(n):
            z_p_i = self.quantizers[i].decode_code(codes[:, i])
            z_ps.append(z_p_i)
            z_q = z_q + self.quantizers[i].out_proj(z_p_i)
        return z_q, jnp.concatenate(z_ps, axis=-1), codes

    def from_latents(self, latents):
        """Reconstruct ``z_q`` from projected latents ``(B, T, sum(dims))``."""
        z_q = 0.0
        z_ps, code_list = [], []
        offset = 0
        for i, d in enumerate(self._dims):
            if offset >= latents.shape[-1]:
                break
            chunk = latents[..., offset : offset + d]
            z_p_i, idx = self.quantizers[i].decode_latents(chunk)
            z_ps.append(z_p_i)
            code_list.append(idx)
            z_q = z_q + self.quantizers[i].out_proj(z_p_i)
            offset += d
        return z_q, jnp.concatenate(z_ps, axis=-1), jnp.stack(code_list, 1)


class ResidualUnit(nn.Module):
    """Dilated residual conv unit (reference dac.py:597)."""

    dim: int = 16
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        y = Snake1d(self.dim)(x)
        y = nn.Conv(
            self.dim, (7,), kernel_dilation=(self.dilation,), padding="SAME"
        )(y)
        y = Snake1d(self.dim)(y)
        y = nn.Conv(self.dim, (1,))(y)
        return x + y


class EncoderBlock(nn.Module):
    """Three residual units then a strided downsampling conv
    (reference dac.py:637)."""

    dim: int = 16
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        half = self.dim // 2
        x = ResidualUnit(half, dilation=1)(x)
        x = ResidualUnit(half, dilation=3)(x)
        x = ResidualUnit(half, dilation=9)(x)
        x = Snake1d(half)(x)
        return nn.Conv(
            self.dim, (2 * self.stride,), strides=(self.stride,),
            padding="SAME",
        )(x)


class Encoder(nn.Module):
    """Waveform (B, T, 1) -> latents (B, T/prod(strides), d_latent)
    (reference dac.py:682)."""

    d_model: int = 64
    strides: Sequence[int] = (2, 4, 8, 8)
    d_latent: int = 64

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.d_model, (7,), padding="SAME")(x)
        d = self.d_model
        for s in self.strides:
            d *= 2
            x = EncoderBlock(d, stride=s)(x)
        x = Snake1d(d)(x)
        return nn.Conv(self.d_latent, (3,), padding="SAME")(x)


class DecoderBlock(nn.Module):
    """Upsampling transposed conv then residual units (reference dac.py:757)."""

    input_dim: int = 16
    output_dim: int = 8
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        x = Snake1d(self.input_dim)(x)
        x = nn.ConvTranspose(
            self.output_dim, (2 * self.stride,), strides=(self.stride,),
            padding="SAME",
        )(x)
        x = ResidualUnit(self.output_dim, dilation=1)(x)
        x = ResidualUnit(self.output_dim, dilation=3)(x)
        x = ResidualUnit(self.output_dim, dilation=9)(x)
        return x


class Decoder(nn.Module):
    """Latents -> waveform (B, T, 1) (reference dac.py:803)."""

    input_channel: int = 64
    channels: int = 1536
    rates: Sequence[int] = (8, 8, 4, 2)
    d_out: int = 1

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.channels, (7,), padding="SAME")(x)
        d = self.channels
        for r in self.rates:
            x = DecoderBlock(d, d // 2, r)(x)
            d //= 2
        x = Snake1d(d)(x)
        x = nn.Conv(self.d_out, (7,), padding="SAME")(x)
        return jnp.tanh(x)


class DAC(nn.Module):
    """Full DAC codec (reference dac.py:885).

    ``encode(audio)`` -> (z_q, codes, latents, commit, cb);
    ``decode(z_q)`` -> audio; ``__call__`` -> dict with "audio", "z",
    "codes", "latents", "vq/commitment_loss", "vq/codebook_loss".
    Audio is channels-last ``(B, T, 1)``.
    """

    encoder_dim: int = 64
    encoder_rates: Sequence[int] = (2, 4, 8, 8)
    latent_dim: Optional[int] = None
    decoder_dim: int = 1536
    decoder_rates: Sequence[int] = (8, 8, 4, 2)
    n_codebooks: int = 9
    codebook_size: int = 1024
    codebook_dim: int = 8
    quantizer_dropout: float = 0.0
    sample_rate: int = 44100
    load_pretrained: bool = False

    def setup(self):
        if self.load_pretrained:
            raise NotImplementedError(
                "Pretrained DAC weights are not bundled; fetch a converted "
                "checkpoint with speechbrain_tpu.utils.fetching and load via "
                "utils.torch_convert."
            )
        ld = self.latent_dim
        if ld is None:
            ld = self.encoder_dim * (2 ** len(self.encoder_rates))
        self._latent_dim = ld
        self.encoder = Encoder(
            self.encoder_dim, self.encoder_rates, ld, name="encoder"
        )
        self.quantizer = ResidualVectorQuantize(
            input_dim=ld,
            n_codebooks=self.n_codebooks,
            codebook_size=self.codebook_size,
            codebook_dim=self.codebook_dim,
            quantizer_dropout=self.quantizer_dropout,
            name="quantizer",
        )
        self.decoder = Decoder(
            ld, self.decoder_dim, self.decoder_rates, name="decoder"
        )

    @property
    def hop_length(self):
        h = 1
        for s in self.encoder_rates:
            h *= s
        return h

    def encode(self, audio_data, n_quantizers=None, train=False):
        z = self.encoder(audio_data)
        return self.quantizer(z, n_quantizers, train=train)

    def decode(self, z):
        return self.decoder(z)

    def __call__(self, audio_data, n_quantizers=None, train=False):
        z, codes, latents, commit, cb = self.encode(
            audio_data, n_quantizers, train=train
        )
        audio = self.decode(z)
        return {
            "audio": audio,
            "z": z,
            "codes": codes,
            "latents": latents,
            "vq/commitment_loss": commit,
            "vq/codebook_loss": cb,
        }
