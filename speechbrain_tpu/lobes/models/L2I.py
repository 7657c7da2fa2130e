"""Listen-to-Interpret (L2I) interpretability models.

Capability parity with the reference's ``speechbrain/lobes/models/L2I.py``
(Psi at L2I.py:15, NMFDecoderAudio at L2I.py:117, PsiOptimized at
L2I.py:194, Theta at L2I.py:288, NMFEncoder at L2I.py:341,
CNN14PSI_stft at L2I.py:388, CNN14PSI_stft_2d at L2I.py:480),
re-designed for TPU: channels-last 2-D layouts (B, H, W, C),
``jax.image.resize`` for bilinear upsampling, flax BatchNorm with
explicit ``train`` flags.
"""

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def _upsample2(x):
    """2x bilinear upsampling over the two spatial dims of (B, H, W, C)."""
    B, H, W, C = x.shape
    return jax.image.resize(x, (B, 2 * H, 2 * W, C), "bilinear")


class Psi(nn.Module):
    """NMF time activations from three classifier representations
    (reference L2I.py:15).

    Input: list of three (B, H, W, C_i) maps with C = ``in_emb_dims``;
    output: (B, n_comp, T).
    """

    n_comp: int = 100
    T: int = 431
    in_emb_dims: Sequence[int] = (2048, 1024, 512)

    @nn.compact
    def __call__(self, inp, train=False):
        for i, d in enumerate(self.in_emb_dims):
            if inp[i].shape[-1] != d:
                raise ValueError(
                    f"channels of inp[{i}] ({inp[i].shape[-1]}) do not match "
                    f"in_emb_dims ({d})"
                )
        x1, x2, x3 = inp
        out_c = min(self.in_emb_dims)

        x1 = _upsample2(x1)
        x2 = _upsample2(x2)
        x1 = nn.relu(nn.Conv(out_c, (3, 3), padding="SAME", name="c1")(x1))
        x2 = nn.relu(nn.Conv(out_c, (3, 3), padding="SAME", name="c2")(x2))
        # land exactly on the fine map's grid (the reference pads one
        # frequency column for CNN14's odd grid, ref L2I.py:15; a resize
        # covers every grid parity)
        B, H3, W3, _ = x3.shape
        x1 = jax.image.resize(x1, (B, H3, W3, x1.shape[-1]), "bilinear")
        x2 = jax.image.resize(x2, (B, H3, W3, x2.shape[-1]), "bilinear")
        x = jnp.concatenate([x1, x2, x3], axis=-1)

        # stretch time to T and collapse the frequency axis
        B, _, _, C = x.shape
        x = jax.image.resize(x, (B, self.T, 1, C), "bilinear")
        x = nn.Conv(out_c, (3, 3), padding="SAME", name="mix")(x)
        x = nn.BatchNorm(use_running_average=not train, name="bn")(x)
        x = nn.relu(x)
        x = nn.relu(
            nn.Conv(self.n_comp, (3, 3), padding="SAME", name="out_conv")(x)
        )
        return jnp.moveaxis(x[:, :, 0, :], 1, 2)  # (B, n_comp, T)


class NMFDecoderAudio(nn.Module):
    """NMF decoder: activations (B, n_comp, T) -> spectrogram
    (B, n_freq, T) via a learned nonnegative dictionary
    (reference L2I.py:117)."""

    n_comp: int = 100
    n_freq: int = 513

    @nn.compact
    def __call__(self, H):
        W = self.param(
            "W",
            lambda k, s: 0.1 * jax.random.uniform(k, s),
            (self.n_freq, self.n_comp),
        )
        H = nn.relu(H)
        return jnp.einsum("ij,bjk->bik", nn.relu(W), H)

    def return_W(self, params):
        """The nonnegative NMF dictionary."""
        return nn.relu(params["params"]["W"])


class Theta(nn.Module):
    """Linear classifier over NMF activations: attention-pool the time
    axis, then softmax classify (reference L2I.py:288)."""

    n_comp: int = 100
    T: int = 431
    num_classes: int = 50

    @nn.compact
    def __call__(self, H):
        pooled = nn.Dense(1, use_bias=False, name="hard_att")(H)[:, :, 0]
        logits = nn.Dense(
            self.num_classes, use_bias=False, name="classifier"
        )(pooled)
        return jax.nn.softmax(logits, axis=1)


class NMFEncoder(nn.Module):
    """Convolutional NMF encoder: (B, n_freq, T) -> (B, n_comp, T)
    (reference L2I.py:341)."""

    n_freq: int = 513
    n_comp: int = 100

    @nn.compact
    def __call__(self, X):
        x = jnp.moveaxis(X, 1, 2)  # (B, T, n_freq) channels-last
        for ch in (256, 128, self.n_comp):
            x = nn.relu(nn.Conv(ch, (8,), padding="SAME")(x))
        return jnp.moveaxis(x, 1, 2)


class PsiOptimized(nn.Module):
    """Transposed-conv decoder estimating NMF activations from latent
    classifier representations, for log-spectra (reference L2I.py:194).

    Input (B, H, W, C=dim); returns ``(activations (B, T', K, 1),
    adapted_reps)``.
    """

    dim: int = 128
    K: int = 100
    numclasses: int = 50
    use_adapter: bool = False
    adapter_reduce_dim: bool = True

    @nn.compact
    def __call__(self, hs, train=False):
        from speechbrain_tpu.lobes.models.PIQ import ResBlockAudio

        hcat = ResBlockAudio(self.dim, name="adapter")(hs, train=train) \
            if self.use_adapter else hs
        x = hcat
        if self.use_adapter and self.adapter_reduce_dim:
            hcat = nn.Conv(self.dim, (4, 4), strides=(2, 2), padding=1,
                           name="down")(hcat)
            x = nn.ConvTranspose(self.dim, (4, 4), strides=(2, 2),
                                 padding="SAME", name="up")(hcat)
        for i, (k, s) in enumerate([(3, 2), (4, 2), (4, 2), (4, 2)]):
            x = nn.ConvTranspose(
                self.dim, (k, k), strides=(s, s), padding="SAME",
                name=f"dec{i}",
            )(x)
            x = nn.relu(x)
            x = nn.BatchNorm(use_running_average=not train,
                             name=f"dec_bn{i}")(x)
        x = nn.relu(
            nn.ConvTranspose(1, (12, 12), padding="SAME", name="dec_out")(x)
        )
        x = nn.relu(nn.Dense(self.K, name="to_comp")(x[..., 0]))
        return x[..., None], hcat


class CNN14PSI_stft(nn.Module):
    """Saliency map on the STFT grid from CNN14 feature maps
    (reference L2I.py:388): fuse multi-resolution maps with transposed
    convs, sigmoid-bounded output (B, F, T, 1)."""

    dim: int = 128
    K: int = 1

    @nn.compact
    def __call__(self, hs, train=False):
        # hs: list of CNN14 feature maps, coarsest first, channels-last
        x = None
        for i, h in enumerate(hs):
            h = nn.relu(
                nn.ConvTranspose(
                    self.dim // 2, (3, 3), strides=(2, 2), padding="SAME",
                    name=f"in{i}",
                )(h)
            )
            if x is None:
                x = h
            else:
                B, H, W, C = h.shape
                x = jax.image.resize(x, (B, H, W, x.shape[-1]), "bilinear")
                x = jnp.concatenate([x, h], axis=-1)
                x = nn.relu(
                    nn.Conv(self.dim // 2, (3, 3), padding="SAME",
                            name=f"fuse{i}")(x)
                )
        x = nn.ConvTranspose(self.K, (7, 7), strides=(2, 2), padding="SAME",
                             name="out")(x)
        return jax.nn.sigmoid(x)


class CNN14PSI_stft_2d(CNN14PSI_stft):
    """2-D variant of the STFT saliency estimator (reference L2I.py:480);
    identical fusion topology, kept as a distinct class for hparams
    compatibility."""
