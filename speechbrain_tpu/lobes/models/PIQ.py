"""Posthoc Interpretation via Quantization (PIQ).

Capability parity with the reference's ``speechbrain/lobes/models/PIQ.py``
(get_irrelevant_regions at PIQ.py:13, VectorQuantization at PIQ.py:93,
VectorQuantizationStraightThrough at PIQ.py:191, Conv2dEncoder_v2 at
PIQ.py:296, ResBlockAudio at PIQ.py:362, VectorQuantizedPSI_Audio at
PIQ.py:403, VQEmbedding at PIQ.py:591), re-designed for TPU:

- Channels-last (B, H, W, C) layouts.
- The custom autograd ``Function`` pair becomes a plain
  ``lax.stop_gradient`` straight-through estimator.
- Class-partitioned quantization masks distances with ``jnp.where``
  (one fused select) instead of indexing.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp


def get_irrelevant_regions(labels, K, num_classes, N_shared=5,
                           stage="TRAIN"):
    """Binary (B, K) matrix marking VQ dictionary keys irrelevant to each
    label (reference PIQ.py:13). Shared keys are irrelevant during TRAIN
    and relevant otherwise."""
    uniform = jnp.round(
        jnp.linspace(-0.5, num_classes - 0.51, K - N_shared)
    )
    irrelevant = uniform[None, :] != labels[:, None]
    shared_val = stage == "TRAIN"
    shared = jnp.full((labels.shape[0], N_shared), shared_val, bool)
    return jnp.concatenate([irrelevant, shared], axis=1)


def vector_quantization(z_e, codebook, labels=None, num_classes=50,
                        activate_class_partitioning=True, shared_keys=0,
                        stage="TRAIN"):
    """Nearest-neighbour code indices for (..., D) inputs
    (reference VectorQuantization at PIQ.py:93); distances to keys in a
    label's irrelevant region are pushed to +inf."""
    flat = z_e.reshape(-1, z_e.shape[-1])
    d2 = (
        jnp.sum(flat**2, -1, keepdims=True)
        - 2 * flat @ codebook.T
        + jnp.sum(codebook**2, -1)[None]
    )
    if labels is not None and activate_class_partitioning:
        K = codebook.shape[0]
        irr = get_irrelevant_regions(
            labels, K, num_classes, shared_keys, stage
        )
        per_sample = z_e.size // (z_e.shape[0] * z_e.shape[-1])
        irr = jnp.repeat(irr, per_sample, axis=0)
        d2 = jnp.where(irr, jnp.inf, d2)
    idx = jnp.argmin(d2, axis=-1)
    return idx.reshape(z_e.shape[:-1])


def vq_straight_through(z_e, codebook, labels=None, num_classes=50,
                        activate_class_partitioning=True, shared_keys=0,
                        stage="TRAIN"):
    """Straight-through VQ (reference PIQ.py:191): returns
    ``(z_q_st, z_q, indices)`` where z_q_st carries encoder gradients."""
    idx = vector_quantization(
        z_e, codebook, labels, num_classes,
        activate_class_partitioning, shared_keys, stage,
    )
    z_q = codebook[idx]
    z_q_st = z_e + jax.lax.stop_gradient(z_q - z_e)
    return z_q_st, z_q, idx


class VQEmbedding(nn.Module):
    """VQ dictionary with optional class partitioning
    (reference PIQ.py:591)."""

    K: int = 512
    D: int = 128
    numclasses: int = 50
    activate_class_partitioning: bool = True
    shared_keys: int = 0

    def setup(self):
        self.embedding = self.param(
            "embedding",
            lambda k, s: jax.random.uniform(
                k, s, minval=-1.0 / self.K, maxval=1.0 / self.K
            ),
            (self.K, self.D),
        )

    def __call__(self, z_e_x, labels=None, stage="TRAIN"):
        return vector_quantization(
            z_e_x, self.embedding, labels, self.numclasses,
            self.activate_class_partitioning, self.shared_keys, stage,
        )

    def straight_through(self, z_e_x, labels=None, stage="TRAIN"):
        z_q_st, z_q, _ = vq_straight_through(
            z_e_x, jax.lax.stop_gradient(self.embedding), labels,
            self.numclasses, self.activate_class_partitioning,
            self.shared_keys, stage,
        )
        # re-select against the live table so the codebook gets gradients
        idx = vector_quantization(
            z_e_x, jax.lax.stop_gradient(self.embedding), labels,
            self.numclasses, self.activate_class_partitioning,
            self.shared_keys, stage,
        )
        z_q_bar = self.embedding[idx]
        return z_q_st, z_q_bar


class ResBlockAudio(nn.Module):
    """Conv residual block (reference PIQ.py:362)."""

    dim: int

    @nn.compact
    def __call__(self, x, train=False):
        h = nn.relu(x)
        h = nn.Conv(self.dim, (3, 3), padding="SAME")(h)
        h = nn.BatchNorm(use_running_average=not train)(h)
        h = nn.relu(h)
        h = nn.Conv(self.dim, (1, 1))(h)
        h = nn.BatchNorm(use_running_average=not train)(h)
        return x + h


class Conv2dEncoder_v2(nn.Module):
    """Log-spectrogram (B, T, F) -> embeddings (B, T/16, F/16, dim)
    (reference PIQ.py:296). ``return_reps=True`` additionally returns
    the three coarsest stage maps (coarse -> fine) for the
    interpretability heads — the Cnn14 ``(emb, reps)`` convention."""

    dim: int = 256
    return_reps: bool = False

    @nn.compact
    def __call__(self, x, train=False):
        x = x[..., None]
        reps = []
        for i in range(4):
            x = nn.Conv(self.dim, (4, 4), strides=(2, 2), padding=1,
                        name=f"conv{i+1}")(x)
            x = nn.BatchNorm(use_running_average=not train,
                             name=f"bn{i+1}")(x)
            x = nn.relu(x)
            reps.append(x)
        out = ResBlockAudio(self.dim, name="resblock")(x, train=train)
        if self.return_reps:
            return out, [out, reps[-1], reps[-2]]
        return out


class VectorQuantizedPSI_Audio(nn.Module):
    """Reconstruct log-power spectrograms from quantized classifier
    representations (reference PIQ.py:403).

    ``__call__(hs, labels)`` with hs (B, H, W, dim) returns
    ``(logspectra, hcat, z_q)``.
    """

    dim: int = 128
    K: int = 512
    numclasses: int = 50
    activate_class_partitioning: bool = True
    shared_keys: int = 0
    use_adapter: bool = True
    adapter_reduce_dim: bool = True

    def setup(self):
        self.codebook = VQEmbedding(
            self.K, self.dim, numclasses=self.numclasses,
            activate_class_partitioning=self.activate_class_partitioning,
            shared_keys=self.shared_keys, name="codebook",
        )
        if self.use_adapter:
            self.adapter = ResBlockAudio(self.dim, name="adapter")
            if self.adapter_reduce_dim:
                # SAME keeps ceil(n/2) spatial dims — the reference's
                # k4/s2/p1 halving floors to ZERO on 1-wide classifier
                # maps (empty tensors poison the VQ loss with NaN)
                self.down = nn.Conv(self.dim, (4, 4), strides=(2, 2),
                                    padding="SAME", name="down")
                self.up = nn.ConvTranspose(self.dim, (4, 4), strides=(2, 2),
                                           padding="SAME", name="up")
        decs = []
        for i, (k, s) in enumerate([(3, 2), (4, 2), (4, 2), (4, 2)]):
            decs.append(
                nn.ConvTranspose(self.dim, (k, k), strides=(s, s),
                                 padding="SAME", name=f"dec{i}")
            )
        self.decs = decs
        self.dec_bns = [
            nn.BatchNorm(use_running_average=True, name=f"dec_bn{i}")
            for i in range(4)
        ]
        self.dec_out = nn.ConvTranspose(1, (12, 12), padding="SAME",
                                        name="dec_out")

    def __call__(self, hs, labels=None, train=False, stage="TRAIN"):
        hcat = self.adapter(hs, train=train) if self.use_adapter else hs
        if self.use_adapter and self.adapter_reduce_dim:
            hcat = self.down(hcat)
            z_q_st, z_q = self.codebook.straight_through(hcat, labels, stage)
            x = self.up(z_q_st)
        else:
            z_q_st, z_q = self.codebook.straight_through(hcat, labels, stage)
            x = z_q_st
        for dec, bn in zip(self.decs, self.dec_bns):
            x = nn.relu(dec(x))
        x_tilde = self.dec_out(x)
        return x_tilde, hcat, z_q


class VectorQuantizedPSIFocalNet_Audio(VectorQuantizedPSI_Audio):
    """PSI decoder sized for FocalNet feature maps (reference PIQ.py:509);
    same topology, distinct class for hparams compatibility."""


class VectorQuantizedPSIViT_Audio(VectorQuantizedPSI_Audio):
    """PSI decoder sized for ViT feature maps (reference PIQ.py:550)."""
