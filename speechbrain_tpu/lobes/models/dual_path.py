"""Dual-path separation models (SepFormer, DPRNN).

Capability parity with the reference's
``speechbrain/lobes/models/dual_path.py`` (Encoder :176, Decoder :236,
SBTransformerBlock :537, SBRNNBlock, Dual_Computation_Block :801,
Dual_Path_Model :934, SepformerWrapper :1203): free-filterbank encoder,
chunked dual-path processing (intra-chunk + inter-chunk blocks), mask
estimation per source, overlap-add reconstruction. The chunking reshape
(B, N, K, S) maps to batched MXU matmuls on TPU — intra/inter blocks see
static (K or S)-length sequences.
"""

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from speechbrain_tpu.nnet.CNN import Conv1d, ConvTranspose1d
from speechbrain_tpu.nnet.linear import Linear
from speechbrain_tpu.nnet.normalization import GroupNorm, LayerNorm
from speechbrain_tpu.nnet.RNN import LSTM
from speechbrain_tpu.lobes.models.transformer.Transformer import (
    PositionalEncoding,
    TransformerEncoder,
)


class Encoder(nn.Module):
    """Waveform -> latent filterbank: Conv1d stride kernel/2 + ReLU
    (reference dual_path.py:176).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> enc = Encoder(kernel_size=4, out_channels=8)
    >>> x = jnp.ones((2, 1000))
    >>> p = enc.init(jax.random.PRNGKey(0), x)
    >>> enc.apply(p, x).shape
    (2, 499, 8)
    """

    kernel_size: int = 2
    out_channels: int = 64
    in_channels: int = 1

    @nn.compact
    def __call__(self, x):
        if x.ndim == 2:
            x = x[..., None]
        y = Conv1d(
            out_channels=self.out_channels,
            kernel_size=self.kernel_size,
            stride=self.kernel_size // 2,
            padding="valid",
            bias=False,
            name="conv",
        )(x)
        return jax.nn.relu(y)


class Decoder(nn.Module):
    """Latent -> waveform via transposed conv (reference dual_path.py:236)."""

    kernel_size: int = 2
    out_channels: int = 1
    in_channels: int = 64

    @nn.compact
    def __call__(self, x):
        y = ConvTranspose1d(
            out_channels=self.out_channels,
            kernel_size=self.kernel_size,
            stride=self.kernel_size // 2,
            bias=False,
            name="deconv",
        )(x)
        return y[..., 0] if self.out_channels == 1 else y


class SBTransformerBlock(nn.Module):
    """Transformer encoder block used intra/inter-chunk
    (reference dual_path.py:537)."""

    num_layers: int
    d_model: int
    nhead: int
    d_ffn: int = 2048
    dropout: float = 0.0
    use_positional_encoding: bool = True
    norm_before: bool = True
    attention_type: str = "regularMHA"

    @nn.compact
    def __call__(self, x, train=False):
        if self.use_positional_encoding:
            x = x + PositionalEncoding(
                input_size=self.d_model, max_len=5000, name="pos"
            )(x)
        out, _ = TransformerEncoder(
            num_layers=self.num_layers,
            nhead=self.nhead,
            d_ffn=self.d_ffn,
            d_model=self.d_model,
            dropout=self.dropout,
            normalize_before=self.norm_before,
            attention_type=self.attention_type,
            name="enc",
        )(x, train=train)
        return out


class SBConformerEncoderBlock(nn.Module):
    """Conformer encoder block used intra-chunk (reference
    dual_path.py's SBConformerEncoderBlock, used by
    recipes/WSJ0Mix/separation/hparams/sepformer-conformerintra.yaml)."""

    num_layers: int
    d_model: int
    nhead: int
    d_ffn: int = 2048
    dropout: float = 0.0
    kernel_size: int = 31
    use_positional_encoding: bool = True

    @nn.compact
    def __call__(self, x, train=False):
        from speechbrain_tpu.lobes.models.transformer.Conformer import (
            ConformerEncoder,
        )
        from speechbrain_tpu.nnet.attention import RelPosEncXL

        pos = RelPosEncXL(emb_dim=self.d_model, name="relpos")(x)
        out, _ = ConformerEncoder(
            num_layers=self.num_layers,
            d_model=self.d_model,
            d_ffn=self.d_ffn,
            nhead=self.nhead,
            kernel_size=self.kernel_size,
            dropout=self.dropout,
            name="enc",
        )(x, pos_embs=pos, train=train)
        return out


class SBRNNBlock(nn.Module):
    """BiLSTM + projection block for DPRNN (reference dual_path.py:471)."""

    hidden_channels: int
    out_channels: int
    num_layers: int = 1
    bidirectional: bool = True
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train=False):
        out, _ = LSTM(
            hidden_size=self.hidden_channels,
            num_layers=self.num_layers,
            bidirectional=self.bidirectional,
            dropout=self.dropout,
            name="rnn",
        )(x, train=train)
        return Linear(self.out_channels, name="proj")(out)


class DualComputationBlock(nn.Module):
    """One dual-path stage: intra-chunk block + inter-chunk block with
    norm + residual (reference dual_path.py:801).

    Input (B, K, S, N): K = chunk length, S = number of chunks.
    """

    intra_mdl: nn.Module
    inter_mdl: nn.Module
    out_channels: int
    norm: str = "ln"
    skip_around_intra: bool = True
    linear_layer_after_inter_intra: bool = False

    @nn.compact
    def __call__(self, x, train=False):
        B, K, S, N = x.shape
        # intra-chunk: sequences of length K, batch B*S
        intra = x.transpose(0, 2, 1, 3).reshape(B * S, K, N)
        intra = self.intra_mdl(intra, train=train)
        if self.linear_layer_after_inter_intra:
            intra = Linear(self.out_channels, name="intra_proj")(intra)
        intra = intra.reshape(B, S, K, N).transpose(0, 2, 1, 3)
        if self.norm == "ln":
            # the reference's "ln" here is nn.GroupNorm(1, N, eps=1e-8)
            # — a GLOBAL per-sample norm over (K, S, N), not a
            # per-position LayerNorm (ref dual_path.py:171,849)
            intra = GroupNorm(num_groups=1, eps=1e-8,
                              name="intra_norm")(intra)
        if self.skip_around_intra:
            intra = intra + x
        # inter-chunk: sequences of length S, batch B*K
        inter = intra.reshape(B * K, S, N)
        inter = self.inter_mdl(inter, train=train)
        if self.linear_layer_after_inter_intra:
            inter = Linear(self.out_channels, name="inter_proj")(inter)
        inter = inter.reshape(B, K, S, N)
        if self.norm == "ln":
            inter = GroupNorm(num_groups=1, eps=1e-8,
                              name="inter_norm")(inter)
        return inter + intra


class DualPathModel(nn.Module):
    """The full dual-path mask estimator (reference dual_path.py:934).

    Input (B, T, N) encoded features -> (n_spks, B, T, N) masks.
    """

    in_channels: int
    out_channels: int
    intra_model: object
    inter_model: object
    num_layers: int = 1
    norm: str = "ln"
    K: int = 200
    num_spks: int = 2
    skip_around_intra: bool = True
    linear_layer_after_inter_intra: bool = False
    use_global_pos_enc: bool = False
    max_length: int = 20000

    def _segment(self, x, K):
        """(B, T, N) -> (B, K, S, N) with 50% overlap segmentation."""
        if K % 2:
            raise ValueError(
                f"chunk size K must be even for 50%-overlap segmentation, "
                f"got {K}"
            )
        B, T, N = x.shape
        P = K // 2
        gap = K - (P + T % K) % K
        x = jnp.pad(x, ((0, 0), (P, P + gap), (0, 0)))
        T2 = x.shape[1]
        # two interleaved views shifted by P
        n_seg = (T2 - K) // P + 1
        starts = np.arange(n_seg) * P
        idx = starts[:, None] + np.arange(K)[None, :]
        segs = x[:, idx, :]  # (B, S, K, N)
        return segs.transpose(0, 2, 1, 3), gap  # (B, K, S, N)

    def _overlap_add(self, x, gap):
        """(B, K, S, N) -> (B, T, N) inverse of _segment."""
        B, K, S, N = x.shape
        P = K // 2
        T2 = (S - 1) * P + K
        out = jnp.zeros((B, T2, N), x.dtype)
        starts = np.arange(S) * P
        idx = (starts[:, None] + np.arange(K)[None, :]).reshape(-1)
        vals = x.transpose(0, 2, 1, 3).reshape(B, S * K, N)
        # the reference SUMS the two 50%-overlap streams (ref
        # dual_path.py _over_add: input1 + input2) — no averaging
        out = out.at[:, idx, :].add(vals)
        out = out[:, P : -(P + gap)] if (P + gap) > 0 else out[:, P:]
        return out

    @nn.compact
    def __call__(self, x, train=False):
        # x: (B, T, N)
        x = GroupNorm(num_groups=1, eps=1e-8, name="norm")(x)  # global layer norm (ref eps 1e-8)
        x = Conv1d(self.out_channels, 1, bias=False, name="conv1x1")(x)
        if self.use_global_pos_enc:
            x = x * (self.out_channels**0.5) + PositionalEncoding(
                input_size=self.out_channels, max_len=self.max_length, name="pos"
            )(x)
        segs, gap = self._segment(x, self.K)  # (B, K, S, N)
        for i in range(self.num_layers):
            # the reference deep-copies the intra/inter transformers per
            # dual-path stage (ref dual_path.py:957 copy.deepcopy) —
            # clone so each stage gets its OWN weights, not shared ones
            segs = DualComputationBlock(
                intra_mdl=self.intra_model.clone(),
                inter_mdl=self.inter_model.clone(),
                out_channels=self.out_channels,
                norm=self.norm,
                skip_around_intra=self.skip_around_intra,
                linear_layer_after_inter_intra=self.linear_layer_after_inter_intra,
                name=f"dual_{i}",
            )(segs, train=train)
        B, K, S, N = segs.shape
        segs = _prelu(self, segs, "prelu1")
        segs = Conv1d(
            self.out_channels * self.num_spks, 1, name="conv_expand"
        )(segs.reshape(B, K * S, N)).reshape(B, K, S, N * self.num_spks)
        # -> (B*spks, K, S, N)
        segs = segs.reshape(B, K, S, self.num_spks, N)
        segs = segs.transpose(3, 0, 1, 2, 4).reshape(
            self.num_spks * B, K, S, N
        )
        est = self._overlap_add(segs, gap)  # (spks*B, T, N)
        # gated output
        g1 = jnp.tanh(Conv1d(self.out_channels, 1, name="output_gate_a")(est))
        g2 = jax.nn.sigmoid(Conv1d(self.out_channels, 1, name="output_gate_b")(est))
        est = g1 * g2
        est = Conv1d(self.in_channels, 1, name="end_conv1x1")(est)
        est = jax.nn.relu(est)
        T = est.shape[1]
        return est.reshape(self.num_spks, B, T, self.in_channels)


def _prelu(module, x, name):
    alpha = module.param(name, nn.initializers.constant(0.25), (1,))
    return jnp.where(x >= 0, x, alpha * x)


class SepformerWrapper(nn.Module):
    """Encoder + dual-path masknet + decoder (reference dual_path.py:1203).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> model = SepformerWrapper(
    ...     encoder_kernel_size=16, encoder_out_nchannels=32,
    ...     masknet_chunksize=20, masknet_numlayers=1, masknet_numspks=2,
    ...     intra_numlayers=1, inter_numlayers=1, intra_nhead=4,
    ...     inter_nhead=4, intra_dffn=64, inter_dffn=64)
    >>> x = jnp.ones((1, 2000))
    >>> v = model.init(jax.random.PRNGKey(0), x, train=False)
    >>> model.apply(v, x, train=False).shape
    (1, 2000, 2)
    """

    encoder_kernel_size: int = 16
    encoder_in_nchannels: int = 1
    encoder_out_nchannels: int = 256
    masknet_chunksize: int = 250
    masknet_numlayers: int = 2
    masknet_norm: str = "ln"
    masknet_useextralinearlayer: bool = False
    masknet_extraskipconnection: bool = True
    masknet_numspks: int = 2
    intra_numlayers: int = 8
    inter_numlayers: int = 8
    intra_nhead: int = 8
    inter_nhead: int = 8
    intra_dffn: int = 1024
    inter_dffn: int = 1024
    intra_use_positional: bool = True
    inter_use_positional: bool = True
    intra_norm_before: bool = True
    inter_norm_before: bool = True
    # "transformer" = SepFormer; "rnn" = DPRNN (SBRNNBlock intra/inter,
    # reference dual_path.py:471 + the dprnn.yaml recipes);
    # "conformer_intra" = conformer intra block + transformer inter
    # (reference sepformer-conformerintra.yaml)
    block_type: str = "transformer"
    rnn_hidden: int = 128
    conformer_kernel_size: int = 31

    @nn.compact
    def __call__(self, mix, train=False):
        T_origin = mix.shape[1]
        enc = Encoder(
            kernel_size=self.encoder_kernel_size,
            out_channels=self.encoder_out_nchannels,
            name="encoder",
        )(mix)
        if self.block_type == "rnn":
            intra = SBRNNBlock(
                hidden_channels=self.rnn_hidden,
                out_channels=self.encoder_out_nchannels,
                num_layers=self.intra_numlayers,
                name="intra",
            )
            inter = SBRNNBlock(
                hidden_channels=self.rnn_hidden,
                out_channels=self.encoder_out_nchannels,
                num_layers=self.inter_numlayers,
                name="inter",
            )
        elif self.block_type == "conformer_intra":
            intra = SBConformerEncoderBlock(
                num_layers=self.intra_numlayers,
                d_model=self.encoder_out_nchannels,
                nhead=self.intra_nhead,
                d_ffn=self.intra_dffn,
                kernel_size=self.conformer_kernel_size,
                name="intra",
            )
            inter = SBTransformerBlock(
                num_layers=self.inter_numlayers,
                d_model=self.encoder_out_nchannels,
                nhead=self.inter_nhead,
                d_ffn=self.inter_dffn,
                use_positional_encoding=self.inter_use_positional,
                norm_before=self.inter_norm_before,
                name="inter",
            )
        else:
            intra = SBTransformerBlock(
                num_layers=self.intra_numlayers,
                d_model=self.encoder_out_nchannels,
                nhead=self.intra_nhead,
                d_ffn=self.intra_dffn,
                use_positional_encoding=self.intra_use_positional,
                norm_before=self.intra_norm_before,
                name="intra",
            )
            inter = SBTransformerBlock(
                num_layers=self.inter_numlayers,
                d_model=self.encoder_out_nchannels,
                nhead=self.inter_nhead,
                d_ffn=self.inter_dffn,
                use_positional_encoding=self.inter_use_positional,
                norm_before=self.inter_norm_before,
                name="inter",
            )
        masks = DualPathModel(
            in_channels=self.encoder_out_nchannels,
            out_channels=self.encoder_out_nchannels,
            intra_model=intra,
            inter_model=inter,
            num_layers=self.masknet_numlayers,
            norm=self.masknet_norm,
            K=self.masknet_chunksize,
            num_spks=self.masknet_numspks,
            skip_around_intra=self.masknet_extraskipconnection,
            linear_layer_after_inter_intra=self.masknet_useextralinearlayer,
            name="masknet",
        )(enc, train=train)  # (spks, B, T, N)
        decoder = Decoder(
            kernel_size=self.encoder_kernel_size,
            in_channels=self.encoder_out_nchannels,
            name="decoder",
        )
        outs = [
            decoder(enc * masks[s]) for s in range(self.masknet_numspks)
        ]
        est = jnp.stack(outs, axis=-1)  # (B, T', spks)
        # pad/trim to the input length
        T_est = est.shape[1]
        if T_est > T_origin:
            est = est[:, :T_origin]
        elif T_est < T_origin:
            est = jnp.pad(est, ((0, 0), (0, T_origin - T_est), (0, 0)))
        return est
