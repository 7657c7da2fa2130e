"""RE-SepFormer / SkiM: resource-efficient source separation.

Capability parity with the reference's
``speechbrain/lobes/models/resepformer.py`` (MemLSTM :23, SegLSTM :169,
SBRNNBlock :275, SBTransformerBlock_wnormandskip :347,
ResourceEfficientSeparationPipeline :485, ResourceEfficientSeparator
:664): long inputs are split into fixed segments; each block processes
segments independently (transformer or LSTM) while a small memory model
('av' segment-mean summary for RE-SepFormer, or the SkiM family
'hc'/'h'/'c'/'id' LSTM-state memories) carries information between
segments — O(T) instead of the dual-path model's full inter-chunk
attention.

TPU notes: segmentation is a static reshape (B, S, K, D) -> (B*S, K, D);
each block is one batched forward over all segments (MXU-friendly); the
causal memory shift is a pad+slice.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from speechbrain_tpu.lobes.models.dual_path import (
    Decoder,
    Encoder,
)
from speechbrain_tpu.lobes.models.transformer.Transformer import (
    TransformerEncoder,
)
from speechbrain_tpu.nnet.linear import Linear
from speechbrain_tpu.nnet.RNN import LSTM


def _global_layer_norm(x, scale, bias, eps=1e-8):
    """gLN over (time, channel) dims of (B, T, D)."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=(1, 2), keepdims=True)
    return scale * (x - mean) / jnp.sqrt(var + eps) + bias


class _SepNorm(nn.Module):
    """'gln' (global) or 'cln' (channelwise, causal-safe) layer norm on
    (B, T, D) (reference dual_path.select_norm)."""

    norm_type: str = "gln"

    @nn.compact
    def __call__(self, x):
        D = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (1, 1, D))
        bias = self.param("bias", nn.initializers.zeros, (1, 1, D))
        if self.norm_type == "gln":
            return _global_layer_norm(x, scale, bias)
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
        return scale * (x - mean) / jnp.sqrt(var + 1e-8) + bias


class SBTransformerBlockWNormAndSkip(nn.Module):
    """Transformer block with post-norm and skip connection (reference
    SBTransformerBlock_wnormandskip, resepformer.py:347)."""

    num_layers: int
    d_model: int
    nhead: int
    d_ffn: int = 2048
    dropout: float = 0.1
    use_norm: bool = True
    use_skip: bool = True
    norm_type: str = "gln"
    causal: bool = False

    @nn.compact
    def __call__(self, x, train=False):
        src_mask = None
        if self.causal:  # lookahead mask: True = blocked
            T = x.shape[1]
            src_mask = jnp.triu(jnp.ones((T, T), bool), 1)
        out, _ = TransformerEncoder(
            num_layers=self.num_layers, nhead=self.nhead, d_ffn=self.d_ffn,
            d_model=self.d_model, dropout=self.dropout,
            name="mdl",
        )(x, src_mask=src_mask, train=train)
        if self.use_norm:
            out = _SepNorm(norm_type=self.norm_type, name="norm")(out)
        if self.use_skip:
            out = out + x
        return out


class SegLSTM(nn.Module):
    """Segment LSTM of SkiM (reference resepformer.py:169): an LSTM over
    each segment, seeded with memory-carried (h, c), with projection +
    norm + residual."""

    hidden_size: int
    dropout: float = 0.0
    bidirectional: bool = False
    norm_type: str = "gln"

    @nn.compact
    def __call__(self, x, hc=None, train=False):
        B, T, H = x.shape
        d = 2 if self.bidirectional else 1
        lstm = LSTM(
            hidden_size=self.hidden_size, num_layers=1,
            bidirectional=self.bidirectional, name="lstm",
        )
        if hc is None:
            hc = (
                jnp.zeros((d, B, self.hidden_size), x.dtype),
                jnp.zeros((d, B, self.hidden_size), x.dtype),
            )
        out, (h, c) = lstm(x, hx=hc, train=train)
        if train and self.dropout > 0:
            out = nn.Dropout(self.dropout, deterministic=False)(out)
        out = Linear(H, name="proj")(out)
        out = _SepNorm(norm_type=self.norm_type, name="norm")(out)
        return x + out, (h, c)


class MemLSTM(nn.Module):
    """Memory LSTM of SkiM (reference resepformer.py:23): processes the
    per-segment LSTM states along the segment axis so information flows
    between segments. mem_type: 'hc', 'h', 'c' or 'id'."""

    hidden_size: int
    dropout: float = 0.0
    bidirectional: bool = False
    mem_type: str = "hc"
    norm_type: str = "cln"

    @nn.compact
    def __call__(self, hc, S, train=False):
        if self.mem_type == "id":
            ret = hc
        else:
            h, c = hc
            d, BS, H = h.shape
            B = BS // S
            h_seq = jnp.swapaxes(h, 0, 1).reshape(B, S, d * H)
            c_seq = jnp.swapaxes(c, 0, 1).reshape(B, S, d * H)

            def mem_net(x, prefix):
                out, _ = LSTM(
                    hidden_size=self.hidden_size,
                    bidirectional=self.bidirectional,
                    name=f"{prefix}_net",
                )(x, train=train)
                out = Linear(d * H, name=f"{prefix}_proj")(out)
                out = _SepNorm(
                    norm_type=self.norm_type, name=f"{prefix}_norm"
                )(out)
                return out

            if self.mem_type in ("hc", "h"):
                h_seq = h_seq + mem_net(h_seq, "h")
            if self.mem_type in ("hc", "c"):
                c_seq = c_seq + mem_net(c_seq, "c")
            if self.mem_type == "h":
                c_seq = jnp.zeros_like(c_seq)
            if self.mem_type == "c":
                h_seq = jnp.zeros_like(h_seq)
            h = jnp.swapaxes(h_seq.reshape(B * S, d, H), 0, 1)
            c = jnp.swapaxes(c_seq.reshape(B * S, d, H), 0, 1)
            ret = (h, c)
        if not self.bidirectional:
            # causal: segment s consumes the memory of segment s-1
            def shift(x):
                d, BS, H = x.shape
                B = BS // S
                xs = jnp.swapaxes(x, 0, 1).reshape(B, S, d, H)
                xs = jnp.pad(xs, ((0, 0), (1, 0), (0, 0), (0, 0)))[:, :-1]
                return jnp.swapaxes(xs.reshape(B * S, d, H), 0, 1)

            ret = tuple(shift(x) for x in ret)
        return ret


class ResourceEfficientSeparationPipeline(nn.Module):
    """Segment-process-with-memory pipeline shared by RE-SepFormer and
    SkiM (reference resepformer.py:485).

    seg_model_kwargs build one per-block segment model (independent
    weights per block, like the reference's deepcopy); mem_type 'av'
    summarizes each segment by its mean and runs a transformer memory,
    the LSTM mem types carry SegLSTM states.
    """

    input_size: int
    hidden_size: int
    output_size: int
    num_blocks: int = 2
    segment_size: int = 20
    bidirectional: bool = True
    mem_type: str = "av"
    norm_type: str = "gln"
    seg_model: str = "transformer"  # "transformer" | "lstm"
    nhead: int = 8
    d_ffn: int = 1024
    seg_num_layers: int = 1
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train=False):
        B, T, D = x.shape
        K = self.segment_size
        pad = (-T) % K
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        S = x.shape[1] // K
        out = x.reshape(B * S, K, D)

        hc = None
        if self.mem_type == "av":
            hc = jnp.zeros((out.shape[0], 1, D), x.dtype)

        for i in range(self.num_blocks):
            if self.seg_model == "transformer":
                block = SBTransformerBlockWNormAndSkip(
                    num_layers=self.seg_num_layers, d_model=D,
                    nhead=self.nhead, d_ffn=self.d_ffn,
                    dropout=self.dropout, norm_type=self.norm_type,
                    causal=not self.bidirectional, name=f"seg_{i}",
                )
                out = block(out + hc if hc is not None else out, train=train)
            else:
                out, hc = SegLSTM(
                    hidden_size=self.hidden_size, dropout=self.dropout,
                    bidirectional=self.bidirectional,
                    norm_type=self.norm_type, name=f"seg_{i}",
                )(out, hc, train=train)
            if i < self.num_blocks - 1:
                if self.mem_type == "av":
                    summary = jnp.mean(out, axis=1)  # (B*S, D)
                    summary = summary.reshape(B, S, D)
                    # design delta vs reference: the memory transformer
                    # attends over the S segments of EACH batch item
                    # (the reference flattens batch*segments into one
                    # sequence, leaking attention across the batch)
                    summary = SBTransformerBlockWNormAndSkip(
                        num_layers=self.seg_num_layers, d_model=D,
                        nhead=self.nhead, d_ffn=self.d_ffn,
                        dropout=self.dropout, norm_type=self.norm_type,
                        causal=not self.bidirectional, name=f"mem_{i}",
                    )(summary, train=train)
                    hc = summary.reshape(B * S, 1, D)
                elif self.mem_type is not None:
                    hc = MemLSTM(
                        hidden_size=self.hidden_size, dropout=self.dropout,
                        bidirectional=self.bidirectional,
                        mem_type=self.mem_type, norm_type=self.norm_type,
                        name=f"mem_{i}",
                    )(hc, S, train=train)

        out = out.reshape(B, S * K, D)[:, :T]
        out = jnp.where(out > 0, out, 0.25 * out)  # PReLU(0.25) head
        return Linear(self.output_size, name="output_fc")(out)


class ResourceEfficientSeparator(nn.Module):
    """RE-SepFormer mask network (reference ResourceEfficientSeparator,
    resepformer.py:664): encoded mixture (B, T, N) -> per-speaker masks
    (num_spk, B, T, N).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> sep = ResourceEfficientSeparator(input_dim=16, num_spk=2,
    ...     unit=16, layer=2, segment_size=10, mem_type="av", nhead=4)
    >>> x = jnp.ones((2, 50, 16))
    >>> v = sep.init(jax.random.PRNGKey(0), x, train=False)
    >>> sep.apply(v, x, train=False).shape
    (2, 2, 50, 16)
    """

    input_dim: int
    causal: bool = True
    num_spk: int = 2
    nonlinear: str = "relu"
    layer: int = 3
    unit: int = 512
    segment_size: int = 20
    dropout: float = 0.0
    mem_type: str = "hc"
    seg_model: str = "transformer"
    nhead: int = 8
    d_ffn: int = 1024

    @nn.compact
    def __call__(self, x, train=False):
        B, T, N = x.shape
        processed = ResourceEfficientSeparationPipeline(
            input_size=self.input_dim, hidden_size=self.unit,
            output_size=self.input_dim * self.num_spk,
            num_blocks=self.layer, segment_size=self.segment_size,
            bidirectional=not self.causal, mem_type=self.mem_type,
            norm_type="cln" if self.causal else "gln",
            seg_model=self.seg_model, nhead=self.nhead, d_ffn=self.d_ffn,
            dropout=self.dropout, name="model",
        )(x, train=train)
        processed = processed.reshape(B, T, N, self.num_spk)
        act = {
            "relu": jax.nn.relu, "sigmoid": jax.nn.sigmoid,
            "tanh": jnp.tanh,
        }[self.nonlinear]
        return jnp.moveaxis(act(processed), 3, 1)  # (B, spk, T, N)


class RESepformerWrapper(nn.Module):
    """Encoder + ResourceEfficientSeparator + decoder, end-to-end
    waveform separation (the RE-SepFormer recipe composition).

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
    n_layers: int = 2
    nhead: int = 4
    d_ffn: int = 256
    mem_type: str = "av"
    # "transformer" = RE-SepFormer; "lstm" = SkiM (SegLSTM segment
    # models, reference skim.yaml)
    seg_model: str = "transformer"

    @nn.compact
    def __call__(self, mix, train=False):
        T_origin = mix.shape[1]
        enc = Encoder(
            kernel_size=self.encoder_kernel_size,
            out_channels=self.encoder_out_nchannels,
            name="encoder",
        )(mix)
        masks = ResourceEfficientSeparator(
            input_dim=self.encoder_out_nchannels, causal=False,
            num_spk=self.masknet_numspks, layer=self.n_layers,
            unit=self.encoder_out_nchannels,
            segment_size=self.masknet_chunksize, mem_type=self.mem_type,
            nhead=self.nhead, d_ffn=self.d_ffn,
            seg_model=self.seg_model, name="masknet",
        )(enc, train=train)
        decoder = Decoder(
            kernel_size=self.encoder_kernel_size,
            in_channels=self.encoder_out_nchannels,
            name="decoder",
        )
        outs = [
            decoder(enc * masks[:, s]) for s in range(self.masknet_numspks)
        ]
        est = jnp.stack(outs, axis=-1)
        T_est = est.shape[1]
        if T_est > T_origin:
            est = est[:, :T_origin]
        elif T_est < T_origin:
            est = jnp.pad(est, ((0, 0), (0, T_origin - T_est), (0, 0)))
        return est
