"""Branchformer encoder.

Capability parity with the reference's
``speechbrain/lobes/models/transformer/Branchformer.py``: two parallel
branches per layer — self-attention (global) and a convolutional gating
MLP / cgMLP (local) — merged by concat+projection.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from speechbrain_tpu.nnet.attention import PositionalwiseFeedForward
from speechbrain_tpu.nnet.CNN import Conv1d
from speechbrain_tpu.nnet.linear import Linear
from speechbrain_tpu.nnet.normalization import LayerNorm
from speechbrain_tpu.lobes.models.transformer.Transformer import _make_attention


class ConvolutionalSpatialGatingUnit(nn.Module):
    """CSGU: split channels, gate one half with a depthwise conv of the
    other (the cgMLP core)."""

    kernel_size: int = 31
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train=False):
        a, b = jnp.split(x, 2, axis=-1)
        b = LayerNorm(name="norm")(b)
        b = Conv1d(
            out_channels=b.shape[-1],
            kernel_size=self.kernel_size,
            groups=b.shape[-1],
            name="dw_conv",
        )(b)
        return a * b


class ConvolutionBranch(nn.Module):
    """cgMLP branch: channel-expanding MLP with spatial gating."""

    linear_units: int = 3072
    kernel_size: int = 31
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train=False):
        d = x.shape[-1]
        y = Linear(self.linear_units, name="up")(x)
        y = jax.nn.gelu(y)
        y = ConvolutionalSpatialGatingUnit(
            kernel_size=self.kernel_size, name="csgu"
        )(y, train=train)
        return Linear(d, name="down")(y)


class BranchformerEncoderLayer(nn.Module):
    """One Branchformer layer (reference Branchformer.py)."""

    d_model: int
    nhead: int
    kernel_size: int = 31
    attention_type: str = "RelPosMHAXL"
    csgu_linear_units: int = 3072
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, src_key_padding_mask=None, pos_embs=None, train=False):
        # attention branch
        a = LayerNorm(name="norm_attn")(x)
        attn = _make_attention(self.attention_type, self.d_model, self.nhead, self.dropout)
        a, attn_w = attn(
            a, a, a, key_padding_mask=src_key_padding_mask, pos_embs=pos_embs,
            train=train,
        )
        # conv (cgMLP) branch
        c = LayerNorm(name="norm_conv")(x)
        c = ConvolutionBranch(
            linear_units=self.csgu_linear_units,
            kernel_size=self.kernel_size,
            name="cgmlp",
        )(c, train=train)
        merged = Linear(self.d_model, name="merge")(
            jnp.concatenate([a, c], axis=-1)
        )
        return x + merged, attn_w


class BranchformerEncoder(nn.Module):
    """Stack of Branchformer layers.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> from speechbrain_tpu.nnet.attention import RelPosEncXL
    >>> enc = BranchformerEncoder(num_layers=2, d_model=32, nhead=4,
    ...                           csgu_linear_units=64, kernel_size=7)
    >>> x = jnp.ones((2, 16, 32))
    >>> pe = RelPosEncXL(emb_dim=32)(x)
    >>> v = enc.init(jax.random.PRNGKey(0), x, pos_embs=pe)
    >>> out, _ = enc.apply(v, x, pos_embs=pe)
    >>> out.shape
    (2, 16, 32)
    """

    num_layers: int
    d_model: int
    nhead: int
    kernel_size: int = 31
    attention_type: str = "RelPosMHAXL"
    csgu_linear_units: int = 3072
    dropout: float = 0.0

    @nn.compact
    def __call__(self, src, src_key_padding_mask=None, pos_embs=None, train=False):
        attns = []
        out = src
        for i in range(self.num_layers):
            out, w = BranchformerEncoderLayer(
                d_model=self.d_model,
                nhead=self.nhead,
                kernel_size=self.kernel_size,
                attention_type=self.attention_type,
                csgu_linear_units=self.csgu_linear_units,
                dropout=self.dropout,
                name=f"layer_{i}",
            )(out, src_key_padding_mask, pos_embs, train)
            attns.append(w)
        out = LayerNorm(name="norm_out")(out)
        return out, attns
