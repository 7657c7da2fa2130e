"""HyperMixing: token mixing with hypernetwork-generated MLPs — a
linear-complexity alternative to self-attention.

Capability parity with the reference's ``speechbrain/nnet/hypermixing.py``
(HyperMixing, HyperNetwork, ParallelMLPs): used by the Branchformer
variant. Call signature mirrors MultiheadAttention so it can be swapped
into transformer layers.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from speechbrain_tpu.nnet.linear import Linear


class HyperNetwork(nn.Module):
    """Generate per-position token-mixing weights W1 (and optionally W2)."""

    hypernet_size: int
    input_output_dim: int
    tied: bool = False
    num_heads: int = 1

    @nn.compact
    def __call__(self, x):
        B, T, D = x.shape
        H = self.num_heads
        hs = self.hypernet_size
        w1 = Linear(hs * H, name="w1_gen")(x)  # (B, T, H*hs)
        w1 = w1.reshape(B, T, H, hs).transpose(0, 2, 1, 3)  # (B,H,T,hs)
        if self.tied:
            w2 = w1
        else:
            w2 = Linear(hs * H, name="w2_gen")(x)
            w2 = w2.reshape(B, T, H, hs).transpose(0, 2, 1, 3)
        return w1, w2


class HyperMixing(nn.Module):
    """Token mixing via hypernetwork MLP (reference hypermixing.py).

    Call (query, key, value, ...) -> (output, None), attention-compatible.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> hm = HyperMixing(input_output_dim=16, hypernet_size=32, num_heads=2)
    >>> x = jnp.ones((2, 10, 16))
    >>> p = hm.init(jax.random.PRNGKey(0), x, x, x)
    >>> out, _ = hm.apply(p, x, x, x)
    >>> out.shape
    (2, 10, 16)
    """

    input_output_dim: int
    hypernet_size: int
    tied: bool = False
    num_heads: int = 1
    fix_tm_hidden_size: bool = False
    max_length: int = 3000

    @nn.compact
    def __call__(self, query, key, value, attn_mask=None,
                 key_padding_mask=None, pos_embs=None, train=False,
                 return_attn_weights=False):
        out_dim = self.input_output_dim
        x = value
        B, T, D = x.shape
        H = self.num_heads
        hd = D // H
        w1, w2 = HyperNetwork(
            hypernet_size=self.hypernet_size,
            input_output_dim=out_dim,
            tied=self.tied,
            num_heads=H,
            name="hyper",
        )(query)
        if key_padding_mask is not None:
            keep = (~key_padding_mask).astype(x.dtype)[:, None, :, None]
            w1 = w1 * keep
            w2 = w2 * keep
        xh = x.reshape(B, T, H, hd).transpose(0, 2, 1, 3)  # (B,H,T,hd)
        # token mixing MLP: act(W1^T x) then W2
        hidden = jax.nn.gelu(
            jnp.einsum("bhts,bhtd->bhsd", w1, xh)
        )  # (B,H,hs,hd)
        out = jnp.einsum("bhts,bhsd->bhtd", w2, hidden)  # (B,H,T,hd)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, D)
        out = Linear(out_dim, name="out_proj")(out)
        return out, None
