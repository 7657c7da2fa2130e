"""Parameter-efficient fine-tuning adapters.

Capability parity with the reference's ``speechbrain/nnet/adapters.py``
(AdaptedModel :26, HoulsbyAdapterLinear :243, LoRA :326). In the functional
setting, adapters are modules wrapping a frozen base transform; freezing is
an optax.masked partition over param paths (``lora_params_mask``).
"""

import flax.linen as nn
import jax.numpy as jnp

from speechbrain_tpu.nnet.linear import Linear


class LoRA(nn.Module):
    """Low-rank adaptation of a linear map (reference adapters.py:326):
    y = x W_frozen + alpha/r * (x A) B.

    The frozen weight is passed in at call time (it lives in the base
    model's params); only A and B are parameters of this module.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> lora = LoRA(rank=2)
    >>> x = jnp.ones((2, 5, 8)); w = jnp.ones((8, 4))
    >>> p = lora.init(jax.random.PRNGKey(0), x, w)
    >>> lora.apply(p, x, w).shape
    (2, 5, 4)
    """

    rank: int = 16
    alpha: float = 1.0

    @nn.compact
    def __call__(self, x, frozen_kernel, frozen_bias=None):
        in_dim = x.shape[-1]
        out_dim = frozen_kernel.shape[-1]
        A = self.param(
            "lora_A", nn.initializers.normal(stddev=0.01), (in_dim, self.rank)
        )
        B = self.param("lora_B", nn.initializers.zeros, (self.rank, out_dim))
        y = jnp.matmul(x, frozen_kernel)
        if frozen_bias is not None:
            y = y + frozen_bias
        scaling = self.alpha / self.rank
        return y + scaling * jnp.matmul(jnp.matmul(x, A), B)


class HoulsbyAdapterLinear(nn.Module):
    """Bottleneck adapter with residual (reference adapters.py:243):
    y = x + U(act(D(LN(x))))."""

    projection_size: int = 64
    activation: str = "gelu"

    @nn.compact
    def __call__(self, x):
        from speechbrain_tpu.nnet.activations import get_activation
        from speechbrain_tpu.nnet.normalization import LayerNorm

        act = get_activation(self.activation)
        dim = x.shape[-1]
        h = LayerNorm(name="ln")(x)
        h = Linear(self.projection_size, name="down")(h)
        h = act(h)
        h = Linear(dim, name="up")(h)
        return x + h


def lora_params_mask(params, adapter_key="lora"):
    """Boolean pytree: True for adapter params (trainable), False for the
    frozen base — feed to optax.masked to train adapters only
    (the functional analogue of reference AdaptedModel's freezing)."""
    import jax

    def mark(path, leaf):
        return any(adapter_key in str(p).lower() for p in path)

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    mask_leaves = [mark([str(k) for k in path], leaf) for path, leaf in flat]
    return jax.tree_util.tree_unflatten(treedef, mask_leaves)


def init_lora_tree(params, target_names=("q_proj", "v_proj"), rank=8,
                   seed=0):
    """Build a LoRA delta tree for an existing parameter pytree.

    For every 2-D ``kernel`` whose path contains one of ``target_names``,
    creates ``{"A": (in, r) gaussian, "B": (r, out) zeros}`` keyed by the
    flattened path — so training starts from the identity (B=0), the
    standard LoRA init. Pairs with :func:`apply_lora_tree`; freezing the
    base is an ``optax.masked`` partition (the functional analogue of
    the reference's AdaptedModel + LoRA, nnet/adapters.py:26,326).

    Example
    -------
    >>> import jax.numpy as jnp
    >>> p = {"dec": {"q_proj": {"kernel": jnp.ones((4, 4))},
    ...              "ffn": {"kernel": jnp.ones((4, 4))}}}
    >>> lora = init_lora_tree(p, rank=2)
    >>> sorted(lora)
    ['dec/q_proj/kernel']
    >>> lora["dec/q_proj/kernel"]["A"].shape, lora["dec/q_proj/kernel"]["B"].shape
    ((4, 2), (2, 4))
    """
    import jax

    from flax.traverse_util import flatten_dict

    rng = jax.random.PRNGKey(seed)
    out = {}
    for path, leaf in flatten_dict(params).items():
        spath = [str(p) for p in path]
        if spath[-1] != "kernel" or getattr(leaf, "ndim", 0) != 2:
            continue
        if not any(t in s for t in target_names for s in spath[:-1]):
            continue
        rng, k = jax.random.split(rng)
        d_in, d_out = leaf.shape
        out["/".join(spath)] = {
            "A": jax.random.normal(k, (d_in, rank), leaf.dtype)
            * (1.0 / rank),
            "B": jnp.zeros((rank, d_out), leaf.dtype),
        }
    return out


def apply_lora_tree(params, lora, scale=1.0):
    """Return ``params`` with each targeted kernel replaced by
    ``kernel + scale * A @ B`` (see :func:`init_lora_tree`).

    Example
    -------
    >>> import jax.numpy as jnp
    >>> p = {"dec": {"q_proj": {"kernel": jnp.ones((4, 4))}}}
    >>> lora = init_lora_tree(p, rank=2)
    >>> merged = apply_lora_tree(p, lora)
    >>> bool(jnp.allclose(merged["dec"]["q_proj"]["kernel"], 1.0))
    True
    """
    from flax.traverse_util import flatten_dict, unflatten_dict

    flat = dict(flatten_dict(params))
    for key, ab in lora.items():
        path = tuple(key.split("/"))
        flat[path] = flat[path] + scale * (ab["A"] @ ab["B"])
    return unflatten_dict(flat)
