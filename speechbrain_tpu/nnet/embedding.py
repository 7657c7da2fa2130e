"""Embedding layer.

Capability parity with the reference's ``speechbrain/nnet/embedding.py``
(Embedding :15): token embeddings with optional blank-row zeroing (used
for CTC blank) and one-hot consume mode.
"""

import flax.linen as nn
import jax.numpy as jnp


class Embedding(nn.Module):
    """Lookup embeddings (batch, time) int -> (batch, time, dim).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> emb = Embedding(num_embeddings=10, embedding_dim=4)
    >>> x = jnp.array([[1, 2, 3]])
    >>> p = emb.init(jax.random.PRNGKey(0), x)
    >>> emb.apply(p, x).shape
    (1, 3, 4)
    """

    num_embeddings: int
    embedding_dim: int = 128
    consider_as_one_hot: bool = False
    blank_id: int = 0

    @nn.compact
    def __call__(self, x):
        x = x.astype(jnp.int32)
        if self.consider_as_one_hot:
            # one-hot minus the blank column (reference semantics)
            dim = self.num_embeddings - 1
            oh = jnp.eye(self.num_embeddings, dtype=jnp.float32)
            keep = [i for i in range(self.num_embeddings) if i != self.blank_id]
            table = oh[:, jnp.asarray(keep)]
            return table[x]
        table = self.param(
            "embedding",
            nn.initializers.normal(stddev=1.0),
            (self.num_embeddings, self.embedding_dim),
        )
        return table[x]
