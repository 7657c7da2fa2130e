"""RNN language model.

Capability parity with the reference's ``speechbrain/lobes/models/RNNLM.py``:
embedding -> LSTM stack -> DNN -> output logits; supports stateful
single-step calls for fusion in beam search (explicit hidden state).
"""

import flax.linen as nn
import jax.numpy as jnp

from speechbrain_tpu.nnet.embedding import Embedding
from speechbrain_tpu.nnet.linear import Linear
from speechbrain_tpu.nnet.RNN import LSTM
from speechbrain_tpu.nnet.normalization import LayerNorm


class RNNLM(nn.Module):
    """(B, U) ids -> (B, U, vocab) logits; pass ``hx`` for incremental
    decoding and read the returned state.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> lm = RNNLM(output_neurons=50, embedding_dim=16, rnn_neurons=32, dnn_neurons=32)
    >>> x = jnp.ones((2, 6), dtype=jnp.int32)
    >>> v = lm.init(jax.random.PRNGKey(0), x)
    >>> logits, state = lm.apply(v, x)
    >>> logits.shape
    (2, 6, 50)
    """

    output_neurons: int
    embedding_dim: int = 128
    activation: str = "leaky_relu"
    dropout: float = 0.15
    rnn_layers: int = 2
    rnn_neurons: int = 1024
    dnn_blocks: int = 1
    dnn_neurons: int = 512
    return_hidden: bool = True

    @nn.compact
    def __call__(self, x, hx=None, train=False):
        from speechbrain_tpu.nnet.activations import get_activation

        act = get_activation(self.activation)
        emb = Embedding(
            num_embeddings=self.output_neurons,
            embedding_dim=self.embedding_dim,
            name="emb",
        )(x)
        out, state = LSTM(
            hidden_size=self.rnn_neurons,
            num_layers=self.rnn_layers,
            dropout=self.dropout,
            name="rnn",
        )(emb, hx=hx, train=train)
        for i in range(self.dnn_blocks):
            out = Linear(self.dnn_neurons, name=f"dnn_{i}")(out)
            out = LayerNorm(name=f"norm_{i}")(out)
            out = act(out)
            if train and self.dropout > 0:
                out = nn.Dropout(self.dropout, deterministic=False)(out)
        logits = Linear(self.output_neurons, name="out")(out)
        if self.return_hidden:
            return logits, state
        return logits
