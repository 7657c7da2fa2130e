"""Vector quantizers for SSL pretraining.

Capability parity with the reference's ``speechbrain/nnet/quantisers.py``
(GumbelVectorQuantizer :14 — wav2vec2, RandomProjectionQuantizer :137 —
BEST-RQ).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class GumbelVectorQuantizer(nn.Module):
    """Gumbel-softmax vector quantization (wav2vec2 style;
    reference quantisers.py:14).

    Needs rng collection "gumbel" at train time.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> q = GumbelVectorQuantizer(dim=16, num_vars=8, groups=2, vq_dim=8)
    >>> x = jnp.ones((2, 10, 16))
    >>> v = q.init({"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)}, x, train=True)
    >>> out = q.apply(v, x, train=False)
    >>> out["x"].shape
    (2, 10, 8)
    """

    dim: int
    num_vars: int = 320
    temp_tuple: tuple = (2.0, 0.5, 0.999995)
    groups: int = 2
    vq_dim: int = 256

    @nn.compact
    def __call__(self, x, train=False, temp=None):
        from speechbrain_tpu.nnet.linear import Linear

        B, T, _ = x.shape
        G = self.groups
        var_dim = self.vq_dim // G
        codebook = self.param(
            "codebook",
            nn.initializers.uniform(scale=1.0),
            (1, G * self.num_vars, var_dim),
        )
        logits = Linear(G * self.num_vars, name="weight_proj")(x)
        logits = logits.reshape(B * T * G, self.num_vars)
        temp = temp if temp is not None else self.temp_tuple[0]
        if train:
            rng = self.make_rng("gumbel")
            g = -jnp.log(-jnp.log(jax.random.uniform(rng, logits.shape) + 1e-20) + 1e-20)
            probs = jax.nn.softmax((logits + g) / temp, axis=-1)
            hard = jax.nn.one_hot(jnp.argmax(probs, -1), self.num_vars, dtype=probs.dtype)
            assign = jax.lax.stop_gradient(hard - probs) + probs
        else:
            assign = jax.nn.one_hot(jnp.argmax(logits, -1), self.num_vars)
        # perplexity diagnostics
        avg_probs = jnp.mean(
            jax.nn.softmax(logits.reshape(B * T, G, self.num_vars), -1), axis=0
        )
        prob_perplexity = jnp.exp(
            -jnp.sum(avg_probs * jnp.log(avg_probs + 1e-7), axis=-1)
        ).sum()
        # select codewords
        assign_full = assign.reshape(B * T, G, self.num_vars)
        offsets = np.arange(G)[None, :, None] * self.num_vars
        flat_assign = jnp.zeros((B * T, G * self.num_vars)).reshape(
            B * T, G, self.num_vars
        )
        flat_assign = assign_full
        cb = codebook[0].reshape(G, self.num_vars, var_dim)
        quantized = jnp.einsum("ngv,gvd->ngd", flat_assign, cb)
        quantized = quantized.reshape(B, T, G * var_dim)
        return {
            "x": quantized,
            "prob_perplexity": prob_perplexity,
            "num_vars": self.num_vars * G,
            "temp": temp,
        }


class RandomProjectionQuantizer(nn.Module):
    """BEST-RQ quantizer (reference quantisers.py:137): frozen random
    projection + frozen random codebook; targets are nearest-codeword ids.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> q = RandomProjectionQuantizer(input_dim=16, cb_dim=8, cb_vocab=32)
    >>> x = jnp.ones((2, 10, 16))
    >>> v = q.init(jax.random.PRNGKey(0), x)
    >>> q.apply(v, x).shape
    (2, 10)
    """

    input_dim: int
    cb_dim: int = 16
    cb_vocab: int = 8192

    @nn.compact
    def __call__(self, x):
        P = self.param(
            "P",
            nn.initializers.variance_scaling(1.0, "fan_in", "uniform"),
            (self.input_dim, self.cb_dim),
        )
        CB = self.param(
            "CB", nn.initializers.normal(1.0), (self.cb_vocab, self.cb_dim)
        )
        # frozen: gradients stopped (these are never trained)
        P = jax.lax.stop_gradient(P)
        CB = jax.lax.stop_gradient(CB)
        proj = jnp.matmul(x, P)
        proj = proj / jnp.maximum(jnp.linalg.norm(proj, axis=-1, keepdims=True), 1e-12)
        cb = CB / jnp.maximum(jnp.linalg.norm(CB, axis=-1, keepdims=True), 1e-12)
        sims = jnp.einsum("btd,vd->btv", proj, cb)
        return jnp.argmax(sims, axis=-1)
