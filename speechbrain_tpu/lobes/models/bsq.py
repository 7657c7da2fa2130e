"""Binary spherical quantization.

Capability parity with the reference's ``speechbrain/lobes/models/bsq.py``
(BSQ): project to the unit hypersphere, quantize each dim to ±1/sqrt(D)
with a straight-through estimator.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from speechbrain_tpu.nnet.linear import Linear


class BSQ(nn.Module):
    """(B, T, D_in) -> quantized codes + indices.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> q = BSQ(dim=8)
    >>> x = jnp.ones((2, 5, 16))
    >>> p = q.init(jax.random.PRNGKey(0), x)
    >>> out = q.apply(p, x)
    >>> out["quantized"].shape, out["indices"].shape
    ((2, 5, 16), (2, 5))
    """

    dim: int = 16
    entropy_loss_weight: float = 0.0
    diversity_gamma: float = 1.0
    inv_temperature: float = 100.0

    @nn.compact
    def __call__(self, x):
        d_in = x.shape[-1]
        z = Linear(self.dim, name="proj_in")(x)
        z = z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-8)
        scale = 1.0 / jnp.sqrt(float(self.dim))
        q = jnp.where(z >= 0, scale, -scale)
        # straight-through
        q_st = z + jax.lax.stop_gradient(q - z)
        bits = (z >= 0).astype(jnp.int32)
        weights = 2 ** jnp.arange(self.dim)
        indices = jnp.sum(bits * weights, axis=-1)
        out = Linear(d_in, name="proj_out")(q_st)
        # Entropy auxiliary (the reference BSQ's
        # entropy_loss_weight/diversity_gamma pair): per-bit soft
        # probabilities give a differentiable surrogate — minimize
        # per-sample entropy (confident bits) while maximizing the
        # BATCH-mean entropy (all bits used).
        p = jax.nn.sigmoid(self.inv_temperature * z)

        def _H(pr):
            pr = jnp.clip(pr, 1e-6, 1 - 1e-6)
            return -(pr * jnp.log(pr) + (1 - pr) * jnp.log(1 - pr))

        per_sample = jnp.mean(_H(p))
        batch_mean = jnp.mean(_H(jnp.mean(p, axis=tuple(range(p.ndim - 1)))))
        aux_loss = self.entropy_loss_weight * (
            per_sample - self.diversity_gamma * batch_mean
        )
        return {"quantized": out, "codes": q_st, "indices": indices,
                "aux_loss": aux_loss}
