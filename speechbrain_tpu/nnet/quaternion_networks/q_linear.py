"""Quaternion linear layer.

Capability parity with the reference's
``speechbrain/nnet/quaternion_networks/q_linear.py`` (QLinear).
"""

import flax.linen as nn
import jax.numpy as jnp

from speechbrain_tpu.nnet.quaternion_networks.q_ops import (
    check_quaternion_input,
    quaternion_init,
    quaternion_linear_op,
)


class QLinear(nn.Module):
    """Quaternion linear: (..., 4*in) -> (..., 4*n_neurons).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> lin = QLinear(n_neurons=4)
    >>> x = jnp.ones((2, 5, 16))
    >>> p = lin.init(jax.random.PRNGKey(0), x)
    >>> lin.apply(p, x).shape
    (2, 5, 16)
    """

    n_neurons: int
    bias: bool = True
    init_criterion: str = "glorot"

    @nn.compact
    def __call__(self, x):
        check_quaternion_input(x)
        in_q = x.shape[-1] // 4

        def init_all(key):
            return quaternion_init(in_q, self.n_neurons,
                                   criterion=self.init_criterion)

        r = self.param("r_weight", lambda k: jnp.asarray(init_all(k)[0]))
        i = self.param("i_weight", lambda k: jnp.asarray(init_all(k)[1]))
        j = self.param("j_weight", lambda k: jnp.asarray(init_all(k)[2]))
        kk = self.param("k_weight", lambda k: jnp.asarray(init_all(k)[3]))
        b = (
            self.param("bias", nn.initializers.zeros, (4 * self.n_neurons,))
            if self.bias
            else None
        )
        return quaternion_linear_op(x, r, i, j, kk, b)
