"""Complex linear layer.

Capability parity with the reference's
``speechbrain/nnet/complex_networks/c_linear.py`` (CLinear).
"""

import flax.linen as nn
import jax.numpy as jnp

from speechbrain_tpu.nnet.complex_networks.c_ops import (
    check_complex_input,
    complex_init,
    complex_linear_op,
)


class CLinear(nn.Module):
    """Complex linear: (..., 2*in) -> (..., 2*n_neurons).

    ``n_neurons`` counts COMPLEX units (output dim = 2*n_neurons), the
    reference's convention.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> lin = CLinear(n_neurons=8)
    >>> x = jnp.ones((4, 10, 32))
    >>> p = lin.init(jax.random.PRNGKey(0), x)
    >>> lin.apply(p, x).shape
    (4, 10, 16)
    """

    n_neurons: int
    bias: bool = True
    init_criterion: str = "glorot"
    weight_init: str = "complex"

    @nn.compact
    def __call__(self, x):
        check_complex_input(x)
        in_complex = x.shape[-1] // 2

        def init_fn(key):
            r, i = complex_init(in_complex, self.n_neurons,
                                criterion=self.init_criterion)
            return jnp.asarray(r), jnp.asarray(i)

        real_w = self.param("real_weight", lambda k: init_fn(k)[0])
        imag_w = self.param("imag_weight", lambda k: init_fn(k)[1])
        b = (
            self.param("bias", nn.initializers.zeros, (2 * self.n_neurons,))
            if self.bias
            else None
        )
        return complex_linear_op(x, real_w, imag_w, b)
