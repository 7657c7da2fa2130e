"""Quaternion algebra on [r | i | j | k] concatenated tensors.

Capability parity with the reference's
``speechbrain/nnet/quaternion_networks/q_ops.py`` (quaternion_linear_op,
quaternion_init, check_quaternion_input).
"""

import jax.numpy as jnp
import numpy as np


def check_quaternion_input(x):
    """Validate that the trailing dim splits into 4 quaternion parts."""
    if x.shape[-1] % 4 != 0:
        raise ValueError(
            f"Quaternion tensors need feature dim divisible by 4, got {x.shape[-1]}"
        )


def quaternion_linear_op(x, r, i, j, k, bias=None):
    """Hamilton product x * W as one real matmul.

    x: (..., 4*in); r/i/j/k: (in, out). Returns (..., 4*out).

    Example
    -------
    >>> import jax.numpy as jnp
    >>> # (i) * (j) = k
    >>> x = jnp.asarray([[0.0, 1.0, 0.0, 0.0]])
    >>> z = jnp.zeros((1, 1)); o = jnp.ones((1, 1))
    >>> quaternion_linear_op(x, z, z, o, z).tolist()
    [[0.0, 0.0, 0.0, 1.0]]
    """
    row1 = jnp.concatenate([r, i, j, k], axis=1)
    row2 = jnp.concatenate([-i, r, -k, j], axis=1)
    row3 = jnp.concatenate([-j, k, r, -i], axis=1)
    row4 = jnp.concatenate([-k, -j, i, r], axis=1)
    W = jnp.concatenate([row1, row2, row3, row4], axis=0)  # (4in, 4out)
    y = jnp.matmul(x, W)
    if bias is not None:
        y = y + bias
    return y


def quaternion_init(in_features, out_features, kernel_size=None,
                    criterion="glorot", rng=None):
    """Quaternion-aware init (Parcollet et al.): modulus Chi(4), random
    unit purely-imaginary axis, uniform phase."""
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
        s = 1.0 / np.sqrt(2 * (fan_in + fan_out))
    else:
        s = 1.0 / np.sqrt(2 * fan_in)
    modulus = rng.rayleigh(scale=s, size=shape)
    phase = rng.uniform(-np.pi, np.pi, size=shape)
    v = rng.uniform(-1, 1, size=(3,) + shape)
    v = v / np.maximum(np.linalg.norm(v, axis=0, keepdims=True), 1e-9)
    r = (modulus * np.cos(phase)).astype(np.float32)
    i = (modulus * v[0] * np.sin(phase)).astype(np.float32)
    j = (modulus * v[1] * np.sin(phase)).astype(np.float32)
    k = (modulus * v[2] * np.sin(phase)).astype(np.float32)
    return r, i, j, k
