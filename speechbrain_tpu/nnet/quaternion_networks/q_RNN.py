"""Quaternion recurrent networks.

Capability parity with the reference's
``speechbrain/nnet/quaternion_networks/q_RNN.py`` (QRNN, QLSTM, QLiGRU).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from speechbrain_tpu.nnet.quaternion_networks.q_linear import QLinear
from speechbrain_tpu.nnet.quaternion_networks.q_ops import (
    quaternion_init,
    quaternion_linear_op,
)


def _scan_time(cell, h0, xs):
    h_last, ys = jax.lax.scan(cell, h0, jnp.moveaxis(xs, 1, 0))
    return h_last, jnp.moveaxis(ys, 0, 1)


def _u_params(module, name, layer, in_q, out_q):
    def init(key, idx):
        return jnp.asarray(quaternion_init(in_q, out_q)[idx])

    return tuple(
        module.param(f"{name}_{c}_{layer}", lambda k, idx=n: init(k, idx))
        for n, c in enumerate("rijk")
    )


class QRNN(nn.Module):
    """Vanilla quaternion RNN (output dim = 4*hidden_size).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> net = QRNN(hidden_size=4)
    >>> x = jnp.ones((2, 6, 16))
    >>> p = net.init(jax.random.PRNGKey(0), x)
    >>> out, h = net.apply(p, x)
    >>> out.shape
    (2, 6, 16)
    """

    hidden_size: int
    num_layers: int = 1

    @nn.compact
    def __call__(self, x, hx=None):
        B, H = x.shape[0], self.hidden_size
        out = x
        finals = []
        for layer in range(self.num_layers):
            gx = QLinear(H, name=f"wx_{layer}")(out)
            ur, ui, uj, uk = _u_params(self, "u", layer, H, H)

            def cell(h, g):
                h_new = jnp.tanh(g + quaternion_linear_op(h, ur, ui, uj, uk))
                return h_new, h_new

            h0 = jnp.zeros((B, 4 * H), x.dtype)
            h_last, out = _scan_time(cell, h0, gx)
            finals.append(h_last)
        return out, jnp.stack(finals)


class QLSTM(nn.Module):
    """Quaternion LSTM (4 quaternion gates)."""

    hidden_size: int
    num_layers: int = 1

    @nn.compact
    def __call__(self, x, hx=None):
        B, H = x.shape[0], self.hidden_size
        out = x
        fh, fc = [], []
        for layer in range(self.num_layers):
            gx = QLinear(4 * H, name=f"wx_{layer}")(out)
            ur, ui, uj, uk = _u_params(self, "u", layer, H, 4 * H)

            def cell(carry, g):
                h, c = carry
                gates = g + quaternion_linear_op(h, ur, ui, uj, uk)
                # gates: (..., 16H) = 4 components x 4H; regroup per gate
                comp = jnp.split(gates, 4, axis=-1)  # r, i, j, k each (..., 4H)
                def gate(n):
                    return jnp.concatenate(
                        [c_[..., n * H : (n + 1) * H] for c_ in comp], axis=-1
                    )
                i_g = jax.nn.sigmoid(gate(0))
                f_g = jax.nn.sigmoid(gate(1))
                g_g = jnp.tanh(gate(2))
                o_g = jax.nn.sigmoid(gate(3))
                c_new = f_g * c + i_g * g_g
                h_new = o_g * jnp.tanh(c_new)
                return (h_new, c_new), h_new

            h0 = jnp.zeros((B, 4 * H), x.dtype)
            c0 = jnp.zeros((B, 4 * H), x.dtype)
            (h_last, c_last), out = _scan_time(cell, (h0, c0), gx)
            fh.append(h_last)
            fc.append(c_last)
        return out, (jnp.stack(fh), jnp.stack(fc))


class QLiGRU(nn.Module):
    """Quaternion light GRU."""

    hidden_size: int
    num_layers: int = 1

    @nn.compact
    def __call__(self, x, hx=None):
        B, H = x.shape[0], self.hidden_size
        out = x
        finals = []
        for layer in range(self.num_layers):
            gx = QLinear(2 * H, name=f"wx_{layer}")(out)
            ur, ui, uj, uk = _u_params(self, "u", layer, H, 2 * H)

            def cell(h, g):
                gates = g + quaternion_linear_op(h, ur, ui, uj, uk)
                comp = jnp.split(gates, 4, axis=-1)  # each (..., 2H)
                def gate(n):
                    return jnp.concatenate(
                        [c_[..., n * H : (n + 1) * H] for c_ in comp], axis=-1
                    )
                z = jax.nn.sigmoid(gate(0))
                hcand = jax.nn.relu(gate(1))
                h_new = z * h + (1 - z) * hcand
                return h_new, h_new

            h0 = jnp.zeros((B, 4 * H), x.dtype)
            h_last, out = _scan_time(cell, h0, gx)
            finals.append(h_last)
        return out, jnp.stack(finals)
