"""Complex recurrent networks.

Capability parity with the reference's
``speechbrain/nnet/complex_networks/c_RNN.py`` (CRNN, CLSTM, CLiGRU):
recurrences whose input/recurrent transforms are complex products.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from speechbrain_tpu.nnet.complex_networks.c_linear import CLinear
from speechbrain_tpu.nnet.complex_networks.c_ops import complex_linear_op, complex_init


def _scan_time(cell, h0, xs):
    h_last, ys = jax.lax.scan(cell, h0, jnp.moveaxis(xs, 1, 0))
    return h_last, jnp.moveaxis(ys, 0, 1)


class CRNN(nn.Module):
    """Vanilla complex RNN: h = tanh(Wx + Uh)
    (complex units; output dim = 2*hidden_size).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> net = CRNN(hidden_size=4)
    >>> x = jnp.ones((2, 6, 8))
    >>> p = net.init(jax.random.PRNGKey(0), x)
    >>> out, h = net.apply(p, x)
    >>> out.shape
    (2, 6, 8)
    """

    hidden_size: int
    num_layers: int = 1

    @nn.compact
    def __call__(self, x, hx=None):
        B = x.shape[0]
        H = self.hidden_size
        out = x
        finals = []
        for layer in range(self.num_layers):
            gx = CLinear(H, name=f"wx_{layer}")(out)

            def make_params(name):
                def init(key):
                    r, i = complex_init(H, H)
                    return jnp.asarray(r), jnp.asarray(i)

                return (
                    self.param(f"{name}_r_{layer}", lambda k: init(k)[0]),
                    self.param(f"{name}_i_{layer}", lambda k: init(k)[1]),
                )

            ur, ui = make_params("u")

            def cell(h, g):
                h_new = jnp.tanh(g + complex_linear_op(h, ur, ui))
                return h_new, h_new

            h0 = jnp.zeros((B, 2 * H), x.dtype)
            h_last, out = _scan_time(cell, h0, gx)
            finals.append(h_last)
        return out, jnp.stack(finals)


class CLSTM(nn.Module):
    """Complex LSTM (gates from complex products, real gate activations).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> net = CLSTM(hidden_size=4)
    >>> x = jnp.ones((2, 6, 8))
    >>> p = net.init(jax.random.PRNGKey(0), x)
    >>> out, (h, c) = net.apply(p, x)
    >>> out.shape
    (2, 6, 8)
    """

    hidden_size: int
    num_layers: int = 1

    @nn.compact
    def __call__(self, x, hx=None):
        B = x.shape[0]
        H = self.hidden_size
        out = x
        fh, fc = [], []
        for layer in range(self.num_layers):
            gx = CLinear(4 * H, name=f"wx_{layer}")(out)

            def init(key, which):
                r, i = complex_init(H, 4 * H)
                return jnp.asarray(r if which == 0 else i)

            ur = self.param(f"u_r_{layer}", lambda k: init(k, 0))
            ui = self.param(f"u_i_{layer}", lambda k: init(k, 1))

            def cell(carry, g):
                h, c = carry
                gates = g + complex_linear_op(h, ur, ui)
                # split complex 4H block into 4 complex gates
                gr, gi = gates[..., : 4 * H], gates[..., 4 * H :]
                def gate(k):
                    return jnp.concatenate(
                        [gr[..., k * H : (k + 1) * H], gi[..., k * H : (k + 1) * H]],
                        axis=-1,
                    )
                i_g = jax.nn.sigmoid(gate(0))
                f_g = jax.nn.sigmoid(gate(1))
                g_g = jnp.tanh(gate(2))
                o_g = jax.nn.sigmoid(gate(3))
                c = f_g * c + i_g * g_g
                h = o_g * jnp.tanh(c)
                return (h, c), h

            h0 = jnp.zeros((B, 2 * H), x.dtype)
            c0 = jnp.zeros((B, 2 * H), x.dtype)
            (h_last, c_last), out = _scan_time(cell, (h0, c0), gx)
            fh.append(h_last)
            fc.append(c_last)
        return out, (jnp.stack(fh), jnp.stack(fc))


class CLiGRU(nn.Module):
    """Complex light GRU (reference c_RNN.py CLiGRU)."""

    hidden_size: int
    num_layers: int = 1

    @nn.compact
    def __call__(self, x, hx=None):
        B = x.shape[0]
        H = self.hidden_size
        out = x
        finals = []
        for layer in range(self.num_layers):
            gx = CLinear(2 * H, name=f"wx_{layer}")(out)

            def init(key, which):
                r, i = complex_init(H, 2 * H)
                return jnp.asarray(r if which == 0 else i)

            ur = self.param(f"u_r_{layer}", lambda k: init(k, 0))
            ui = self.param(f"u_i_{layer}", lambda k: init(k, 1))

            def cell(h, g):
                gates = g + complex_linear_op(h, ur, ui)
                gr, gi = gates[..., : 2 * H], gates[..., 2 * H :]
                z = jax.nn.sigmoid(
                    jnp.concatenate([gr[..., :H], gi[..., :H]], axis=-1)
                )
                hcand = jax.nn.relu(
                    jnp.concatenate([gr[..., H:], gi[..., H:]], axis=-1)
                )
                h_new = z * h + (1 - z) * hcand
                return h_new, h_new

            h0 = jnp.zeros((B, 2 * H), x.dtype)
            h_last, out = _scan_time(cell, h0, gx)
            finals.append(h_last)
        return out, jnp.stack(finals)
