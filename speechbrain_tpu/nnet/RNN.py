"""Recurrent layers via lax.scan, TPU-first.

Capability parity with the reference's ``speechbrain/nnet/RNN.py``
(RNN :65, LSTM :187, GRU :305, LiGRU :1016, SLiGRU :1430, QuasiRNN :2041,
AttentionalRNNDecoder :767). Design notes:

* input-to-hidden projections for ALL timesteps are hoisted out of the
  scan into one big batched matmul (MXU), so the scan body only does the
  small recurrent matmul — the same trick the reference's jitted LiGRU
  loop plays, but expressed for XLA;
* bidirectionality = scan + reversed scan, concatenated;
* QuasiRNN's fo-pooling uses an associative scan (log-depth on TPU);
* all state is explicit (pass/return hidden pytrees) — streaming-friendly.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _scan_time(cell_fn, h0, xs, reverse=False):
    """Scan cell_fn over time axis 1 of xs (B, T, ...)."""
    xs_t = jnp.moveaxis(xs, 1, 0)
    h_last, ys = jax.lax.scan(cell_fn, h0, xs_t, reverse=reverse)
    return h_last, jnp.moveaxis(ys, 0, 1)


class _RNNBase(nn.Module):
    """Shared multi-layer / bidirectional driver."""

    hidden_size: int
    num_layers: int = 1
    bidirectional: bool = False
    dropout: float = 0.0
    re_init: bool = True

    def _layer(self, i, direction, x, h0, train):
        raise NotImplementedError

    def _init_carry(self, batch, dtype):
        raise NotImplementedError

    def _run(self, x, hx=None, train=False):
        B = x.shape[0]
        dirs = 2 if self.bidirectional else 1
        out = x
        final_states = []
        for layer in range(self.num_layers):
            layer_outs = []
            for d in range(dirs):
                h0 = (
                    self._init_carry(B, x.dtype)
                    if hx is None
                    else jax.tree_util.tree_map(
                        lambda t: t[layer * dirs + d], hx
                    )
                )
                h_last, ys = self._layer(layer, d, out, h0, train)
                layer_outs.append(ys)
                final_states.append(h_last)
            out = (
                jnp.concatenate(layer_outs, axis=-1) if dirs == 2 else layer_outs[0]
            )
            if train and self.dropout > 0 and layer < self.num_layers - 1:
                out = nn.Dropout(self.dropout, deterministic=False)(out)
        hn = jax.tree_util.tree_map(lambda *ts: jnp.stack(ts), *final_states)
        return out, hn


class LSTM(_RNNBase):
    """Multi-layer (bi)LSTM on (batch, time, feat)
    (reference nnet/RNN.py:187).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> net = LSTM(hidden_size=5)
    >>> x = jnp.ones((4, 10, 20))
    >>> p = net.init(jax.random.PRNGKey(0), x)
    >>> out, (h, c) = net.apply(p, x)
    >>> out.shape
    (4, 10, 5)
    """

    @nn.compact
    def __call__(self, x, hx=None, train=False):
        return self._run(x, hx, train)

    def _init_carry(self, batch, dtype):
        return (
            jnp.zeros((batch, self.hidden_size), dtype),
            jnp.zeros((batch, self.hidden_size), dtype),
        )

    def _layer(self, i, d, x, h0, train):
        from speechbrain_tpu.nnet.linear import Linear

        H = self.hidden_size
        # hoisted input projection: one matmul for all timesteps
        gates_x = Linear(4 * H, name=f"wx_l{i}_d{d}")(x)
        w_h = self.param(
            f"wh_l{i}_d{d}", nn.initializers.orthogonal(), (H, 4 * H)
        )

        def cell(carry, gx):
            h, c = carry
            gates = gx + jnp.matmul(h, w_h)
            i_g, f_g, g_g, o_g = jnp.split(gates, 4, axis=-1)
            i_g = jax.nn.sigmoid(i_g)
            f_g = jax.nn.sigmoid(f_g)
            g_g = jnp.tanh(g_g)
            o_g = jax.nn.sigmoid(o_g)
            c = f_g * c + i_g * g_g
            h = o_g * jnp.tanh(c)
            return (h, c), h

        return _scan_time(cell, h0, gates_x, reverse=bool(d))


class GRU(_RNNBase):
    """Multi-layer (bi)GRU (reference nnet/RNN.py:305)."""

    @nn.compact
    def __call__(self, x, hx=None, train=False):
        return self._run(x, hx, train)

    def _init_carry(self, batch, dtype):
        return jnp.zeros((batch, self.hidden_size), dtype)

    def _layer(self, i, d, x, h0, train):
        from speechbrain_tpu.nnet.linear import Linear

        H = self.hidden_size
        gates_x = Linear(3 * H, name=f"wx_l{i}_d{d}")(x)
        w_h = self.param(
            f"wh_l{i}_d{d}", nn.initializers.orthogonal(), (H, 3 * H)
        )
        b_h = self.param(f"bh_l{i}_d{d}", nn.initializers.zeros, (3 * H,))

        def cell(h, gx):
            gh = jnp.matmul(h, w_h) + b_h
            xr, xz, xn = jnp.split(gx, 3, axis=-1)
            hr, hz, hn = jnp.split(gh, 3, axis=-1)
            r = jax.nn.sigmoid(xr + hr)
            z = jax.nn.sigmoid(xz + hz)
            n = jnp.tanh(xn + r * hn)
            h = (1 - z) * n + z * h
            return h, h

        return _scan_time(cell, h0, gates_x, reverse=bool(d))


class RNN(_RNNBase):
    """Vanilla (bi)RNN with tanh/relu nonlinearity (reference nnet/RNN.py:65)."""

    nonlinearity: str = "tanh"

    @nn.compact
    def __call__(self, x, hx=None, train=False):
        return self._run(x, hx, train)

    def _init_carry(self, batch, dtype):
        return jnp.zeros((batch, self.hidden_size), dtype)

    def _layer(self, i, d, x, h0, train):
        from speechbrain_tpu.nnet.linear import Linear

        H = self.hidden_size
        gx = Linear(H, name=f"wx_l{i}_d{d}")(x)
        w_h = self.param(f"wh_l{i}_d{d}", nn.initializers.orthogonal(), (H, H))
        act = jnp.tanh if self.nonlinearity == "tanh" else jax.nn.relu

        def cell(h, g):
            h = act(g + jnp.matmul(h, w_h))
            return h, h

        return _scan_time(cell, h0, gx, reverse=bool(d))


class LiGRU(_RNNBase):
    """Light-gated recurrent unit: single update gate, ReLU activation,
    batch-norm on the hoisted input projection (reference nnet/RNN.py:1016).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> net = LiGRU(hidden_size=5)
    >>> x = jnp.ones((4, 10, 20))
    >>> v = net.init(jax.random.PRNGKey(0), x, train=False)
    >>> out, h = net.apply(v, x, train=False)
    >>> out.shape
    (4, 10, 5)
    """

    nonlinearity: str = "relu"
    normalization: str = "batchnorm"

    @nn.compact
    def __call__(self, x, hx=None, train=False):
        return self._run(x, hx, train)

    def _init_carry(self, batch, dtype):
        return jnp.zeros((batch, self.hidden_size), dtype)

    def _layer(self, i, d, x, h0, train):
        from speechbrain_tpu.nnet.linear import Linear
        from speechbrain_tpu.nnet.normalization import BatchNorm1d, LayerNorm

        H = self.hidden_size
        gx = Linear(2 * H, bias=False, name=f"wx_l{i}_d{d}")(x)
        if self.normalization == "batchnorm":
            gx = BatchNorm1d(name=f"norm_l{i}_d{d}")(gx, train=train)
        elif self.normalization == "layernorm":
            gx = LayerNorm(name=f"norm_l{i}_d{d}")(gx)
        w_h = self.param(
            f"wh_l{i}_d{d}", nn.initializers.orthogonal(), (H, 2 * H)
        )
        act = jax.nn.relu if self.nonlinearity == "relu" else (
            jnp.tanh if self.nonlinearity == "tanh" else jnp.sin
        )

        def cell(h, g):
            gh = jnp.matmul(h, w_h)
            az, ah = jnp.split(g + gh, 2, axis=-1)
            z = jax.nn.sigmoid(az)
            hcand = act(ah)
            h = z * h + (1 - z) * hcand
            return h, h

        return _scan_time(cell, h0, gx, reverse=bool(d))


class SLiGRU(LiGRU):
    """Stabilized LiGRU: layer-norm on the recurrent pre-activation
    (reference nnet/RNN.py:1430)."""

    def _layer(self, i, d, x, h0, train):
        from speechbrain_tpu.nnet.linear import Linear
        from speechbrain_tpu.nnet.normalization import BatchNorm1d

        H = self.hidden_size
        gx = Linear(2 * H, bias=False, name=f"wx_l{i}_d{d}")(x)
        gx = BatchNorm1d(name=f"norm_l{i}_d{d}")(gx, train=train)
        w_h = self.param(
            f"wh_l{i}_d{d}", nn.initializers.orthogonal(), (H, 2 * H)
        )
        act = jax.nn.relu

        def cell(h, g):
            gh = jnp.matmul(h, w_h)
            # stabilize: normalize recurrent contribution (zero-mean/unit-var)
            mean = jnp.mean(gh, axis=-1, keepdims=True)
            var = jnp.var(gh, axis=-1, keepdims=True)
            gh = (gh - mean) * jax.lax.rsqrt(var + 1e-5)
            az, ah = jnp.split(g + gh, 2, axis=-1)
            z = jax.nn.sigmoid(az)
            h = z * h + (1 - z) * act(ah)
            return h, h

        return _scan_time(cell, h0, gx, reverse=bool(d))


class QuasiRNN(nn.Module):
    """Quasi-RNN: causal conv gates + fo-pooling recurrence
    (reference nnet/RNN.py:2041). The fo-pool c_t = f_t*c_{t-1} +
    (1-f_t)*z_t is a linear recurrence solved with an associative scan —
    log-depth on TPU instead of a sequential loop.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> net = QuasiRNN(hidden_size=6)
    >>> x = jnp.ones((2, 12, 8))
    >>> p = net.init(jax.random.PRNGKey(0), x)
    >>> out, h = net.apply(p, x)
    >>> out.shape
    (2, 12, 6)
    """

    hidden_size: int
    num_layers: int = 1
    kernel_size: int = 2
    bidirectional: bool = False
    zoneout: float = 0.0
    output_gate: bool = True

    @nn.compact
    def __call__(self, x, hx=None, train=False):
        from speechbrain_tpu.nnet.CNN import Conv1d

        H = self.hidden_size
        dirs = 2 if self.bidirectional else 1
        out = x
        finals = []
        for layer in range(self.num_layers):
            outs = []
            for d in range(dirs):
                inp = out if d == 0 else out[:, ::-1]
                n_gates = 3 if self.output_gate else 2
                gates = Conv1d(
                    out_channels=n_gates * H,
                    kernel_size=self.kernel_size,
                    padding="causal",
                    name=f"conv_l{layer}_d{d}",
                )(inp)
                if self.output_gate:
                    z, f, o = jnp.split(gates, 3, axis=-1)
                else:
                    z, f = jnp.split(gates, 2, axis=-1)
                z = jnp.tanh(z)
                f = jax.nn.sigmoid(f)
                # fo-pool as associative scan over (f, (1-f)*z)
                def combine(a, b):
                    fa, xa = a
                    fb, xb = b
                    return fa * fb, xb + fb * xa

                fs, cs = jax.lax.associative_scan(
                    combine, (f, (1 - f) * z), axis=1
                )
                c = cs
                h = jax.nn.sigmoid(o) * c if self.output_gate else c
                if d == 1:
                    h = h[:, ::-1]
                outs.append(h)
                finals.append(c[:, -1])
            out = jnp.concatenate(outs, axis=-1) if dirs == 2 else outs[0]
        hn = jnp.stack(finals)
        return out, hn


class AttentionalRNNDecoder(nn.Module):
    """GRU/LSTM decoder with content or location-aware attention
    (reference nnet/RNN.py:767) — the CRDNN seq2seq decoder.

    Functional streaming API: ``step(params-bound apply)`` consumes one
    token embedding and explicit state; ``__call__`` teacher-forces a
    whole sequence with lax.scan.
    """

    hidden_size: int
    attn_dim: int
    num_layers: int = 1
    rnn_type: str = "gru"
    attn_type: str = "location"
    scaling: float = 1.0
    channels: int = 10
    kernel_size: int = 100
    dropout: float = 0.0

    def setup(self):
        from speechbrain_tpu.nnet.attention import (
            ContentBasedAttention,
            KeyValueAttention,
            LocationAwareAttention,
        )
        from speechbrain_tpu.nnet.linear import Linear

        # context vectors have size attn_dim, the reference convention
        # (ref nnet/RNN.py:874-899 passes output_dim=attn_dim; the cell
        # consumes input_size + attn_dim and proj maps
        # hidden + attn_dim -> hidden) — required for checkpoint pours
        if self.attn_type == "content":
            self.attn = ContentBasedAttention(
                attn_dim=self.attn_dim,
                output_dim=self.attn_dim,
                scaling=self.scaling,
            )
        elif self.attn_type == "location":
            self.attn = LocationAwareAttention(
                attn_dim=self.attn_dim,
                output_dim=self.attn_dim,
                conv_channels=self.channels,
                kernel_size=self.kernel_size,
                scaling=self.scaling,
            )
        elif self.attn_type == "keyvalue":
            self.attn = KeyValueAttention(
                attn_dim=self.attn_dim, output_dim=self.attn_dim
            )
        else:
            raise ValueError(f"Unknown attn_type {self.attn_type}")
        self.proj = Linear(self.hidden_size, name="proj")
        H = self.hidden_size
        # per-layer GRU weights (input proj + recurrent)
        self.wx = [
            Linear(3 * H, name=f"wx_{l}") for l in range(self.num_layers)
        ]
        self.wh = [
            self.param(f"wh_{l}", nn.initializers.orthogonal(), (H, 3 * H))
            for l in range(self.num_layers)
        ]
        self.bh = [
            self.param(f"bh_{l}", nn.initializers.zeros, (3 * H,))
            for l in range(self.num_layers)
        ]

    def _gru_step(self, layer, h, x):
        gx = self.wx[layer](x)
        gh = jnp.matmul(h, self.wh[layer]) + self.bh[layer]
        xr, xz, xn = jnp.split(gx, 3, axis=-1)
        hr, hz, hn = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        return (1 - z) * n + z * h

    def init_state(self, batch, enc_T, dtype=jnp.float32):
        """Explicit decoder state pytree. All leaves are batch-leading so
        beam search can permute hypotheses with a single axis-0 gather
        (decoders/seq2seq.py permute_mem)."""
        return {
            "hidden": jnp.zeros((batch, self.num_layers, self.hidden_size), dtype),
            "context": jnp.zeros((batch, self.attn_dim), dtype),
            "prev_attn": None,
        }

    def forward_step(self, inp, state, enc_states, enc_len):
        """One decode step: inp (B, E) token embedding; returns
        (output (B, H), new_state, attn_weights)."""
        cell_inp = jnp.concatenate([inp, state["context"]], axis=-1)
        hs = []
        x = cell_inp
        for l in range(self.num_layers):
            h = self._gru_step(l, state["hidden"][:, l], x)
            hs.append(h)
            x = h
        dec_out = x
        if self.attn_type == "location":
            context, attn = self.attn(
                enc_states, enc_len, dec_out, prev_attn=state.get("prev_attn")
            )
        else:
            context, attn = self.attn(enc_states, enc_len, dec_out)
        # reference concat order: [context, cell_out] (ref RNN.py:964)
        out = self.proj(jnp.concatenate([context, dec_out], axis=-1))
        new_state = {
            "hidden": jnp.stack(hs, axis=1),
            "context": context,
            "prev_attn": attn,
        }
        return out, new_state, attn

    def __call__(self, inp_seq, enc_states, enc_len):
        """Teacher-forced decode: inp_seq (B, U, E) -> (B, U, H), attns."""
        B, U, _ = inp_seq.shape
        state = self.init_state(B, enc_states.shape[1], inp_seq.dtype)
        # location attention carries prev_attn; seed it uniform
        T = enc_states.shape[1]
        mask0 = (
            jnp.arange(T)[None, :] < jnp.round(enc_len * T)[:, None]
        ).astype(inp_seq.dtype)
        state["prev_attn"] = mask0 / jnp.maximum(
            jnp.sum(mask0, axis=-1, keepdims=True), 1.0
        )

        outs = []
        attns = []
        for u in range(U):  # unrolled: U is the (static) label length
            out, state, attn = self.forward_step(
                inp_seq[:, u], state, enc_states, enc_len
            )
            outs.append(out)
            attns.append(attn)
        return jnp.stack(outs, axis=1), jnp.stack(attns, axis=1)
