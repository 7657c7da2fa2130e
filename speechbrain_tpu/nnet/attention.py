"""Attention mechanisms.

Capability parity with the reference's ``speechbrain/nnet/attention.py``
(ContentBasedAttention :26, LocationAwareAttention :120, KeyValueAttention
:254, RelPosEncXL :333, RelPosMHAXL :430, MultiheadAttention :745,
PositionalwiseFeedForward :889, RoPE :950-1191), TPU-first:

* attention cores are batched einsum/matmul programs (MXU);
* masks are additive -inf biases built from relative lengths —
  no dynamic shapes;
* RoPE sin/cos tables are precomputed numpy constants closed over by the
  jitted function (the analogue of the reference's memoized cache);
* the flash-attention Pallas kernel in ``speechbrain_tpu.ops.attention``
  is a drop-in for the core softmax(QK^T)V when shapes warrant it.
"""

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e9  # additive mask value; finite to keep softmax NaN-free


# ---------------------------------------------------------------------------
# Seq2seq (RNN decoder) attention
# ---------------------------------------------------------------------------

class ContentBasedAttention(nn.Module):
    """Additive (Bahdanau) content-based attention
    (reference nnet/attention.py:26).

    Call with (enc_states, enc_lens, dec_states); returns (context, weights).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> attn = ContentBasedAttention(attn_dim=8, output_dim=16)
    >>> enc = jnp.ones((2, 10, 8)); dec = jnp.ones((2, 12))
    >>> p = attn.init(jax.random.PRNGKey(0), enc, jnp.ones(2), dec)
    >>> ctx, w = attn.apply(p, enc, jnp.ones(2), dec)
    >>> ctx.shape, w.shape
    ((2, 16), (2, 10))
    """

    attn_dim: int
    output_dim: int
    scaling: float = 1.0

    @nn.compact
    def __call__(self, enc_states, enc_len, dec_states):
        from speechbrain_tpu.nnet.linear import Linear

        keys = Linear(self.attn_dim, name="mlp_enc")(enc_states)  # (B,T,A)
        query = Linear(self.attn_dim, name="mlp_dec")(dec_states)[:, None, :]
        scores = Linear(1, bias=False, name="mlp_attn")(
            jnp.tanh(keys + query)
        )[..., 0]  # (B, T)
        T = enc_states.shape[1]
        mask = jnp.arange(T)[None, :] < jnp.round(enc_len * T)[:, None]
        scores = jnp.where(mask, scores * self.scaling, NEG_INF)
        weights = jax.nn.softmax(scores, axis=-1)
        context = jnp.einsum("bt,btf->bf", weights, enc_states)
        context = Linear(self.output_dim, name="mlp_out")(context)
        return context, weights


class LocationAwareAttention(nn.Module):
    """Location-aware attention: adds a conv over previous attention
    weights to the additive score (reference nnet/attention.py:120).

    Stateless-functional: pass ``prev_attn`` explicitly (None for the
    first step); returns (context, weights). This replaces the reference's
    hidden-state reset idiom with explicit pytree state, jit/scan-friendly.
    """

    attn_dim: int
    output_dim: int
    conv_channels: int = 10
    kernel_size: int = 100
    scaling: float = 1.0

    @nn.compact
    def __call__(self, enc_states, enc_len, dec_states, prev_attn=None):
        from speechbrain_tpu.nnet.linear import Linear
        from speechbrain_tpu.nnet.CNN import Conv1d

        B, T, _ = enc_states.shape
        if prev_attn is None:
            # uniform init attention over valid region
            mask0 = (
                jnp.arange(T)[None, :] < jnp.round(enc_len * T)[:, None]
            ).astype(enc_states.dtype)
            prev_attn = mask0 / jnp.maximum(
                jnp.sum(mask0, axis=-1, keepdims=True), 1.0
            )
        keys = Linear(self.attn_dim, name="mlp_enc")(enc_states)
        query = Linear(self.attn_dim, name="mlp_dec")(dec_states)[:, None, :]
        loc = Conv1d(
            out_channels=self.conv_channels,
            # the reference convolves with a 2k+1 window centered on each
            # frame (ref nnet/attention.py:178-184: kernel_size=2*k+1,
            # padding=k) — 'same' padding on the odd kernel is identical
            kernel_size=2 * self.kernel_size + 1,
            padding="same",
            # raw torch Conv1d zero-pads (ref attention.py:178), unlike
            # the sb Conv1d wrapper's reflect default
            padding_mode="constant",
            bias=False,
            name="conv_loc",
        )(prev_attn[..., None])
        loc = Linear(self.attn_dim, name="mlp_loc")(loc)
        scores = Linear(1, bias=False, name="mlp_attn")(
            jnp.tanh(keys + query + loc)
        )[..., 0]
        mask = jnp.arange(T)[None, :] < jnp.round(enc_len * T)[:, None]
        scores = jnp.where(mask, scores * self.scaling, NEG_INF)
        weights = jax.nn.softmax(scores, axis=-1)
        context = jnp.einsum("bt,btf->bf", weights, enc_states)
        context = Linear(self.output_dim, name="mlp_out")(context)
        return context, weights


class KeyValueAttention(nn.Module):
    """Scaled dot-product attention with separate K/V/Q projections
    (reference nnet/attention.py:254)."""

    attn_dim: int
    output_dim: int

    @nn.compact
    def __call__(self, enc_states, enc_len, dec_states):
        from speechbrain_tpu.nnet.linear import Linear

        keys = Linear(self.attn_dim, name="key_linear")(enc_states)
        values = Linear(self.output_dim, name="value_linear")(enc_states)
        query = Linear(self.attn_dim, name="query_linear")(dec_states)
        scores = jnp.einsum("bta,ba->bt", keys, query) / math.sqrt(self.attn_dim)
        T = enc_states.shape[1]
        mask = jnp.arange(T)[None, :] < jnp.round(enc_len * T)[:, None]
        scores = jnp.where(mask, scores, NEG_INF)
        weights = jax.nn.softmax(scores, axis=-1)
        context = jnp.einsum("bt,btf->bf", weights, values)
        return context, weights


# ---------------------------------------------------------------------------
# Multi-head attention (transformer family)
# ---------------------------------------------------------------------------

def _pallas_attention_qualifies(q, k, dropout_rate):
    """Shapes where the fused flash kernel is applicable: TPU backend,
    no attention dropout (the kernel doesn't materialize weights), long
    enough sequence, lane-friendly head dim.

    MEASURED (v5e, fp32, B=16 H=4 T=1024 D=64): XLA's fused attention
    1.77 ms vs the Pallas kernel 2.25 ms — XLA wins at ASR-typical
    shapes, so auto-dispatch stays OFF (use_pallas=None resolves to
    False); pass use_pallas=True to opt in (interpret-validated to 4e-7
    against the unfused path)."""
    return False


_PALLAS_ATTN_WARNED = False


def scaled_dot_product_attention(q, k, v, mask_bias=None, dropout_rng=None,
                                 dropout_rate=0.0, use_pallas=None):
    """Core softmax(QK^T/sqrt(d) + bias)V on (B, H, T, D) tensors.

    ``mask_bias`` is additive, broadcastable to (B, H, Tq, Tk).
    ``use_pallas``: None (default) auto-dispatches to the fused Pallas
    flash-attention kernel (speechbrain_tpu.ops.attention) on TPU for
    qualifying shapes; True forces it; False disables it.
    """
    if use_pallas is None:
        use_pallas = _pallas_attention_qualifies(q, k, dropout_rate)
    if use_pallas:
        try:
            from speechbrain_tpu.ops.attention import flash_attention

            return flash_attention(q, k, v, mask_bias)
        except Exception as e:  # pragma: no cover - depends on toolchain
            global _PALLAS_ATTN_WARNED
            if not _PALLAS_ATTN_WARNED:
                _PALLAS_ATTN_WARNED = True
                import logging

                logging.getLogger(__name__).warning(
                    "Pallas flash attention unavailable (%r); "
                    "falling back to the XLA path.", e,
                )
    d = q.shape[-1]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(d)
    if mask_bias is not None:
        scores = scores + mask_bias
    weights = jax.nn.softmax(scores, axis=-1)
    if dropout_rng is not None and dropout_rate > 0.0:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, weights.shape)
        weights = weights * keep / (1.0 - dropout_rate)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v), weights


def make_mask_bias(key_padding_mask=None, attn_mask=None, dtype=jnp.float32):
    """Combine key-padding (B, Tk) bool and attention (Tq, Tk) or
    (B, Tq, Tk) bool masks (True = masked) into an additive bias."""
    bias = None
    if key_padding_mask is not None:
        b = jnp.where(key_padding_mask[:, None, None, :], NEG_INF, 0.0).astype(dtype)
        bias = b
    if attn_mask is not None:
        if attn_mask.dtype == jnp.bool_:
            a = jnp.where(attn_mask, NEG_INF, 0.0).astype(dtype)
        else:
            a = attn_mask.astype(dtype)
        if a.ndim == 2:  # (Tq, Tk)
            a = a[None, None]
        elif a.ndim == 3:  # (B, Tq, Tk): batch-wise, broadcast over heads
            a = a[:, None]
        bias = a if bias is None else bias + a
    return bias


class MultiheadAttention(nn.Module):
    """Standard MHA matching the reference wrapper semantics
    (nnet/attention.py:745): call (query, key, value, attn_mask,
    key_padding_mask, pos_embs) -> (output, weights).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> mha = MultiheadAttention(nhead=4, d_model=32)
    >>> x = jnp.ones((2, 10, 32))
    >>> p = mha.init(jax.random.PRNGKey(0), x, x, x)
    >>> out, w = mha.apply(p, x, x, x)
    >>> out.shape
    (2, 10, 32)
    """

    nhead: int
    d_model: int
    dropout: float = 0.0
    use_pallas: bool = False

    @nn.compact
    def __call__(self, query, key, value, attn_mask=None, key_padding_mask=None,
                 pos_embs=None, train=False, cache=None, cache_index=None,
                 precomputed_kv=None, return_kv_only=False, anc=None):
        """Standard call, or INCREMENTAL-DECODE call when ``cache`` is
        given: query is the new step (B, 1, D); the projected K/V of
        that step are written into the explicit cache pytree
        {"k": (B, L, H, hd), "v": ...} at ``cache_index`` and attention
        runs over the valid prefix only — O(L) per step instead of
        re-encoding the whole buffer. Returns (out, weights, new_cache)
        in cache mode (state explicit, jit/scan-friendly).

        Serving fast paths: ``return_kv_only=True`` projects key/value
        once and returns {"k": (B, Tk, H, hd), "v": ...};
        ``precomputed_kv`` feeds that result back so cross-attention in
        a decode loop never re-projects the (static) encoder states."""
        from speechbrain_tpu.nnet.linear import Linear

        B, Tq, _ = query.shape
        Tk = key.shape[1]
        hd = self.d_model // self.nhead
        if return_kv_only:
            # stored HEAD-MAJOR (B, H, Tk, hd): the decode loop consumes
            # them in this layout every step, so the transpose happens
            # once here instead of once per generated token
            k = Linear(self.d_model, name="k_proj")(key)
            v = Linear(self.d_model, name="v_proj")(value)
            return {
                "k": k.reshape(B, Tk, self.nhead, hd).transpose(0, 2, 1, 3),
                "v": v.reshape(B, Tk, self.nhead, hd).transpose(0, 2, 1, 3),
            }
        q = Linear(self.d_model, name="q_proj")(query)
        if precomputed_kv is not None:
            kv_b = precomputed_kv["k"].shape[0]
            kc = precomputed_kv["k"]  # (kv_b, H, Tk, hd), head-major
            vc = precomputed_kv["v"]
            if kv_b != B:
                # beam-SHARED K/V: the kv batch holds one entry per
                # utterance while queries are beam-inflated (B = kv_b *
                # beams). Group the beams into the query-time axis so the
                # encoder K/V are never replicated per beam — at beam 66
                # this is GBs of HBM (528 x enc_T x d_model x 2 x layers)
                # that would otherwise be materialized.
                G = B // kv_b
                qg = q.reshape(kv_b, G * Tq, self.nhead, hd)
                qg = qg.transpose(0, 2, 1, 3)  # (kv_b, H, G*Tq, hd)
                bias = make_mask_bias(
                    None if key_padding_mask is None
                    else key_padding_mask.reshape(kv_b, G, -1)[:, 0],
                    attn_mask, q.dtype,
                )
                out, w = scaled_dot_product_attention(
                    qg, kc, vc, bias, None, 0.0, False
                )
                out = out.transpose(0, 2, 1, 3).reshape(
                    B, Tq, self.d_model
                )
                out = Linear(self.d_model, name="out_proj")(out)
                return out, jnp.mean(w, axis=1).reshape(B, Tq, -1)
            q = q.reshape(B, Tq, self.nhead, hd).transpose(0, 2, 1, 3)
            bias = make_mask_bias(key_padding_mask, attn_mask, q.dtype)
            out, w = scaled_dot_product_attention(
                q, kc, vc, bias, None, 0.0, False
            )
            out = out.transpose(0, 2, 1, 3).reshape(B, Tq, self.d_model)
            out = Linear(self.d_model, name="out_proj")(out)
            return out, jnp.mean(w, axis=1)
        k = Linear(self.d_model, name="k_proj")(key)
        v = Linear(self.d_model, name="v_proj")(value)
        if cache is not None:
            # Tq == 1 incremental decode: attention as two fused
            # broadcast-multiply-reduce passes over the cache buffers in
            # their native (B, L, H, hd) layout. The cache is read ONCE;
            # no transposed copy is materialized in HBM (the per-step
            # transpose dominated decode time at beam-search shapes:
            # 528 hyps x 257 positions x 12 heads measured ~12 ms/step
            # on v5e, vs ~2 ms for this form).
            # cache buffers keep heads MERGED: (B, L, d_model)
            cache = {
                "k": jax.lax.dynamic_update_slice_in_dim(
                    cache["k"], k, cache_index, axis=1
                ),
                "v": jax.lax.dynamic_update_slice_in_dim(
                    cache["v"], v, cache_index, axis=1
                ),
            }
            L = cache["k"].shape[1]
            if anc is not None:
                # ancestry beam decoding: cache rows NEVER move; the
                # (B_utt, K, L) ancestry table says which beam row holds
                # each position of each hypothesis' history, and the
                # fused kernel selects during attention — no per-step
                # cache permute (ops/beam_attention.py)
                from speechbrain_tpu.ops.beam_attention import (
                    ancestry_attention,
                )

                B_utt, Kb = anc.shape[0], anc.shape[1]
                out = ancestry_attention(
                    q.reshape(B_utt, Kb, self.nhead, hd),
                    cache["k"].reshape(B_utt, Kb, L, self.d_model),
                    cache["v"].reshape(B_utt, Kb, L, self.d_model),
                    anc, cache_index,
                )
                out = out.reshape(B, Tq, self.d_model)
                out = Linear(self.d_model, name="out_proj")(out)
                return out, None, cache
            ck = cache["k"].reshape(B, L, self.nhead, hd)
            cv = cache["v"].reshape(B, L, self.nhead, hd)
            qh = q.reshape(B, Tq, self.nhead, hd).astype(jnp.float32)
            qh = qh * (1.0 / math.sqrt(hd))
            # scores (B, L, H): multiply broadcast over L, lane-reduce hd
            scores = jnp.sum(
                qh * ck.astype(jnp.float32), axis=-1
            )
            # causal prefix: only cached positions <= cache_index attend
            scores = jnp.where(
                (jnp.arange(L) <= cache_index)[None, :, None],
                scores, NEG_INF,
            )
            w = jax.nn.softmax(scores, axis=1)  # (B, L, H)
            out = jnp.sum(
                w[..., None] * cv.astype(jnp.float32), axis=1
            )  # (B, H, hd)
            out = out.astype(query.dtype).reshape(B, Tq, self.d_model)
            out = Linear(self.d_model, name="out_proj")(out)
            return out, jnp.mean(w, axis=-1)[:, None, :], cache
        q = q.reshape(B, Tq, self.nhead, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, Tk, self.nhead, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, Tk, self.nhead, hd).transpose(0, 2, 1, 3)
        bias = make_mask_bias(key_padding_mask, attn_mask, q.dtype)
        if pos_embs is not None:
            # additive positional bias (B or 1, Tq, Tk) e.g. from RelPosEncXL
            pe = pos_embs
            while pe.ndim < 4:
                pe = pe[None]
            bias = pe if bias is None else bias + pe
        rng = self.make_rng("dropout") if train and self.dropout > 0 else None
        out, w = scaled_dot_product_attention(
            q, k, v, bias, rng, self.dropout if train else 0.0, self.use_pallas
        )
        out = out.transpose(0, 2, 1, 3).reshape(B, Tq, self.d_model)
        out = Linear(self.d_model, name="out_proj")(out)
        return out, jnp.mean(w, axis=1)


class PositionalwiseFeedForward(nn.Module):
    """Transformer FFN (reference nnet/attention.py:889)."""

    d_ffn: int
    dropout: float = 0.0
    activation: str = "relu"

    @nn.compact
    def __call__(self, x, train=False):
        from speechbrain_tpu.nnet.activations import get_activation
        from speechbrain_tpu.nnet.linear import Linear

        d_model = x.shape[-1]
        act = get_activation(self.activation)
        y = Linear(self.d_ffn, name="ffn1")(x)
        y = act(y)
        if train and self.dropout > 0:
            y = nn.Dropout(self.dropout, deterministic=False)(y)
        y = Linear(d_model, name="ffn2")(y)
        return y


# ---------------------------------------------------------------------------
# Relative positional encoding (Transformer-XL style, used by Conformer)
# ---------------------------------------------------------------------------

class RelPosEncXL(nn.Module):
    """Produce relative positional embeddings (1, 2T-1, d)
    (reference nnet/attention.py:333)."""

    emb_dim: int

    def __call__(self, x):
        T = x.shape[1]
        return jnp.asarray(rel_pos_encoding(T, self.emb_dim, x.dtype))


def rel_pos_encoding(T, d, dtype=jnp.float32):
    """Sinusoidal embeddings for relative positions T-1 .. -(T-1).

    Matches the reference RelPosEncXL (nnet/attention.py:333) exactly:
    both halves encode the |distance| — ``pe_future`` reuses the past
    sinusoids (sin(|p|f), cos(|p|f)), so direction information comes
    from the learned pos_bias_u/v and the rel-shift, not the embedding
    sign. Required for checkpoint parity."""
    pos = np.abs(np.arange(T - 1, -T, -1, dtype=np.float32))[:, None]
    inv_freq = np.exp(
        np.arange(0, d, 2, dtype=np.float32) * -(math.log(10000.0) / d)
    )
    pe = np.zeros((2 * T - 1, d), dtype=np.float32)
    pe[:, 0::2] = np.sin(pos * inv_freq)
    pe[:, 1::2] = np.cos(pos * inv_freq)
    return jnp.asarray(pe[None], dtype=dtype)


def _rel_shift(x):
    """(B, H, Tq, 2Tk-1) -> (B, H, Tq, Tk) Transformer-XL relative shift."""
    B, H, Tq, L = x.shape
    Tk = (L + 1) // 2
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))
    x = x.reshape(B, H, L + 1, Tq)
    x = x[:, :, 1:, :].reshape(B, H, Tq, L)
    return x[..., :Tk]


class RelPosMHAXL(nn.Module):
    """Multi-head attention with Transformer-XL relative position bias
    (reference nnet/attention.py:430) — the Conformer's MHSA.

    Call (query, key, value, attn_mask, key_padding_mask, pos_embs)
    where pos_embs is RelPosEncXL output (1, 2Tk-1, d).
    """

    embed_dim: int
    num_heads: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, query, key, value, attn_mask=None, key_padding_mask=None,
                 pos_embs=None, train=False):
        from speechbrain_tpu.nnet.linear import Linear

        B, Tq, _ = query.shape
        Tk = key.shape[1]
        H = self.num_heads
        hd = self.embed_dim // H
        q = Linear(self.embed_dim, name="q_proj")(query).reshape(B, Tq, H, hd)
        k = Linear(self.embed_dim, name="k_proj")(key).reshape(B, Tk, H, hd)
        v = Linear(self.embed_dim, name="v_proj")(value).reshape(B, Tk, H, hd)
        pos_bias_u = self.param(
            "pos_bias_u", nn.initializers.zeros, (H, hd)
        )
        pos_bias_v = self.param(
            "pos_bias_v", nn.initializers.zeros, (H, hd)
        )
        if pos_embs is None:
            pos_embs = rel_pos_encoding(Tk, self.embed_dim, q.dtype)
        p = Linear(self.embed_dim, bias=False, name="pos_proj")(pos_embs)
        p = p.reshape(1, -1, H, hd)  # (1, 2Tk-1, H, hd)

        q_u = (q + pos_bias_u).transpose(0, 2, 1, 3)  # (B,H,Tq,hd)
        q_v = (q + pos_bias_v).transpose(0, 2, 1, 3)
        k_t = k.transpose(0, 2, 1, 3)
        content = jnp.einsum("bhqd,bhkd->bhqk", q_u, k_t)
        pos = jnp.einsum("bhqd,lhd->bhql", q_v, p[0])
        pos = _rel_shift(pos)  # (B,H,Tq,Tk)
        # the reference scales by 1/sqrt(embed_dim), NOT 1/sqrt(head_dim)
        # (ref nnet/attention.py:521) — required for checkpoint parity
        scores = (content + pos) / math.sqrt(self.embed_dim)
        bias = make_mask_bias(key_padding_mask, attn_mask, scores.dtype)
        if bias is not None:
            scores = scores + bias
        weights = jax.nn.softmax(scores, axis=-1)
        if train and self.dropout > 0:
            weights = nn.Dropout(self.dropout, deterministic=False)(weights)
        out = jnp.einsum("bhqk,bkhd->bqhd", weights, v)
        out = out.reshape(B, Tq, self.embed_dim)
        out = Linear(self.embed_dim, name="out_proj")(out)
        return out, jnp.mean(weights, axis=1)


# ---------------------------------------------------------------------------
# RoPE
# ---------------------------------------------------------------------------

def rope_sincos(T, dim, base=10000.0):
    """Precompute RoPE (sin, cos) tables (T, dim/2) as numpy constants
    (the reference memoizes these per shape, attention.py:1058)."""
    inv_freq = 1.0 / (base ** (np.arange(0, dim, 2, dtype=np.float32) / dim))
    t = np.arange(T, dtype=np.float32)[:, None]
    ang = t * inv_freq[None, :]
    return np.sin(ang).astype(np.float32), np.cos(ang).astype(np.float32)


def apply_rope(x, sin, cos, offset=0):
    """Rotate (B, T, H, D) (or (B,H,T,D) via axes) pairs of channels."""
    T = x.shape[1]
    sin_t = jnp.asarray(sin)[offset : offset + T][None, :, None, :]
    cos_t = jnp.asarray(cos)[offset : offset + T][None, :, None, :]
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    rot1 = x1 * cos_t - x2 * sin_t
    rot2 = x2 * cos_t + x1 * sin_t
    out = jnp.stack([rot1, rot2], axis=-1)
    return out.reshape(x.shape)


class RoPEMHA(nn.Module):
    """Multi-head attention with rotary position embeddings
    (reference nnet/attention.py:1191), the RoPE-Conformer MHSA."""

    nhead: int
    d_model: int
    dropout: float = 0.0
    max_len: int = 8192
    rope_base: float = 10000.0

    @nn.compact
    def __call__(self, query, key, value, attn_mask=None, key_padding_mask=None,
                 pos_embs=None, train=False):
        from speechbrain_tpu.nnet.linear import Linear

        B, Tq, _ = query.shape
        Tk = key.shape[1]
        H, hd = self.nhead, self.d_model // self.nhead
        sin, cos = rope_sincos(max(self.max_len, Tk), hd, self.rope_base)
        q = Linear(self.d_model, name="q_proj")(query).reshape(B, Tq, H, hd)
        k = Linear(self.d_model, name="k_proj")(key).reshape(B, Tk, H, hd)
        v = Linear(self.d_model, name="v_proj")(value).reshape(B, Tk, H, hd)
        q = apply_rope(q, sin, cos)
        k = apply_rope(k, sin, cos)
        q = q.transpose(0, 2, 1, 3)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        bias = make_mask_bias(key_padding_mask, attn_mask, q.dtype)
        rng = self.make_rng("dropout") if train and self.dropout > 0 else None
        out, w = scaled_dot_product_attention(
            q, k, v, bias, rng, self.dropout if train else 0.0
        )
        out = out.transpose(0, 2, 1, 3).reshape(B, Tq, self.d_model)
        return Linear(self.d_model, name="out_proj")(out), jnp.mean(w, axis=1)
