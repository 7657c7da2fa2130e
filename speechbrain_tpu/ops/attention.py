"""Flash attention Pallas kernel for TPU.

Online-softmax attention: O(T) memory, never materializing the (Tq, Tk)
score matrix in HBM. Drop-in for the core of
``speechbrain_tpu.nnet.attention.scaled_dot_product_attention`` (the
Conformer/Transformer MHSA hot loop — reference ATen's softmax(QK^T)V).

Supports an optional additive bias (key-padding / chunked / causal masks
as -inf biases), broadcast over batch/heads: shape (Tq, Tk) or
(B, H, Tq, Tk).
"""

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, block_k, scale):
    # q_ref: (1, block_q, D); k/v_ref: (1, Tk, D); bias_ref: (1, block_q, Tk)
    q = q_ref[0] * scale  # (bq, D)
    Tk = k_ref.shape[1]
    bq, D = q.shape
    n_kb = Tk // block_k

    def body(i, carry):
        m_prev, l_prev, acc = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :]  # (bk, D)
        v = v_ref[0, pl.ds(i * block_k, block_k), :]
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # (bq, bk)
        if bias_ref is not None:
            s = s + bias_ref[0, :, pl.ds(i * block_k, block_k)]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(p, v, preferred_element_type=jnp.float32)
        return m_new, l_new, acc

    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc0 = jnp.zeros((bq, D), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_kb, body, (m0, l0, acc0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "interpret"))
def flash_attention(q, k, v, bias=None, block_q=128, block_k=128, interpret=False):
    """softmax(q k^T / sqrt(d) + bias) v with online softmax.

    q: (B, H, Tq, D); k/v: (B, H, Tk, D); bias None, (Tq, Tk) or
    (B, H, Tq, Tk). Returns ((B, H, Tq, D), None) matching the unfused
    core's (output, weights) contract (weights are not materialized).
    """
    B, H, Tq, D = q.shape
    Tk = k.shape[2]
    scale = 1.0 / math.sqrt(D)
    # pad sequence dims to block multiples
    pad_q = (-Tq) % block_q
    pad_k = (-Tk) % block_k
    if pad_q or pad_k:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
        if bias is None:
            bias = jnp.zeros((Tq, Tk), q.dtype)
        pad_cfg = [(0, pad_q), (0, pad_k)]
        if bias.ndim == 4:
            pad_cfg = [(0, 0), (0, 0)] + pad_cfg
        bias = jnp.pad(bias, pad_cfg, constant_values=NEG_INF / 2)
    Tq_p, Tk_p = q.shape[2], k.shape[2]
    qf = q.reshape(B * H, Tq_p, D)
    kf = k.reshape(B * H, Tk_p, D)
    vf = v.reshape(B * H, Tk_p, D)
    grid = (B * H, Tq_p // block_q)
    in_specs = [
        pl.BlockSpec((1, block_q, D), lambda bh, i: (bh, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Tk_p, D), lambda bh, i: (bh, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Tk_p, D), lambda bh, i: (bh, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [qf, kf, vf]
    if bias is not None:
        if bias.ndim == 2:
            biasf = jnp.broadcast_to(bias[None], (1, Tq_p, Tk_p))
            in_specs.append(
                pl.BlockSpec((1, block_q, Tk_p), lambda bh, i: (0, i, 0),
                             memory_space=pltpu.VMEM)
            )
        else:
            biasf = bias.reshape(B * H, Tq_p, Tk_p)
            in_specs.append(
                pl.BlockSpec((1, block_q, Tk_p), lambda bh, i: (bh, i, 0),
                             memory_space=pltpu.VMEM)
            )
        operands.append(biasf)
        kernel = functools.partial(_flash_kernel, block_k=block_k, scale=scale)
    else:
        kernel = functools.partial(
            _no_bias_kernel, block_k=block_k, scale=scale
        )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B * H, Tq_p, D), q.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, block_q, D), lambda bh, i: (bh, i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(*operands)
    out = out.reshape(B, H, Tq_p, D)[:, :, :Tq]
    return out, None


def _no_bias_kernel(q_ref, k_ref, v_ref, o_ref, *, block_k, scale):
    _flash_kernel(q_ref, k_ref, v_ref, None, o_ref, block_k=block_k, scale=scale)
