"""Rematerialized encoders must produce identical values and gradients
to the plain stacks (jax.checkpoint only changes memory/FLOPs)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speechbrain_tpu.lobes.models.transformer.Conformer import (
    ConformerEncoder,
)
from speechbrain_tpu.lobes.models.transformer.Transformer import (
    TransformerEncoder,
)
from speechbrain_tpu.nnet.attention import RelPosEncXL


@pytest.mark.parametrize("remat", [False, True])
def test_transformer_encoder_remat_grad_parity(remat):
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 16, 32)), jnp.float32
    )
    base = TransformerEncoder(num_layers=2, nhead=4, d_ffn=64, d_model=32)
    v = base.init(jax.random.PRNGKey(0), x)

    def loss(params, enc):
        out, _ = enc.apply({"params": params}, x)
        return jnp.sum(out**2)

    enc = TransformerEncoder(
        num_layers=2, nhead=4, d_ffn=64, d_model=32, remat=remat
    )
    val, grads = jax.value_and_grad(loss)(v["params"], enc)
    ref_val, ref_grads = jax.value_and_grad(loss)(v["params"], base)
    np.testing.assert_allclose(float(val), float(ref_val), rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6),
        grads, ref_grads,
    )


def test_conformer_encoder_remat_grad_parity():
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 16, 32)), jnp.float32
    )
    pe = RelPosEncXL(emb_dim=32)(x)
    base = ConformerEncoder(num_layers=2, d_model=32, d_ffn=64, nhead=4)
    v = base.init(jax.random.PRNGKey(0), x, pos_embs=pe)
    rem = ConformerEncoder(
        num_layers=2, d_model=32, d_ffn=64, nhead=4, remat=True
    )

    def loss(params, enc):
        out, _ = enc.apply({"params": params}, x, pos_embs=pe)
        return jnp.sum(out**2)

    val_r, grads_r = jax.value_and_grad(loss)(v["params"], rem)
    val_b, grads_b = jax.value_and_grad(loss)(v["params"], base)
    np.testing.assert_allclose(float(val_r), float(val_b), rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6),
        grads_r, grads_b,
    )
