"""Tensor-parallel sharding rules: placement + numerical parity with the
replicated computation on a 2x4 virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from speechbrain_tpu.parallel.mesh import (
    param_partition_spec,
    shard_params_tensor_parallel,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_rule_table():
    k = jnp.ones((32, 32))
    assert param_partition_spec("enc/attn/q_proj/kernel", k) == P(None, "model")
    assert param_partition_spec("enc/attn/out_proj/kernel", k) == P("model", None)
    assert param_partition_spec("enc/ffn1/ffn1/kernel", k) == P(None, "model")
    assert param_partition_spec("enc/ffn1/ffn2/kernel", k) == P("model", None)
    assert param_partition_spec("enc/norm/scale", jnp.ones((32,))) == P()
    # rank mismatch -> replicated, never a crash
    assert param_partition_spec("q_proj/kernel", jnp.ones((4, 4, 4))) == P()


def test_tensor_parallel_matches_replicated():
    from speechbrain_tpu.lobes.models.transformer.TransformerASR import (
        TransformerASR,
    )

    net = TransformerASR(
        tgt_vocab=16, input_size=12, d_model=32, nhead=4,
        num_encoder_layers=2, num_decoder_layers=0, d_ffn=64,
        encoder_module="conformer", attention_type="RelPosMHAXL",
        kernel_size=5,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 16, 12))
    v = net.init(jax.random.PRNGKey(1), x, None)
    ref = net.apply(v, x, method="encode")

    mesh = Mesh(
        np.array(jax.devices()[:8]).reshape(4, 2),
        axis_names=("data", "model"),
    )
    v_sharded = {"params": shard_params_tensor_parallel(v["params"], mesh)}
    qk = v_sharded["params"]["encoder"]["layer_0"]["attn"]["q_proj"]["kernel"]
    assert qk.sharding.spec == P(None, "model")

    x_sharded = jax.device_put(x, NamedSharding(mesh, P("data")))
    out = jax.jit(lambda p, x: net.apply(p, x, method="encode"))(
        v_sharded, x_sharded
    )
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(out), rtol=2e-4, atol=2e-4
    )
