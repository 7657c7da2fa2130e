"""Tests for the small parity utils (callchains, optimizers, autocast,
DoneDetector, layout re-export shims)."""

import warnings

import jax.numpy as jnp


def test_lengths_capable_chain():
    from speechbrain_tpu.utils.callchains import (
        LengthsCapableChain, lengths_arg_exists,
    )

    assert lengths_arg_exists(lambda x, lengths: x)
    assert not lengths_arg_exists(lambda x: x)
    chain = LengthsCapableChain(lambda x: x + 1,
                                lambda x, lengths: x * lengths)
    assert chain(3, lengths=2) == 8


def test_weight_decay_mask():
    from speechbrain_tpu.utils.optimizers import rm_vector_weight_decay
    import optax

    p = {"w": jnp.ones((3, 4)), "b": jnp.ones((4,))}
    mask = rm_vector_weight_decay(p)
    assert mask == {"w": True, "b": False}
    # usable as an optax adamw mask
    tx = optax.adamw(1e-3, weight_decay=0.1, mask=rm_vector_weight_decay)
    state = tx.init(p)
    g = {"w": jnp.ones((3, 4)), "b": jnp.ones((4,))}
    updates, _ = tx.update(g, state, p)
    # decayed weight gets an extra -wd*lr*w term vs the bias
    assert not jnp.allclose(updates["w"][0, 0], updates["b"][0])


def test_autocast_policy():
    from speechbrain_tpu.utils.autocast import (
        AMPConfig, cast_floats, fwd_default_precision,
    )

    assert AMPConfig.from_name("bf16").dtype == jnp.bfloat16
    tree = {"x": jnp.ones(2, jnp.bfloat16), "i": jnp.ones(2, jnp.int32)}
    out = cast_floats(tree, jnp.float32)
    assert out["x"].dtype == jnp.float32 and out["i"].dtype == jnp.int32

    @fwd_default_precision
    def f(x):
        return x.dtype

    assert f(jnp.ones(2, jnp.bfloat16)) == jnp.float32
    assert f(jnp.ones(2, jnp.bfloat16),
             force_allow_autocast=True) == jnp.bfloat16


def test_done_detector_masks_before_output():
    from speechbrain_tpu.nnet.utils import DoneDetector

    det = DoneDetector(model=lambda x: x[..., :1],
                       out=lambda y: jnp.where(y > 0, 1.0, 0.0))
    preds = jnp.ones((2, 4, 3))
    out = det(preds, jnp.asarray([1.0, 0.5]))
    assert out[1, :, 0].tolist() == [1.0, 1.0, 0.0, 0.0]


def test_layout_shims_import():
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        from speechbrain_tpu.utils.Accuracy import Accuracy  # noqa: F401
        from speechbrain_tpu.utils.bertscore import BertScoreStats  # noqa: F401
        from speechbrain_tpu.utils.distributed import run_on_main  # noqa: F401
        from speechbrain_tpu.decoders.language_model import NgramScorer  # noqa: F401
        from speechbrain_tpu.processing.diarization import do_spec_clustering  # noqa: F401
        from speechbrain_tpu.utils.pretrained import save_for_pretrained  # noqa: F401
