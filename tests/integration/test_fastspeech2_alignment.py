"""FastSpeech2WithAlignment trains end-to-end on synthetic (text, mel)
pairs WITHOUT duration targets: the internal aligner + MAS must discover
durations and the total loss must drop (reference
lobes/models/FastSpeech2.py:2110 FastSpeech2WithAlignment; losses :2835)."""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from speechbrain_tpu.lobes.models.FastSpeech2 import (
    FastSpeech2WithAlignment,
    FastSpeech2WithAlignmentLoss,
)

N_SYMBOLS, N_MELS, T_TOK, T_MEL = 12, 8, 5, 20


def make_batch(n=6):
    """Each token deterministically maps to a 4-frame mel pattern."""
    rng = np.random.default_rng(0)
    patterns = rng.standard_normal((N_SYMBOLS, N_MELS)).astype(np.float32)
    tokens = rng.integers(1, N_SYMBOLS, size=(n, T_TOK)).astype(np.int32)
    mels = np.stack([
        np.repeat(patterns[t], 4, axis=0) for t in tokens
    ])  # (n, 20, N_MELS)
    return jnp.asarray(tokens), jnp.asarray(mels)


def test_fastspeech2_with_alignment_loss_drops():
    tokens, mels = make_batch()
    net = FastSpeech2WithAlignment(
        n_symbols=N_SYMBOLS, d_model=32, nhead=4, d_ffn=64, enc_layers=1,
        dec_layers=1, n_mel_channels=N_MELS, max_mel_len=T_MEL, dropout=0.0,
    )
    variables = net.init(jax.random.PRNGKey(0), tokens, mels)
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}
    loss_fn_obj = FastSpeech2WithAlignmentLoss(binary_weight=0.0)
    targets = {
        "mel": mels,
        "token_lens": jnp.full((tokens.shape[0],), T_TOK),
        "mel_frame_lens": jnp.full((tokens.shape[0],), T_MEL),
    }

    def loss_fn(params):
        out = net.apply({"params": params, **rest}, tokens, mels)
        return loss_fn_obj(out, targets)

    tx = optax.adam(2e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(60):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.7, (losses[0], losses[-1])

    # MAS durations cover all frames and are monotone
    out = net.apply({"params": params, **rest}, tokens, mels)
    durs = np.asarray(out["durations"])
    np.testing.assert_allclose(durs.sum(-1), T_MEL)
    # inference path produces mels from predicted durations
    mel_post, durations, *_ = net.apply(
        {"params": params, **rest}, tokens, method="infer"
    )
    assert mel_post.shape == (tokens.shape[0], T_MEL, N_MELS)
