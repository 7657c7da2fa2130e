"""Integration: HMM alignment training with Viterbi and forward objectives
(mirrors reference tests/integration/ASR_alignment_viterbi + _forward):
an emission network trained on frame posteriors aligns synthetic phone
sequences correctly."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from speechbrain_tpu.alignment.aligner import HMMAligner
from speechbrain_tpu.nnet.linear import Linear


def make_data(rng, B=6, T=20, F=8, n_phones=3):
    """Each utterance: 3 segments of distinct phones; features carry the
    phone identity plus noise."""
    phones = np.stack([rng.permutation(n_phones) for _ in range(B)])
    bounds = np.sort(
        rng.integers(4, T - 4, size=(B, 2)), axis=1
    )
    feats = np.zeros((B, T, F), np.float32)
    labels = np.zeros((B, T), np.int64)
    for b in range(B):
        seg = [0] * bounds[b, 0] + [1] * (bounds[b, 1] - bounds[b, 0]) + [
            2
        ] * (T - bounds[b, 1])
        for t, s in enumerate(seg):
            p = phones[b, s]
            labels[b, t] = p
            feats[b, t, p] = 2.0
    feats += rng.normal(0, 0.3, feats.shape).astype(np.float32)
    return feats, phones.astype(np.int64), labels


def test_viterbi_and_forward_alignment_training():
    rng = np.random.default_rng(0)
    feats, phones, frame_labels = make_data(rng)
    B, T, F = feats.shape
    n_phones = 3

    model = Linear(n_neurons=n_phones)
    x = jnp.asarray(feats)
    v = model.init(jax.random.PRNGKey(0), x)
    opt = optax.adam(5e-2)
    opt_state = opt.init(v)
    aligner = HMMAligner()
    states = jnp.asarray(phones)

    @jax.jit
    def step(v, opt_state):
        def loss_fn(p):
            logp = jax.nn.log_softmax(model.apply(p, x), -1)
            # forward objective: maximize sequence log-likelihood
            scores = aligner(logp, states, dp_algorithm="forward")
            return -jnp.mean(scores) / T

        loss, g = jax.value_and_grad(loss_fn)(v)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(v, updates), opt_state, loss

    losses = []
    for _ in range(60):
        v, opt_state, loss = step(v, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] - 0.2, (losses[0], losses[-1])

    # viterbi alignment recovers frame labels
    logp = jax.nn.log_softmax(model.apply(v, x), -1)
    ali, scores = aligner(logp, states, dp_algorithm="viterbi")
    acc = float((np.asarray(ali) == frame_labels).mean())
    assert acc > 0.9, acc

    # durations collapse to exactly 3 segments per utterance
    durs = HMMAligner.durations_from_alignment(ali)
    assert all(len(d) == 3 for d in durs), durs

    # forward score upper-bounds the viterbi path score
    fwd = aligner(logp, states, dp_algorithm="forward")
    assert bool((fwd >= scores - 1e-4).all())
