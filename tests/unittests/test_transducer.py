"""Tests for the transducer loss, joint network, and searchers."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np

from speechbrain_tpu.decoders.transducer import TransducerBeamSearcher
from speechbrain_tpu.nnet.transducer_joint import TransducerJoint
from speechbrain_tpu.nnet.transducer_loss import transducer_loss

KEY = jax.random.PRNGKey(0)


def _brute_force_rnnt(log_probs, targets, blank):
    """Sum over all monotonic alignments by dynamic programming in numpy
    (independent of the scan implementation)."""
    T, U1, V = log_probs.shape
    U = len(targets)
    alpha = np.full((T, U + 1), -np.inf)
    alpha[0, 0] = 0.0
    for u in range(1, U + 1):
        alpha[0, u] = alpha[0, u - 1] + log_probs[0, u - 1, targets[u - 1]]
    for t in range(1, T):
        alpha[t, 0] = alpha[t - 1, 0] + log_probs[t - 1, 0, blank]
        for u in range(1, U + 1):
            no_emit = alpha[t - 1, u] + log_probs[t - 1, u, blank]
            emit = alpha[t, u - 1] + log_probs[t, u - 1, targets[u - 1]]
            alpha[t, u] = np.logaddexp(no_emit, emit)
    return alpha[T - 1, U] + log_probs[T - 1, U, blank]


def test_transducer_loss_matches_dp():
    rng = np.random.default_rng(0)
    T, U, V = 5, 3, 6
    lp = jax.nn.log_softmax(jnp.asarray(rng.standard_normal((1, T, U + 1, V))), -1)
    targets = jnp.asarray([[1, 3, 2]])
    loss = transducer_loss(
        lp, targets, jnp.ones(1), jnp.ones(1), blank_index=0, reduction="batch"
    )
    ref = -_brute_force_rnnt(np.asarray(lp[0]), [1, 3, 2], 0)
    assert abs(float(loss[0]) - ref) < 1e-3, (float(loss[0]), ref)


def test_transducer_loss_partial_lengths():
    rng = np.random.default_rng(1)
    T, U, V = 6, 4, 5
    lp = jax.nn.log_softmax(jnp.asarray(rng.standard_normal((2, T, U + 1, V))), -1)
    targets = jnp.asarray([[1, 2, 0, 0], [3, 1, 2, 4]])
    loss = transducer_loss(
        lp, targets, jnp.asarray([4 / 6, 1.0]), jnp.asarray([0.5, 1.0]),
        blank_index=0, reduction="batch",
    )
    # per-sequence check against the DP with truncated T/U
    ref0 = -_brute_force_rnnt(np.asarray(lp[0, :4]), [1, 2], 0)
    ref1 = -_brute_force_rnnt(np.asarray(lp[1]), [3, 1, 2, 4], 0)
    assert abs(float(loss[0]) - ref0) < 1e-3
    assert abs(float(loss[1]) - ref1) < 1e-3


def test_transducer_loss_gradient_flows():
    lp = jax.nn.log_softmax(jnp.zeros((1, 4, 3, 4)), -1)
    targets = jnp.asarray([[1, 2]])

    def f(x):
        return transducer_loss(
            jax.nn.log_softmax(x, -1), targets, jnp.ones(1), jnp.ones(1), 0
        )

    g = jax.grad(f)(jnp.zeros((1, 4, 3, 4)))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_transducer_joint():
    joint = TransducerJoint(joint_dim=8, joint="sum")
    enc = jnp.ones((2, 10, 8))
    dec = jnp.ones((2, 4, 8))
    p = joint.init(KEY, enc, dec)
    assert joint.apply(p, enc, dec).shape == (2, 10, 4, 8)


def _make_toy_transducer(vocab=5, blank=0, H=8):
    """A transducer whose joint log-probs are rigged so the greedy path
    emits [2, 3] then blanks."""
    emit_plan = {0: 2, 1: 3}  # frame -> forced label

    def pred_step(tokens, hidden):
        if hidden is None:
            hidden = jnp.zeros((tokens.shape[0], 1))
        out = jnp.zeros((tokens.shape[0], 1, H))
        return out, hidden

    def tjoint(enc, pn):
        return jnp.broadcast_to(enc[..., :1], enc.shape[:3] + (1,)) * 0 + enc

    def classifier(joint):
        # joint: (B, 1, 1, H); produce logits from the encoded "frame id"
        frame_id = joint[..., 0]  # (B,1,1) carries t index
        B = joint.shape[0]
        logits = jnp.full(joint.shape[:3] + (5,), -5.0)
        # frame 0 favors label 2 on first emission, blank after
        def per(frame_scalar):
            l = jnp.full((5,), -5.0)
            l = jnp.where(
                jnp.arange(5) == jnp.where(frame_scalar == 0, 2, jnp.where(frame_scalar == 1, 3, 0)),
                5.0, l,
            )
            return l

        flat = jax.vmap(per)(frame_id.reshape(-1))
        return flat.reshape(joint.shape[:3] + (5,))

    return pred_step, tjoint, classifier


def test_transducer_greedy_decode():
    pred_step, tjoint, classifier = _make_toy_transducer()
    searcher = TransducerBeamSearcher(
        pred_step, tjoint, classifier, blank_id=0, beam_size=1,
        max_symbols_per_step=2,
    )
    # encoder output encodes the frame index in channel 0
    enc = jnp.tile(jnp.arange(4.0)[None, :, None], (2, 1, 8))
    hyps, _, _, _ = searcher(enc)
    # frame 0 emits 2 (then same joint logits repeat -> second 2), frame 1 emits 3s
    assert all(set(h) <= {2, 3} for h in hyps)
    assert all(h[0] == 2 for h in hyps)


def test_transducer_beam_decode_runs():
    pred_step, tjoint, classifier = _make_toy_transducer()
    searcher = TransducerBeamSearcher(
        pred_step, tjoint, classifier, blank_id=0, beam_size=3, nbest=2,
    )
    enc = jnp.tile(jnp.arange(3.0)[None, :, None], (1, 1, 8))
    hyps, scores, nbest, nbest_scores = searcher(enc)
    assert len(hyps) == 1
    assert len(nbest[0]) <= 2
