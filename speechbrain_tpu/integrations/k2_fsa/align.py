"""CTC forced alignment.

Capability parity with the reference's
``speechbrain/integrations/k2_fsa/align.py`` (Aligner at align.py:67,
CTCAligner at :533): frame-level alignment of a transcript to CTC
posteriors. The reference intersects a k2 graph with the emissions; here
the CTC topology (blank-interleaved states with stay/advance/skip arcs)
is evaluated as one jitted Viterbi ``lax.scan`` — alignment runs as a
single XLA program on device, batched and static-shaped.
"""

import abc
import functools

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e30


@functools.partial(jax.jit, static_argnames=())
def _ctc_viterbi(emit, can_skip, T_abs, S_abs):
    """Viterbi over the CTC lattice.

    emit : (B, T, S) per-state emission log-probs
    can_skip : (B, S) bool, state s reachable from s-2
    T_abs, S_abs : (B,) absolute lengths
    Returns (path (B, T) state indices, scores (B,)).
    """
    B, T, S = emit.shape
    state_valid = jnp.arange(S)[None, :] < S_abs[:, None]

    def step(carry, t):
        delta = carry
        stay = delta
        adv = jnp.concatenate(
            [jnp.full((B, 1), NEG_INF), delta[:, :-1]], axis=1
        )
        skp = jnp.concatenate(
            [jnp.full((B, 2), NEG_INF), delta[:, :-2]], axis=1
        )
        skp = jnp.where(can_skip, skp, NEG_INF)
        best = jnp.maximum(stay, jnp.maximum(adv, skp))
        # choice: 0 stay, 1 advance, 2 skip
        choice = jnp.where(
            skp >= best, 2, jnp.where(adv >= best, 1, 0)
        ).astype(jnp.int32)
        new_delta = best + emit[:, t, :]
        new_delta = jnp.where(state_valid, new_delta, NEG_INF)
        active = t < T_abs
        new_delta = jnp.where(active[:, None], new_delta, delta)
        choice = jnp.where(active[:, None], choice, 0)
        return new_delta, choice

    delta0 = jnp.full((B, S), NEG_INF)
    delta0 = delta0.at[:, 0].set(emit[:, 0, 0])
    delta0 = jnp.where(
        (jnp.arange(S) == 1)[None, :] & state_valid,
        emit[:, 0, :], delta0,
    )
    delta_T, choices = jax.lax.scan(step, delta0, jnp.arange(1, T))
    choices = jnp.concatenate(
        [jnp.zeros((1, B, S), jnp.int32), choices], axis=0
    )
    # end in last blank (S_abs-1) or last token (S_abs-2), whichever wins
    last_blank = S_abs - 1
    last_tok = jnp.maximum(S_abs - 2, 0)
    sb = delta_T[jnp.arange(B), last_blank]
    st = delta_T[jnp.arange(B), last_tok]
    final_state = jnp.where(sb >= st, last_blank, last_tok)
    scores = jnp.maximum(sb, st)

    def backtrace(state, t_rev):
        t = T - 1 - t_rev
        active = t < T_abs
        ch = choices[t, jnp.arange(B), state]
        prev = jnp.where(
            (t > 0) & active, state - ch, state
        )
        return prev, state

    _, path_rev = jax.lax.scan(backtrace, final_state, jnp.arange(T))
    return jnp.flip(path_rev.T, axis=1), scores


class Aligner(abc.ABC):
    """Base class (reference align.py:67)."""

    @abc.abstractmethod
    def align(self, log_probs, targets, **kwargs):
        ...


class CTCAligner(Aligner):
    """Forced alignment through the CTC topology
    (reference CTCAligner at align.py:533).

    ``align(log_probs, targets)`` with log_probs (B, T, V) and targets
    (B, U) returns ``(per-frame token ids (B, T) with blanks, scores)``.

    Example
    -------
    >>> import jax.numpy as jnp
    >>> logp = jnp.log(jnp.asarray([[
    ...     [0.05, 0.9, 0.05], [0.05, 0.9, 0.05],
    ...     [0.9, 0.05, 0.05], [0.05, 0.05, 0.9]]]))
    >>> ali, scores = CTCAligner(blank_id=0).align(
    ...     logp, jnp.asarray([[1, 2]]))
    >>> ali[0].tolist()
    [1, 1, 0, 2]
    """

    def __init__(self, blank_id=0):
        self.blank_id = blank_id

    def _expand(self, targets):
        """(B, U) -> blank-interleaved states (B, 2U+1) + skip mask."""
        B, U = targets.shape
        tgt = np.asarray(targets)
        states = np.full((B, 2 * U + 1), self.blank_id, np.int32)
        states[:, 1::2] = tgt
        # skip s-2 -> s allowed for token states whose token differs
        # from the previous token (standard CTC rule)
        can_skip = np.zeros((B, 2 * U + 1), bool)
        if U > 1:
            can_skip[:, 3::2] = tgt[:, 1:] != tgt[:, :-1]
        return jnp.asarray(states), jnp.asarray(can_skip)

    def align(self, log_probs, targets, target_lens=None, prob_lens=None):
        B, T, V = log_probs.shape
        states, can_skip = self._expand(targets)
        S = states.shape[1]
        emit = jnp.take_along_axis(
            log_probs, jnp.broadcast_to(states[:, None, :], (B, T, S)),
            axis=2,
        )
        T_abs = (
            jnp.round(prob_lens * T).astype(jnp.int32)
            if prob_lens is not None else jnp.full((B,), T, jnp.int32)
        )
        U = targets.shape[1]
        U_abs = (
            jnp.round(target_lens * U).astype(jnp.int32)
            if target_lens is not None else jnp.full((B,), U, jnp.int32)
        )
        S_abs = 2 * U_abs + 1
        path, scores = _ctc_viterbi(emit, can_skip, T_abs, S_abs)
        return jnp.take_along_axis(states, path, axis=1), scores
