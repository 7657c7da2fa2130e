"""Homograph-disambiguation tools for G2P fine-tuning.

Capability parity with the reference's
``speechbrain/lobes/models/g2p/homograph.py`` (SubsequenceLoss at
homograph.py:10, SubsequenceExtractor at :172), re-designed for TPU:
subsequence extraction is mask+gather with static shapes (clipped index
arithmetic instead of per-sample Python slicing), so the loss traces
into the jitted train step.
"""

import jax.numpy as jnp
import numpy as np


def _gather_range(seq, start, end, max_len, fill=0):
    """Gather seq[b, start[b]:end[b]] into a (B, max_len) buffer."""
    B = seq.shape[0]
    idx = start[:, None] + jnp.arange(max_len)[None, :]
    valid = idx < end[:, None]
    idx = jnp.clip(idx, 0, seq.shape[1] - 1)
    if seq.ndim == 2:
        out = jnp.take_along_axis(seq, idx, axis=1)
        return jnp.where(valid, out, fill), valid
    out = jnp.take_along_axis(
        seq, idx[:, :, None].repeat(seq.shape[-1], -1), axis=1
    )
    return jnp.where(valid[:, :, None], out, fill), valid


def _pred_word_range(p_seq, word_index, word_separator):
    """Start/end positions of the ``word_index``-th word in argmax
    predictions (words delimited by ``word_separator``)."""
    preds = jnp.argmax(p_seq, axis=-1)
    sep = (preds == word_separator).astype(jnp.int32)
    # word id at each position = separators seen strictly before it
    word_id = jnp.concatenate(
        [jnp.zeros_like(sep[:, :1]), jnp.cumsum(sep, axis=1)[:, :-1]],
        axis=1,
    )
    in_word = (word_id == word_index[:, None]) & (sep == 0)
    T = preds.shape[1]
    pos = jnp.arange(T)[None, :]
    start = jnp.min(jnp.where(in_word, pos, T), axis=1)
    end = jnp.max(jnp.where(in_word, pos + 1, 0), axis=1)
    return start, jnp.maximum(end, start)


class SubsequenceLoss:
    """Loss restricted to one target word per utterance
    (reference homograph.py:10): the target word's phonemes are located
    in the reference and aligned to the same word slot in the argmax
    prediction (the model must already predict word boundaries).

    Example
    -------
    >>> import jax.numpy as jnp
    >>> from speechbrain_tpu.nnet.losses import nll_loss
    >>> loss = SubsequenceLoss(seq_cost=nll_loss)
    >>> phns = jnp.asarray(
    ...     [[1, 2, 0, 1, 3, 0, 2, 1, 0], [2, 1, 3, 0, 1, 2, 0, 3, 2]])
    >>> p_seq = jnp.log(jnp.asarray([
    ...   [[0.,1,0,0],[0,0,1,0],[1,0,0,0],[0,1,0,0],[0,0,0,1],
    ...    [1,0,0,0],[0,0,1,0],[0,1,0,0],[1,0,0,0]],
    ...   [[0.,0,1,0],[0,1,0,0],[0,0,0,1],[1,0,0,0],[0,1,0,0],
    ...    [0,0,1,0],[1,0,0,0],[0,0,0,1],[0,0,1,0]]]) + 1e-9)
    >>> v = loss(phns, jnp.asarray([8, 9]) / 9.0, p_seq,
    ...          jnp.asarray([3, 4]), jnp.asarray([5, 7]))
    >>> bool(v < 1e-6)  # predictions match targets on the target words
    True
    """

    def __init__(self, seq_cost, word_separator=0, word_separator_base=0):
        self.seq_cost = seq_cost
        self.word_separator = word_separator
        self.word_separator_base = word_separator_base

    def __call__(self, phns, phn_lens, p_seq, subsequence_phn_start,
                 subsequence_phn_end, phns_base=None, phn_base_lens=None):
        # static buffer: the longest possible subsequence is the full
        # target length (jit-safe; masked positions contribute nothing)
        max_len = phns.shape[1]
        tgt, tgt_valid = _gather_range(
            phns.astype(jnp.int32), subsequence_phn_start,
            subsequence_phn_end, max_len,
        )
        # which word is the target? count separators before its start
        sep_mask = (
            phns.astype(jnp.int32) == self.word_separator
        ).astype(jnp.int32)
        before = jnp.arange(phns.shape[1])[None, :] < (
            subsequence_phn_start[:, None]
        )
        word_index = jnp.sum(sep_mask * before, axis=1)
        p_start, p_end = _pred_word_range(
            p_seq, word_index, self.word_separator
        )
        p_sub, _ = _gather_range(p_seq, p_start, p_end, max_len)
        lens = tgt_valid.sum(1) / max_len
        return self.seq_cost(p_sub, tgt, length=lens)


class SubsequenceExtractor:
    """Extract the target-word subsequence from model outputs for
    evaluation (reference homograph.py:172)."""

    def __init__(self, word_separator=0):
        self.word_separator = word_separator

    def extract_hyps(self, ref_seq, hyps, subsequence_phn_start,
                     from_char_map=False):
        """Host-side: pull the target word out of each decoded
        hypothesis list, using the word index from the reference."""
        out = []
        starts = np.asarray(subsequence_phn_start)
        refs = np.asarray(ref_seq)
        for b, hyp in enumerate(hyps):
            word_index = int(
                (refs[b, : starts[b]] == self.word_separator).sum()
            )
            words, cur = [], []
            for tok in hyp:
                if tok == self.word_separator:
                    words.append(cur)
                    cur = []
                else:
                    cur.append(tok)
            words.append(cur)
            out.append(words[word_index] if word_index < len(words) else [])
        return out
