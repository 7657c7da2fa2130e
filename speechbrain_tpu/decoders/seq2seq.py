"""Sequence-to-sequence decoding: greedy and batched beam search, on device.

Capability parity with the reference's ``speechbrain/decoders/seq2seq.py``
(S2SBaseSearcher :54, S2SGreedySearcher :176, S2SRNNGreedySearcher,
S2SBeamSearcher :711, S2SRNNBeamSearcher :1752, S2STransformerBeamSearcher
:1853), re-architected for XLA (SURVEY.md §7 "hard parts"):

* the reference's data-dependent Python loop with early exit becomes a
  **fixed-bound ``lax.fori_loop``** over ``max_decode_steps`` with
  finished-beam masking — one compiled program per length bucket;
* hypothesis memories (decoder KV / RNN state / scorer state) are pytrees
  with leading dim ``batch*beam``, permuted by predecessor gather;
* eos-threshold, min/max decode ratio and length normalization are masks
  and score arithmetic inside the loop;
* scorers (CTC prefix, LMs, coverage, length) plug in via the
  ScorerBuilder protocol (decoders/scorer.py), scoring either the full
  vocab (full scorers) or a pruned candidate set (partial scorers).

Subclasses adapt concrete models by implementing ``reset_mem`` /
``forward_step`` / ``permute_mem`` as pure functions.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from speechbrain_tpu.decoders.permute import gather_rows

NEG_INF = -1e9


def _stamp_self_column(anc, step):
    """Set ancestry column ``step`` to each hypothesis' own row id (the
    row that writes position ``step`` this decode step)."""
    B, K, L = anc.shape
    selfcol = jnp.broadcast_to(
        jnp.arange(K, dtype=anc.dtype)[None, :, None], (B, K, 1)
    )
    return jax.lax.dynamic_update_slice_in_dim(
        anc, jnp.asarray(selfcol), step, axis=2
    )


class S2SBaseSearcher:
    """Base class: subclasses implement the three pure functions below
    (reference seq2seq.py:54).

    Arguments
    ---------
    bos_index / eos_index : int
    min_decode_ratio / max_decode_ratio : float
        Decode-step bounds as a ratio of encoder length.
    """

    def __init__(self, bos_index, eos_index, min_decode_ratio, max_decode_ratio):
        self.bos_index = bos_index
        self.eos_index = eos_index
        self.min_decode_ratio = min_decode_ratio
        self.max_decode_ratio = max_decode_ratio

    def reset_mem(self, batch_size, enc_states, enc_lens):
        """Return the initial memory pytree (leading dim batch_size)."""
        raise NotImplementedError

    def forward_step(self, inp_tokens, memory, enc_states, enc_lens, step):
        """One decode step: returns (log_probs (N, V), new_memory, attn)."""
        raise NotImplementedError

    def permute_mem(self, memory, index):
        """Reorder memory rows by ``index`` (predecessor gather). Large
        float buffers ride the MXU as block-diagonal one-hot matmuls
        when a beam layout is known (decoders/permute.py)."""
        layout = getattr(self, "_beam_layout", None)
        return jax.tree_util.tree_map(
            lambda t: gather_rows(t, index, layout), memory
        )

    def change_max_decoding_length(self, min_decode_steps, max_decode_steps):
        return min_decode_steps, max_decode_steps


class S2SGreedySearcher(S2SBaseSearcher):
    """Greedy decoding via lax.scan with finished masking
    (reference seq2seq.py:176).

    Returns (hyps, top_lengths, top_scores, top_log_probs) where hyps is a
    list of python lists (eos-trimmed).
    """

    def __call__(self, enc_states, wav_len):
        T = enc_states.shape[1]
        max_steps = max(1, int(T * self.max_decode_ratio))
        _, max_steps = self.change_max_decoding_length(0, max_steps)
        scores, tokens_seq, log_probs_seq = self._greedy_jit(
            enc_states, wav_len, max_steps
        )
        tokens_seq = jnp.moveaxis(tokens_seq, 0, 1)  # (B, L)
        hyps, lengths = _trim_eos_batch(np.asarray(tokens_seq), self.eos_index)
        return hyps, lengths, np.asarray(scores), np.moveaxis(
            np.asarray(log_probs_seq), 0, 1
        )

    @functools.partial(jax.jit, static_argnums=(0, 3))
    def _greedy_jit(self, enc_states, wav_len, max_steps):
        """One compiled program per (shape, max_steps); cached across
        calls like the beam searcher's _search_jit. A while_loop with an
        all-rows-finished early exit replaces the reference's
        data-dependent Python break — finished rows only ever append
        eos, so stopping early is bit-identical to running the bound
        (the post-loop buffers are eos/zero-filled, which is what the
        masked steps would have written)."""
        B = enc_states.shape[0]
        memory = self.reset_mem(B, enc_states, wav_len)

        def body(carry):
            step, tokens, memory, finished, scores, tokens_seq, lp_seq = carry
            log_probs, memory, attn = self.forward_step(
                tokens, memory, enc_states, wav_len, step
            )
            next_tokens = jnp.argmax(log_probs, axis=-1)
            step_scores = jnp.max(log_probs, axis=-1)
            next_tokens = jnp.where(finished, self.eos_index, next_tokens)
            scores = scores + jnp.where(finished, 0.0, step_scores)
            finished = jnp.logical_or(finished, next_tokens == self.eos_index)
            tokens_seq = tokens_seq.at[step].set(next_tokens)
            lp_seq = lp_seq.at[step].set(log_probs)
            return (
                step + 1, next_tokens, memory, finished, scores,
                tokens_seq, lp_seq,
            )

        def cond(carry):
            step, _tok, _mem, finished, *_ = carry
            return jnp.logical_and(
                step < max_steps, jnp.logical_not(jnp.all(finished))
            )

        init_tokens = jnp.full((B,), self.bos_index, jnp.int32)
        V = self._greedy_vocab_size(enc_states, wav_len, memory)
        init = (
            jnp.int32(0),
            init_tokens,
            memory,
            jnp.zeros((B,), bool),
            jnp.zeros((B,)),
            jnp.full((max_steps, B), self.eos_index, jnp.int32),
            jnp.zeros((max_steps, B, V)),
        )
        (_, _, _, _, scores, tokens_seq, log_probs_seq) = jax.lax.while_loop(
            cond, body, init
        )
        return scores, tokens_seq, log_probs_seq

    def _greedy_vocab_size(self, enc_states, wav_len, memory):
        """Static vocab size for the preallocated log-prob buffer.
        Subclasses that know it statically override; the fallback runs
        one (traced, shape-only) forward step."""
        if hasattr(self, "vocab_size"):
            return self.vocab_size
        log_probs, _, _ = jax.eval_shape(
            lambda m: self.forward_step(
                jnp.zeros((enc_states.shape[0],), jnp.int32), m,
                enc_states, wav_len, 0,
            ),
            memory,
        )
        return log_probs.shape[-1]


def _trim_eos_batch(tokens, eos_index):
    """Cut each row at the first eos (host-side)."""
    hyps, lengths = [], []
    for row in tokens:
        row = row.tolist()
        if eos_index in row:
            row = row[: row.index(eos_index)]
        hyps.append(row)
        lengths.append(len(row))
    return hyps, np.asarray(lengths)


class S2SBeamSearcher(S2SBaseSearcher):
    """Batched beam search as one jitted fixed-length loop, with the
    REFERENCE's exact selection semantics (reference seq2seq.py:711):

    * top-``beam_size`` selection over the ``beam_size * vocab``
      candidate scores each step — an eos candidate keeps its beam slot
      for that step, is recorded into the finished set (append order =
      beam-slot order, capped at ``beam_size`` per utterance), and its
      sequence score is masked to ``minus_inf`` so the slot dies out;
    * the decoder log-probs are scaled by ``attn_weight = 1 -
      ctc_weight`` when a CTC scorer is fused (ref seq2seq.py:803-804,
      916-921); with ``ctc_weight == 1.0`` the decoder step is skipped
      entirely and the search is driven by the scorers alone;
    * eos is blocked below ``min_decode_steps`` and by the eos
      threshold BEFORE the scorers run (ref search_step:1542-1561);
    * length normalization divides candidate scores by ``step + 1``
      before selection; recorded finished scores are the normalized
      ones (ref :1229-1251);
    * after the fixed-length loop, utterances with fewer than
      ``beam_size`` finished hypotheses are topped up from the alive
      beams in slot order, including the reference's drop-last-token
      trim for those fills (ref _fill_alived_hyps_with_eos_token:1600).

    The reference's data-dependent early exit is replaced by masking —
    extra iterations cannot change the recorded hypotheses because the
    finished set is append-capped. ``temperature`` must be applied to
    LOGITS inside ``forward_step`` / the decode callable (as the
    reference's model-specific ``forward_step`` does, ref :1933); the
    base loop performs no temperature scaling.
    """

    def __init__(
        self,
        bos_index,
        eos_index,
        min_decode_ratio,
        max_decode_ratio,
        beam_size,
        scorer=None,
        length_normalization=True,
        length_rewarding=0.0,
        using_eos_threshold=True,
        eos_threshold=1.5,
        using_max_attn_shift=False,
        max_attn_shift=60,
        topk=1,
        temperature=1.0,
        return_topk=False,
        minus_inf=-1e20,
    ):
        super().__init__(bos_index, eos_index, min_decode_ratio, max_decode_ratio)
        self.beam_size = beam_size
        self.scorer = scorer
        self.length_normalization = length_normalization
        self.length_rewarding = length_rewarding
        if length_normalization and length_rewarding > 0:
            raise ValueError(
                "length normalization and length rewarding are exclusive"
            )
        self.using_eos_threshold = using_eos_threshold
        self.eos_threshold = eos_threshold
        self.topk = topk
        self.temperature = temperature
        self.return_topk = return_topk
        self.minus_inf = minus_inf
        self.using_max_attn_shift = using_max_attn_shift
        self.max_attn_shift = max_attn_shift
        # joint CTC/attention weighting (reference seq2seq.py:781-804)
        self.attn_weight = 1.0
        self.ctc_weight = 0.0
        if scorer is not None and scorer.weights.get("ctc", 0.0) > 0.0:
            self.ctc_weight = scorer.weights["ctc"]
            self.attn_weight = 1.0 - self.ctc_weight

    # -- main entry ---------------------------------------------------------
    def __call__(self, enc_states, wav_len):
        B, T = enc_states.shape[0], enc_states.shape[1]
        min_steps = int(T * self.min_decode_ratio)
        max_steps = max(1, int(T * self.max_decode_ratio))
        min_steps, max_steps = self.change_max_decoding_length(min_steps, max_steps)
        # static (batch, beam) layout: lets every predecessor gather of
        # a large float buffer run as a block-diag one-hot matmul
        self._beam_layout = (B, self.beam_size)
        if self.scorer is not None:
            self.scorer.set_beam_layout(B, self.beam_size)

        fin_seq, fin_scores, fin_lens, fin_count = self._search_jit(
            enc_states, wav_len, min_steps, max_steps
        )

        return self._gather_results(
            np.asarray(fin_seq),
            np.asarray(fin_scores),
            np.asarray(fin_lens),
            np.asarray(fin_count),
        )

    def _record_finished(
        self, record, norm_scores, seq, seq_len,
        fin_seq, fin_scores, fin_lens, fin_count,
    ):
        """Append the ``record``-flagged beam rows to the finished set in
        beam-slot order, capped at beam_size per utterance (the jit-safe
        form of reference _update_hyps_and_scores_if_eos_token:1371)."""
        B, K = record.shape
        b_idx = jnp.arange(B)[:, None]
        rank = jnp.cumsum(record.astype(jnp.int32), axis=1) - record
        pos = fin_count[:, None] + rank
        write = record & (pos < K)
        pos_c = jnp.where(write, pos, K)  # K = drop slot (sliced off)
        pad_sc = jnp.concatenate(
            [fin_scores, jnp.full((B, 1), self.minus_inf)], axis=1
        )
        fin_scores = pad_sc.at[b_idx, pos_c].set(norm_scores)[:, :K]
        pad_seq = jnp.concatenate(
            [fin_seq, jnp.zeros((B, 1, fin_seq.shape[-1]), jnp.int32)], axis=1
        )
        fin_seq = pad_seq.at[b_idx, pos_c].set(seq)[:, :K]
        pad_ln = jnp.concatenate(
            [fin_lens, jnp.zeros((B, 1), jnp.int32)], axis=1
        )
        fin_lens = pad_ln.at[b_idx, pos_c].set(seq_len)[:, :K]
        fin_count = fin_count + jnp.sum(write, axis=1).astype(jnp.int32)
        return fin_seq, fin_scores, fin_lens, fin_count

    @functools.partial(jax.jit, static_argnums=(0, 3, 4))
    def _search_jit(self, enc_states, wav_len, min_steps, max_steps):
        B, T = enc_states.shape[0], enc_states.shape[1]
        K = self.beam_size
        n_bh = B * K

        # beam-inflate encoder states: (B*K, T, D)
        enc_inflated = jnp.repeat(enc_states, K, axis=0)
        lens_inflated = jnp.repeat(wav_len, K, axis=0)
        if getattr(self, "reset_mem_uninflated", False):
            # beam-shared caches (e.g. precomputed cross-attention K/V)
            # are built from the per-utterance states; per-hypothesis
            # buffers are still allocated at n_bh by the init fn
            memory = self.reset_mem(n_bh, enc_states, wav_len)
        else:
            memory = self.reset_mem(n_bh, enc_inflated, lens_inflated)
        # Materialize broadcast (leading-dim-1) init leaves at batch*beam so
        # the axis-0 predecessor gather in permute_mem keeps shapes stable
        # across fori_loop iterations. Beam-shared "cross" entries are
        # exempt: they are never permuted, and at B=1 a dim-1 leading axis
        # is exactly the shared-per-utterance layout we want to KEEP.
        def _materialize(t):
            if (hasattr(t, "shape") and t.ndim >= 1
                    and t.shape[0] == 1 and n_bh > 1):
                return jnp.broadcast_to(t, (n_bh,) + t.shape[1:])
            return t

        def _materialize_mem(mem):
            if isinstance(mem, (list, tuple)) and all(
                isinstance(layer, dict) for layer in mem
            ):
                return [
                    {
                        k: (v if k == "cross"
                            else jax.tree_util.tree_map(_materialize, v))
                        for k, v in layer.items()
                    }
                    for layer in mem
                ]
            if isinstance(mem, dict) and "anc" in mem:
                # ancestry mode: the table is already (B, K, L); only
                # the wrapped per-layer cache needs materializing
                return {**mem, "cache": _materialize_mem(mem["cache"])}
            return jax.tree_util.tree_map(_materialize, mem)

        memory = _materialize_mem(memory)
        scorer_mem = None
        if self.scorer is not None:
            if getattr(self, "reset_mem_uninflated", False):
                scorer_mem = self.scorer.reset_scorer_mem(
                    enc_inflated, lens_inflated,
                    x_shared=enc_states, lens_shared=wav_len,
                )
            else:
                scorer_mem = self.scorer.reset_scorer_mem(
                    enc_inflated, lens_inflated
                )

        # only beam 0 of each batch is live at step 0 (avoid duplicates,
        # reference init_beam_search_data:1326-1332)
        seq_scores = jnp.tile(
            jnp.asarray([0.0] + [self.minus_inf] * (K - 1)), (B,)
        )  # (n_bh,)
        seq = jnp.zeros((n_bh, max_steps), jnp.int32)
        fin_seq = jnp.zeros((B, K, max_steps), jnp.int32)
        fin_scores = jnp.full((B, K), self.minus_inf)
        fin_lens = jnp.zeros((B, K), jnp.int32)
        fin_count = jnp.zeros((B,), jnp.int32)
        last_norm_scores = jnp.full((B, K), self.minus_inf)
        prev_tokens = jnp.full((n_bh,), self.bos_index, jnp.int32)
        prev_attn_peak = jnp.zeros((n_bh,), jnp.int32)

        def body(loop_carry):
            step, carry = loop_carry
            (
                prev_tokens,
                memory,
                scorer_mem,
                prev_attn_peak,
                seq,
                seq_scores,
                last_norm_scores,
                fin_seq,
                fin_scores,
                fin_lens,
                fin_count,
            ) = carry
            attn = None
            if self.attn_weight > 0:
                log_probs, memory, attn = self.forward_step(
                    prev_tokens, memory, enc_inflated, lens_inflated, step
                )
                log_probs = self.attn_weight * log_probs
            else:
                # pure-CTC decoding: the decoder step is skipped and the
                # scorers drive the search (reference _attn_weight_step)
                log_probs = jnp.zeros((n_bh, self._n_out()), jnp.float32)
            V = log_probs.shape[-1]
            cur_attn_peak = prev_attn_peak
            if self.using_max_attn_shift:
                # Block hypotheses whose attention peak jumps more than
                # max_attn_shift frames (reference seq2seq.py:824): all their
                # extensions get -inf, so they fall out of the beam.
                attn_2d = attn.reshape(n_bh, -1)
                cur_attn_peak = jnp.argmax(attn_2d, axis=-1).astype(jnp.int32)
                within = jnp.abs(
                    cur_attn_peak - prev_attn_peak
                ) <= self.max_attn_shift
                # step 0 has no previous peak; never block it
                within = jnp.logical_or(within, step == 0)
                log_probs = jnp.where(
                    within[:, None], log_probs, self.minus_inf
                )
            # eos masking BEFORE the scorers (reference search_step order:
            # min-steps block, then eos threshold, then scorer fusion)
            eos_score = log_probs[:, self.eos_index]
            eos_score = jnp.where(step < min_steps, self.minus_inf, eos_score)
            if self.using_eos_threshold:
                max_logp = jnp.max(
                    log_probs.at[:, self.eos_index].set(eos_score), axis=-1
                )
                eos_blocked = eos_score <= (self.eos_threshold * max_logp)
                eos_score = jnp.where(eos_blocked, self.minus_inf, eos_score)
            log_probs = log_probs.at[:, self.eos_index].set(eos_score)
            if self.scorer is not None:
                log_probs, scorer_mem = self.scorer.score(
                    prev_tokens, scorer_mem, attn, log_probs, self.beam_size
                )
            if self.length_rewarding:
                # constant per-token reward — the reference expresses this
                # through LengthScorer (scorer.py:956); the flat add is
                # rank-preserving within a step and accumulates per token
                log_probs = log_probs + self.length_rewarding

            # candidate scores + reference-exact top-K selection
            cand = seq_scores[:, None] + log_probs  # (n_bh, V)
            cand = cand.reshape(B, K * V)
            if self.length_normalization:
                cand = cand / (step + 1)
            top_norm, top_idx = jax.lax.top_k(cand, K)  # (B, K), sorted
            src_beam = top_idx // V
            token_idx = top_idx % V  # (B, K)
            new_tokens = token_idx.reshape(n_bh)
            if self.length_normalization:
                new_seq_scores = (top_norm * (step + 1)).reshape(n_bh)
            else:
                new_seq_scores = top_norm.reshape(n_bh)

            predecessors = (src_beam + jnp.arange(B)[:, None] * K).reshape(-1)
            new_seq = jnp.take(seq, predecessors, axis=0)
            new_seq = new_seq.at[:, step].set(new_tokens)

            memory = self._permute_attn_mem(memory, predecessors)
            prev_attn_peak = jnp.take(cur_attn_peak, predecessors)
            if self.scorer is not None:
                scorer_mem = self.scorer.permute_scorer_mem(
                    scorer_mem, predecessors, new_tokens
                )

            # record eos selections into the finished set (slot order)
            is_eos = token_idx == self.eos_index  # (B, K)
            fin_seq, fin_scores, fin_lens, fin_count = self._record_finished(
                is_eos, top_norm, new_seq.reshape(B, K, max_steps),
                jnp.full((B, K), step + 1, jnp.int32),
                fin_seq, fin_scores, fin_lens, fin_count,
            )
            # eos'd slots die out (reference search_step:1586)
            seq_scores = jnp.where(
                is_eos.reshape(n_bh), self.minus_inf, new_seq_scores
            )
            return step + 1, (
                new_tokens,
                memory,
                scorer_mem,
                prev_attn_peak,
                new_seq,
                seq_scores,
                top_norm,
                fin_seq,
                fin_scores,
                fin_lens,
                fin_count,
            )

        def cond(loop_carry):
            # The reference's early exit (_check_full_beams): once every
            # utterance has recorded beam_size finished hypotheses,
            # further steps are provable no-ops here too — the finished
            # set is append-capped at K, so nothing can be written and
            # the post-loop alive fill writes nothing either. Stopping
            # is therefore bit-identical to running out the fixed bound.
            step, carry = loop_carry
            fin_count = carry[-1]
            return jnp.logical_and(
                step < max_steps, jnp.any(fin_count < K)
            )

        carry = (
            prev_tokens,
            memory,
            scorer_mem,
            prev_attn_peak,
            seq,
            seq_scores,
            last_norm_scores,
            fin_seq,
            fin_scores,
            fin_lens,
            fin_count,
        )
        _, carry = jax.lax.while_loop(cond, body, (jnp.int32(0), carry))
        (
            _pt, _mem, _sm, _pap,
            seq,
            seq_scores,
            last_norm_scores,
            fin_seq,
            fin_scores,
            fin_lens,
            fin_count,
        ) = carry
        # top up under-full beams from the alive rows in slot order
        # (reference _fill_alived_hyps_with_eos_token:1600); the filled
        # rows carry length max_steps so the final trim drops their last
        # token, exactly like the reference's eos-trim does
        fill = jnp.ones((B, K), bool)
        fin_seq, fin_scores, fin_lens, fin_count = self._record_finished(
            fill, last_norm_scores, seq.reshape(B, K, max_steps),
            jnp.full((B, K), max_steps, jnp.int32),
            fin_seq, fin_scores, fin_lens, fin_count,
        )
        return fin_seq, fin_scores, fin_lens, fin_count

    def _permute_attn_mem(self, memory, predecessors):
        """Predecessor gather of the decoder memory; skipped entirely in
        pure-CTC mode (reference _attn_weight_permute_memory_step)."""
        if self.attn_weight > 0:
            return self.permute_mem(memory, predecessors)
        return memory

    def _n_out(self):
        """Vocab size for the pure-CTC (attn_weight == 0) path, where no
        decoder forward provides it. Taken from the CTC scorer."""
        scorers = {**self.scorer.full_scorers, **self.scorer.partial_scorers}
        return scorers["ctc"].vocab_size

    def _gather_results(self, fin_seq, fin_scores, fin_lens, fin_count):
        """Host-side final ranking over the recorded finished set
        (reference _get_topk_prediction:1418). Each stored length
        includes the terminating eos (or the reference's drop-last-token
        fill quirk), so the emitted hypothesis is ``len - 1`` tokens."""
        B, K, L = fin_seq.shape
        hyps, scores, lengths = [], [], []
        topk_hyps, topk_scores, topk_lengths = [], [], []
        for b in range(B):
            order = np.argsort(-fin_scores[b], kind="stable")
            rows = [
                (
                    float(fin_scores[b, k]),
                    fin_seq[b, k, : max(0, int(fin_lens[b, k]) - 1)].tolist(),
                    max(0, int(fin_lens[b, k]) - 1),
                )
                for k in order
            ]
            hyps.append(rows[0][1])
            scores.append(rows[0][0])
            lengths.append(rows[0][2])
            topk_hyps.append([r[1] for r in rows[: self.topk]])
            topk_scores.append([r[0] for r in rows[: self.topk]])
            topk_lengths.append([r[2] for r in rows[: self.topk]])
        if self.return_topk:
            return hyps, np.asarray(lengths), np.asarray(scores), (
                topk_hyps, topk_scores, topk_lengths,
            )
        return hyps, np.asarray(lengths), np.asarray(scores), None


# ---------------------------------------------------------------------------
# Concrete searchers
# ---------------------------------------------------------------------------

class S2STransformerGreedySearcher(S2SGreedySearcher):
    """Greedy search over a TransformerASR decode half
    (reference S2STransformerGreedySearch).

    Arguments
    ---------
    modules : (transformer_apply, transformer_variables, seq_lin_apply)
        ``decode_fn(tokens_so_far, enc_states)`` -> (dec_out, attn) plus a
        final projection to vocab logits.
    """

    def __init__(self, decode_fn, vocab_size, max_length=512, **kwargs):
        super().__init__(**kwargs)
        self.decode_fn = decode_fn
        self.vocab_size = vocab_size
        self.max_length = max_length

    def reset_mem(self, batch_size, enc_states, enc_lens):
        # token buffer (B, max_length) starting with bos
        buf = jnp.full((batch_size, self.max_length), self.eos_index, jnp.int32)
        buf = buf.at[:, 0].set(self.bos_index)
        return {"tokens": buf}

    def forward_step(self, inp_tokens, memory, enc_states, enc_lens, step):
        buf = memory["tokens"].at[:, step].set(inp_tokens)
        # run the decoder over the whole (fixed-size) buffer, read position `step`
        log_probs_all, attn = self.decode_fn(buf, enc_states, enc_lens)
        log_probs = jax.lax.dynamic_slice_in_dim(
            log_probs_all, step, 1, axis=1
        )[:, 0]
        return log_probs, {"tokens": buf}, attn


class S2STransformerBeamSearcher(S2SBeamSearcher):
    """Beam search over TransformerASR.decode (reference seq2seq.py:1853).

    ``decode_fn(token_buffer, enc_states, enc_lens)`` must return
    (vocab log-probs for every position (N, L, V), cross-attention).
    The token buffer is the memory; it has a static length = max steps.
    """

    def __init__(self, decode_fn, max_length=512, **kwargs):
        super().__init__(**kwargs)
        self.decode_fn = decode_fn
        self.max_length = max_length

    def reset_mem(self, batch_size, enc_states, enc_lens):
        buf = jnp.full((batch_size, self.max_length), self.eos_index, jnp.int32)
        buf = buf.at[:, 0].set(self.bos_index)
        return {"tokens": buf}

    def forward_step(self, inp_tokens, memory, enc_states, enc_lens, step):
        buf = memory["tokens"].at[:, step].set(inp_tokens)
        log_probs_all, attn = self.decode_fn(buf, enc_states, enc_lens)
        log_probs = jax.lax.dynamic_slice_in_dim(log_probs_all, step, 1, axis=1)[:, 0]
        return log_probs, {"tokens": buf}, attn


class S2SRNNGreedySearcher(S2SGreedySearcher):
    """Greedy search for AttentionalRNNDecoder models
    (reference S2SRNNGreedySearcher).

    ``step_fn(inp_tokens, state, enc_states, enc_lens)`` returns
    (log_probs, new_state, attn); ``init_fn(n, enc_states, enc_lens)``
    builds the initial state.
    """

    def __init__(self, step_fn, init_fn, **kwargs):
        super().__init__(**kwargs)
        self.step_fn = step_fn
        self.init_fn = init_fn

    def reset_mem(self, batch_size, enc_states, enc_lens):
        return self.init_fn(batch_size, enc_states, enc_lens)

    def forward_step(self, inp_tokens, memory, enc_states, enc_lens, step):
        return self.step_fn(inp_tokens, memory, enc_states, enc_lens)


class S2SRNNBeamSearcher(S2SBeamSearcher):
    """Beam search for AttentionalRNNDecoder models
    (reference seq2seq.py:1752)."""

    def __init__(self, step_fn, init_fn, **kwargs):
        super().__init__(**kwargs)
        self.step_fn = step_fn
        self.init_fn = init_fn

    def reset_mem(self, batch_size, enc_states, enc_lens):
        return self.init_fn(batch_size, enc_states, enc_lens)

    def forward_step(self, inp_tokens, memory, enc_states, enc_lens, step):
        return self.step_fn(inp_tokens, memory, enc_states, enc_lens)


# ---------------------------------------------------------------------------
# Whisper searchers (reference seq2seq.py: S2SWhisperGreedySearcher,
# S2SWhisperBeamSearcher :1937)
# ---------------------------------------------------------------------------

class _WhisperDecodeMixin:
    """Shared fixed-buffer decode step for Whisper searchers.

    The decoder prompt (``<|startoftranscript|>`` [+ language + task +
    ``<|notimestamps|>``]) is pre-filled into the token buffer; each loop
    step writes one token and re-runs the causal decoder over the static
    buffer — fully jitted, no host round-trips (replaces the reference's
    per-token Python loop, inference/ASR.py:431-977).

    ``model`` must expose ``forward_decoder(enc_states, tokens) -> logits``.
    """

    def _setup_whisper(self, model, prompt_ids, max_length, suppress_ids,
                       max_gen_tokens, temperature, use_kv_cache=None):
        self.model = model
        self.prompt_ids = [int(t) for t in prompt_ids]
        self.max_length = max_length
        self.suppress_ids = tuple(int(t) for t in suppress_ids)
        self.max_gen_tokens = max_gen_tokens
        self.whisper_temperature = temperature
        if use_kv_cache is None:
            use_kv_cache = hasattr(model, "forward_decoder_step")
        self.use_kv_cache = use_kv_cache

    def change_max_decoding_length(self, min_decode_steps, max_decode_steps):
        cap = min(self.max_length - len(self.prompt_ids), self.max_gen_tokens)
        return min(min_decode_steps, cap), min(max_decode_steps, cap)

    def _buffer_len(self, enc_T):
        _, steps = self.change_max_decoding_length(
            0, max(1, int(enc_T * self.max_decode_ratio))
        )
        return steps + len(self.prompt_ids)

    def reset_mem(self, batch_size, enc_states, enc_lens):
        P = len(self.prompt_ids)
        if self.use_kv_cache:
            # warm the KV cache with the prompt prefix (all but the last
            # prompt token, which is the loop's bos)
            cache = self.model.init_decode_cache(
                batch_size, self._buffer_len(enc_states.shape[1]),
                enc_states,
            )
            for pos, tok in enumerate(self.prompt_ids[:-1]):
                toks = jnp.full((batch_size,), tok, jnp.int32)
                _, cache = self.model.forward_decoder_step(
                    enc_states, toks, cache, pos
                )
            return {"cache": cache}
        buf = jnp.full(
            (batch_size, self._buffer_len(enc_states.shape[1])),
            self.eos_index, jnp.int32,
        )
        buf = buf.at[:, :P].set(jnp.asarray(self.prompt_ids, jnp.int32))
        return {"tokens": buf}

    def forward_step(self, inp_tokens, memory, enc_states, enc_lens, step):
        P = len(self.prompt_ids)
        if self.use_kv_cache:
            logits, cache = self.model.forward_decoder_step(
                enc_states, inp_tokens, memory["cache"], step + P - 1
            )
            logp = jax.nn.log_softmax(
                logits / self.whisper_temperature, axis=-1
            )
            if self.suppress_ids:
                logp = logp.at[:, jnp.asarray(self.suppress_ids)].set(
                    NEG_INF
                )
            return logp, {"cache": cache}, None
        buf = memory["tokens"].at[:, step + P - 1].set(inp_tokens)
        logits = self.model.forward_decoder(enc_states, buf)
        logp_all = jax.nn.log_softmax(
            logits / self.whisper_temperature, axis=-1
        )
        logp = jax.lax.dynamic_slice_in_dim(
            logp_all, step + P - 1, 1, axis=1
        )[:, 0]
        if self.suppress_ids:
            logp = logp.at[:, jnp.asarray(self.suppress_ids)].set(NEG_INF)
        return logp, {"tokens": buf}, None


class S2SWhisperGreedySearcher(_WhisperDecodeMixin, S2SGreedySearcher):
    """Jitted greedy decoding for Whisper (reference
    S2SWhisperGreedySearch)."""

    def __init__(self, model, prompt_ids, eos_index, max_length=448,
                 suppress_ids=(), max_gen_tokens=224, temperature=1.0,
                 min_decode_ratio=0.0, max_decode_ratio=1.0,
                 use_kv_cache=None, **kwargs):
        S2SGreedySearcher.__init__(
            self,
            bos_index=int(prompt_ids[-1]),
            eos_index=eos_index,
            min_decode_ratio=min_decode_ratio,
            max_decode_ratio=max_decode_ratio,
            **kwargs,
        )
        self._setup_whisper(
            model, prompt_ids, max_length, suppress_ids, max_gen_tokens,
            temperature, use_kv_cache,
        )


class S2SWhisperBeamSearcher(_WhisperDecodeMixin, S2SBeamSearcher):
    """Batched beam search for Whisper (reference seq2seq.py:1937),
    running the same fori_loop machinery as the other beam searchers."""

    def __init__(self, model, prompt_ids, eos_index, beam_size=4,
                 max_length=448, suppress_ids=(), max_gen_tokens=224,
                 temperature=1.0, min_decode_ratio=0.0, max_decode_ratio=1.0,
                 use_kv_cache=None, **kwargs):
        S2SBeamSearcher.__init__(
            self,
            bos_index=int(prompt_ids[-1]),
            eos_index=eos_index,
            min_decode_ratio=min_decode_ratio,
            max_decode_ratio=max_decode_ratio,
            beam_size=beam_size,
            **kwargs,
        )
        self._setup_whisper(
            model, prompt_ids, max_length, suppress_ids, max_gen_tokens,
            temperature, use_kv_cache,
        )


# ---------------------------------------------------------------------------
# KV-cached searchers: O(L) per decode step via explicit per-layer K/V
# buffers instead of re-running the decoder over the whole token buffer
# (the serving-speed path; pairs with TransformerASR.decode_step)
# ---------------------------------------------------------------------------

class _KVDecodeMixin:
    """``decode_step_fn(tokens (N,), cache, enc_states, enc_lens, step)``
    -> (vocab log-probs (N, V), new_cache, attn);
    ``init_cache_fn(n, enc_states, enc_lens)`` -> cache pytree whose
    leaves are batch-leading (the beam predecessor gather permutes
    axis 0).

    ``ancestry_kv=True`` switches to ancestry beam decoding
    (ops/beam_attention.py): self-KV cache rows never move — the
    per-step permute of multi-GB caches (the measured dominant cost of
    large-beam decoding) is replaced by a tiny int32 ancestry-table
    gather, and ``decode_step_fn`` must accept a sixth ``anc`` argument
    (B_utt, beam, L) that it forwards into the model's cached
    attention."""

    def _setup_kv(self, decode_step_fn, init_cache_fn,
                  shared_cross_kv=False, ancestry_kv=False):
        self.decode_step_fn = decode_step_fn
        self.init_cache_fn = init_cache_fn
        # build the cache from UNINFLATED encoder states: cross K/V stay
        # per-utterance and broadcast over beams inside the attention
        self.reset_mem_uninflated = shared_cross_kv
        self.ancestry_kv = ancestry_kv

    def _cache_len(self, cache):
        # prefer the per-hypothesis "self" buffers: beam-shared "cross"
        # entries have a different (per-utterance, head-major) shape
        if isinstance(cache, (list, tuple)) and cache and isinstance(
            cache[0], dict
        ) and "self" in cache[0]:
            cache = cache[0]["self"]
        for leaf in jax.tree_util.tree_leaves(cache):
            if hasattr(leaf, "ndim") and leaf.ndim >= 2:
                return leaf.shape[1]
        raise ValueError("empty decode cache")

    def reset_mem(self, batch_size, enc_states, enc_lens):
        cache = self.init_cache_fn(batch_size, enc_states, enc_lens)
        if not self.ancestry_kv:
            return cache
        K = self.beam_size
        B_utt = batch_size // K
        L = self._cache_len(cache)
        # anc[b, h, t] = beam row holding position t of hypothesis h's
        # history; initialised to "own row" — the per-step predecessor
        # gather then makes every written position inherit the id of
        # the row that wrote it
        anc = jnp.broadcast_to(
            jnp.arange(K, dtype=jnp.int32)[None, :, None], (B_utt, K, L)
        )
        return {"cache": cache, "anc": jnp.asarray(anc)}

    def permute_mem(self, memory, index):
        """Predecessor gather of the per-hypothesis cache — EXCEPT any
        per-layer "cross" entries (precomputed cross-attention K/V of
        the static encoder memory): those are identical across the beams
        of one utterance, and predecessors only permute within an
        utterance, so gathering hundreds of MB of encoder K/V per step
        would be pure waste."""
        layout = getattr(self, "_beam_layout", None)
        if self.ancestry_kv:
            # cache rows NEVER move; only the ancestry table is gathered
            anc = memory["anc"]
            B_utt, K, L = anc.shape
            anc = jnp.take(
                anc.reshape(B_utt * K, L), index, axis=0
            ).reshape(B_utt, K, L)
            return {"cache": memory["cache"], "anc": anc}
        if isinstance(memory, (list, tuple)) and all(
            isinstance(layer, dict) for layer in memory
        ):
            return [
                {
                    k: (
                        v if k == "cross"
                        else jax.tree_util.tree_map(
                            lambda t: gather_rows(t, index, layout), v
                        )
                    )
                    for k, v in layer.items()
                }
                for layer in memory
            ]
        return super().permute_mem(memory, index)

    def forward_step(self, inp_tokens, memory, enc_states, enc_lens, step):
        if self.ancestry_kv:
            # position ``step`` is written by each row itself THIS step,
            # so its ancestry entry must read "own row" now; the value
            # left there by earlier permutes is stale. Stamping it here
            # (before the end-of-step permute) also makes the permute
            # record the correct writer for all future steps.
            anc = _stamp_self_column(memory["anc"], step)
            log_probs, new_cache, attn = self.decode_step_fn(
                inp_tokens, memory["cache"], enc_states, enc_lens, step,
                anc,
            )
            return log_probs, {"cache": new_cache, "anc": anc}, attn
        log_probs, new_cache, attn = self.decode_step_fn(
            inp_tokens, memory, enc_states, enc_lens, step
        )
        return log_probs, new_cache, attn


class S2SKVGreedySearcher(_KVDecodeMixin, S2SGreedySearcher):
    """Greedy decoding over a KV-cached decode step."""

    def __init__(self, decode_step_fn, init_cache_fn, **kwargs):
        S2SGreedySearcher.__init__(self, **kwargs)
        self._setup_kv(decode_step_fn, init_cache_fn)


class S2SKVBeamSearcher(_KVDecodeMixin, S2SBeamSearcher):
    """Batched beam search over a KV-cached decode step: hypothesis
    K/V buffers ride the standard predecessor gather (axis-0 permute of
    the cache pytree), or — with ``ancestry_kv=True`` — never move at
    all (ancestry beam decoding, the TPU serving path)."""

    def __init__(self, decode_step_fn, init_cache_fn,
                 shared_cross_kv=False, ancestry_kv=False, **kwargs):
        S2SBeamSearcher.__init__(self, **kwargs)
        self._setup_kv(decode_step_fn, init_cache_fn,
                       shared_cross_kv=shared_cross_kv,
                       ancestry_kv=ancestry_kv)
