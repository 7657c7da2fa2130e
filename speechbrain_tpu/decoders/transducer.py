"""Transducer decoding: greedy (device) and beam search (host).

Capability parity with the reference's ``speechbrain/decoders/transducer.py``
(TransducerBeamSearcher :25, greedy + beam with optional LM shallow fusion,
streaming greedy context :16).

Greedy is a fixed-bound jitted loop: at each encoder frame, emit up to
``max_symbols_per_step`` labels (inner unrolled loop with masking) — the
XLA-friendly rewrite of the reference's while-loop-per-frame. Beam search
runs host-side per utterance (transducer beams are ragged by nature);
step functions are still jitted.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class TransducerGreedySearcherStreamingContext:
    """Streaming state: last emitted token + prediction-net hidden
    (reference transducer.py:16)."""

    hidden: object = None
    last_token: object = None


class TransducerBeamSearcher:
    """Greedy / beam transducer search (reference transducer.py:25).

    Arguments
    ---------
    decode_network_lst : callable
        ``pred_step(tokens (B, 1), hidden) -> (pn_out (B, 1, H), hidden)``
        — the prediction network step (embedding + RNN), params bound.
    tjoint : callable
        ``tjoint(enc (B, 1, 1, H), pn (B, 1, 1, H)) -> (B, 1, 1, V-ish)``
        joint + output projection producing log-probs after classifier.
    classifier_network : callable
        maps joint output to vocab logits.
    blank_id : int
    beam_size : int (1 = greedy)
    nbest : int
    lm_module : callable, optional  (tokens, hidden) -> (logits, hidden)
    lm_weight : float
    state_beam / expand_beam : float — pruning constants (reference defaults)
    """

    def __init__(
        self,
        decode_network_lst,
        tjoint,
        classifier_network,
        blank_id,
        beam_size=4,
        nbest=5,
        lm_module=None,
        lm_weight=0.0,
        state_beam=2.3,
        expand_beam=2.3,
        max_symbols_per_step=10,
    ):
        self.pred_step = decode_network_lst
        self.tjoint = tjoint
        self.classifier = classifier_network
        self.blank_id = blank_id
        self.beam_size = beam_size
        self.nbest = nbest
        self.lm = lm_module
        self.lm_weight = lm_weight
        self.state_beam = state_beam
        self.expand_beam = expand_beam
        self.max_symbols_per_step = max_symbols_per_step

    def __call__(self, tn_output):
        """tn_output: (B, T, H) encoder states. Returns (hyps, scores, ...)."""
        if self.beam_size == 1:
            return self.transducer_greedy_decode(tn_output)
        return self.transducer_beam_search_decode(tn_output)

    # -- greedy (jitted, batched) ------------------------------------------
    def transducer_greedy_decode(self, tn_output, hidden_state=None,
                                 return_hidden=False):
        """Batched greedy decode; pass ``hidden_state=(last_token,
        hidden)`` (from a previous chunk) and ``return_hidden=True`` for
        streaming chunk-wise decoding (reference
        transducer_greedy_decode:91)."""
        B, T, H = tn_output.shape
        tokens, carry = self._greedy_jit(tn_output, B, hidden_state)
        tokens = np.asarray(tokens)
        hyps = [
            [int(t) for t in row if t != self.blank_id] for row in tokens
        ]
        if return_hidden:
            return hyps, None, None, None, carry
        return hyps, None, None, None

    def transducer_greedy_decode_streaming(self, x, context):
        """One chunk of streaming greedy decode against a
        :class:`TransducerGreedySearcherStreamingContext` (reference
        transducer.py:~160)."""
        init = None
        if context.hidden is not None:
            init = (context.last_token, context.hidden)
        hyps, _, _, _, (last_tok, hidden) = self.transducer_greedy_decode(
            x, hidden_state=init, return_hidden=True
        )
        context.hidden = hidden
        context.last_token = last_tok
        return hyps

    def _greedy_jit(self, tn_output, B, init_carry=None):
        blank = self.blank_id
        max_sym = self.max_symbols_per_step
        T = tn_output.shape[1]

        def frame_step(carry, t):
            last_tok, hidden, out_buf, out_pos = carry
            enc_t = jax.lax.dynamic_slice_in_dim(tn_output, t, 1, axis=1)

            def emit_step(i, inner):
                last_tok, hidden, out_buf, out_pos, done = inner
                pn_out, new_hidden = self.pred_step(last_tok[:, None], hidden)
                joint = self.tjoint(enc_t[:, :, None, :], pn_out[:, None, :, :])
                logits = self.classifier(joint)[:, 0, 0]
                log_probs = jax.nn.log_softmax(logits, axis=-1)
                pred = jnp.argmax(log_probs, axis=-1).astype(jnp.int32)
                is_blank = jnp.logical_or(pred == blank, done)
                # write non-blank tokens into the buffer
                write_tok = jnp.where(is_blank, blank, pred)
                out_buf = jax.vmap(
                    lambda buf, pos, tok: buf.at[pos].set(tok)
                )(out_buf, out_pos, write_tok)
                out_pos = out_pos + jnp.where(is_blank, 0, 1)
                new_last = jnp.where(is_blank, last_tok, pred)
                hidden = jax.tree_util.tree_map(
                    lambda n, o: jnp.where(
                        is_blank.reshape((-1,) + (1,) * (n.ndim - 1))
                        if n.ndim >= 1 and n.shape[0] == B
                        else is_blank.reshape((1, -1) + (1,) * (n.ndim - 2)),
                        o,
                        n,
                    ),
                    new_hidden,
                    hidden,
                )
                done = is_blank
                return new_last, hidden, out_buf, out_pos, done

            done0 = jnp.zeros((B,), bool)
            inner = (last_tok, hidden, out_buf, out_pos, done0)
            inner = jax.lax.fori_loop(0, max_sym, emit_step, inner)
            last_tok, hidden, out_buf, out_pos, _ = inner
            return (last_tok, hidden, out_buf, out_pos), None

        # every frame may emit up to max_symbols_per_step labels
        max_out = T * max_sym
        out_buf = jnp.full((B, max_out), blank, jnp.int32)
        out_pos = jnp.zeros((B,), jnp.int32)
        if init_carry is not None:
            last_tok, hidden0 = init_carry
        else:
            last_tok = jnp.full((B,), blank, jnp.int32)
            pn_out, hidden0 = self.pred_step(last_tok[:, None], None)
            # fresh zero hidden (pred_step only provided the shape)
            hidden0 = jax.tree_util.tree_map(jnp.zeros_like, hidden0)
        carry = (last_tok, hidden0, out_buf, out_pos)
        (last_tok, hidden, out_buf, out_pos), _ = jax.lax.scan(
            frame_step, carry, jnp.arange(T)
        )
        return out_buf, (last_tok, hidden)

    # -- beam (host loop, jitted steps) -------------------------------------
    def transducer_beam_search_decode(self, tn_output):
        tn_output = np.asarray(tn_output)
        B, T, H = tn_output.shape
        nbest_batch = []
        nbest_batch_score = []
        best_hyps = []
        for b in range(B):
            hyps = [
                {
                    "prediction": [self.blank_id],
                    "logp_score": 0.0,
                    "hidden": None,
                    "lm_hidden": None,
                }
            ]
            for t in range(T):
                enc_t = jnp.asarray(tn_output[b : b + 1, t : t + 1])
                process = list(hyps)
                hyps = []
                while len(hyps) < self.beam_size and process:
                    best = max(process, key=lambda h: h["logp_score"] / len(h["prediction"]))
                    process.remove(best)
                    if hyps:
                        a_best = max(
                            hyps, key=lambda h: h["logp_score"] / len(h["prediction"])
                        )
                        if (
                            a_best["logp_score"] / len(a_best["prediction"])
                            >= self.state_beam
                            + best["logp_score"] / len(best["prediction"])
                        ):
                            break
                    tok = jnp.asarray([[best["prediction"][-1]]], jnp.int32)
                    pn_out, hidden = self.pred_step(tok, best["hidden"])
                    joint = self.tjoint(
                        enc_t[:, :, None, :], pn_out[:, None, :, :]
                    )
                    logits = self.classifier(joint)[:, 0, 0]
                    log_probs = np.asarray(
                        jax.nn.log_softmax(logits, axis=-1)
                    )[0]
                    if self.lm is not None and self.lm_weight > 0:
                        lm_logits, lm_hidden = self.lm(tok, best["lm_hidden"])
                        lm_logp = np.asarray(
                            jax.nn.log_softmax(lm_logits[:, -1], axis=-1)
                        )[0]
                    else:
                        lm_logp, lm_hidden = None, None
                    # blank: stays in hyps
                    hyps.append(
                        {
                            "prediction": best["prediction"],
                            "logp_score": best["logp_score"]
                            + float(log_probs[self.blank_id]),
                            "hidden": best["hidden"],
                            "lm_hidden": best["lm_hidden"],
                        }
                    )
                    # expand top-k non-blank
                    order = np.argsort(log_probs)[::-1]
                    best_logp = (
                        log_probs[order[0]]
                        if order[0] != self.blank_id
                        else log_probs[order[1]]
                    )
                    for k in order[: self.beam_size]:
                        if k == self.blank_id:
                            continue
                        if log_probs[k] < best_logp - self.expand_beam:
                            continue
                        score = best["logp_score"] + float(log_probs[k])
                        if lm_logp is not None:
                            score += self.lm_weight * float(lm_logp[k])
                        process.append(
                            {
                                "prediction": best["prediction"] + [int(k)],
                                "logp_score": score,
                                "hidden": hidden,
                                "lm_hidden": lm_hidden,
                            }
                        )
            nbest = sorted(
                hyps, key=lambda h: h["logp_score"] / len(h["prediction"]),
                reverse=True,
            )[: self.nbest]
            best_hyps.append(nbest[0]["prediction"][1:])
            nbest_batch.append([h["prediction"][1:] for h in nbest])
            nbest_batch_score.append(
                [h["logp_score"] / len(h["prediction"]) for h in nbest]
            )
        return (
            best_hyps,
            [s[0] for s in nbest_batch_score],
            nbest_batch,
            nbest_batch_score,
        )
