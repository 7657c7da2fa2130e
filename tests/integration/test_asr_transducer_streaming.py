"""Integration: Conformer-Transducer streaming decode == offline decode
(mirrors reference tests/integration/ASR_ConformerTransducer_streaming):
a chunked Conformer encoder + transducer greedy decoding with carried
prediction-net state, chunk by chunk."""

import numpy as np
import jax
import jax.numpy as jnp

from speechbrain_tpu.decoders.transducer import (
    TransducerBeamSearcher,
    TransducerGreedySearcherStreamingContext,
)
from speechbrain_tpu.lobes.models.transformer.TransformerASR import (
    TransformerASR,
)
from speechbrain_tpu.nnet.embedding import Embedding
from speechbrain_tpu.nnet.linear import Linear
from speechbrain_tpu.nnet.RNN import GRU
from speechbrain_tpu.nnet.transducer_joint import TransducerJoint
from speechbrain_tpu.utils.dynamic_chunk_training import DynChunkTrainConfig

BLANK = 0
VOCAB = 6
KEY = jax.random.PRNGKey(0)


def test_streaming_transducer_matches_offline():
    C, L = 4, 2
    H = 16
    enc = TransformerASR(
        tgt_vocab=VOCAB, input_size=12, d_model=H, nhead=4,
        num_encoder_layers=2, num_decoder_layers=0, d_ffn=32,
        encoder_module="conformer", attention_type="RelPosMHAXL",
        kernel_size=5,
    )
    emb = Embedding(num_embeddings=VOCAB, embedding_dim=8)
    dec = GRU(hidden_size=H, num_layers=1)
    joint = TransducerJoint(joint="sum")
    out_lin = Linear(n_neurons=VOCAB)

    src = jax.random.normal(KEY, (2, 16, 12))
    cfg = DynChunkTrainConfig(chunk_size=C, left_context_size=L)
    v_enc = enc.init(KEY, src, None, dynchunktrain_config=cfg)

    tok0 = jnp.zeros((2, 1), jnp.int32)
    v_emb = emb.init(KEY, tok0)
    e0 = emb.apply(v_emb, tok0)
    v_dec = dec.init(KEY, e0)
    p0, _ = dec.apply(v_dec, e0)
    enc0 = enc.apply(v_enc, src, dynchunktrain_config=cfg, method="encode")
    v_joint = joint.init(KEY, enc0[:, :1, None, :], p0[:, None, :, :])
    j0 = joint.apply(v_joint, enc0[:, :1, None, :], p0[:, None, :, :])
    v_out = out_lin.init(KEY, j0)

    def pred_step(tokens, hidden):
        e = emb.apply(v_emb, tokens)
        out, hn = dec.apply(v_dec, e, hidden)
        return out, hn

    def tjoint(enc_t, pn_t):
        return joint.apply(v_joint, enc_t, pn_t)

    def classifier(x):
        return out_lin.apply(v_out, x)

    searcher = TransducerBeamSearcher(
        decode_network_lst=pred_step, tjoint=tjoint,
        classifier_network=classifier, blank_id=BLANK, beam_size=1,
        max_symbols_per_step=3,
    )

    # streaming: encoder context + transducer greedy context carried
    enc_ctx = enc.make_streaming_context(2, cfg)
    dec_ctx = TransducerGreedySearcherStreamingContext()
    streamed = [[] for _ in range(2)]
    chunk_outs = []
    for i in range(4):
        chunk = src[:, i * C : (i + 1) * C]
        out, enc_ctx = enc.apply(v_enc, chunk, enc_ctx,
                                 method="encode_streaming")
        chunk_outs.append(out)
        hyps = searcher.transducer_greedy_decode_streaming(out, dec_ctx)
        for b, h in enumerate(hyps):
            streamed[b].extend(h)

    # 1) encoder streaming parity vs offline chunked-mask encode
    enc_full = enc.apply(v_enc, src, dynchunktrain_config=cfg,
                         method="encode")
    err = float(jnp.abs(enc_full - jnp.concatenate(chunk_outs, 1)).max())
    assert err < 2e-4, err

    # 2) decoder-carry semantics: chunk-wise greedy with carried
    #    (last_token, hidden) must equal one-shot greedy over the SAME
    #    encoder outputs (bit-identical inputs -> no argmax tie flips)
    enc_streamed = jnp.concatenate(chunk_outs, axis=1)
    offline_hyps, _, _, _ = searcher(enc_streamed)
    assert streamed == offline_hyps, (streamed, offline_hyps)
    assert any(len(h) > 0 for h in streamed)
