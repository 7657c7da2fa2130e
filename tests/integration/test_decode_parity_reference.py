"""Transcript-level decode parity against THE REFERENCE searcher.

The north star is "WER parity + >10x throughput" on the
conformer + TransformerLM joint CTC/attention `transcribe_batch` path.
Module pours prove 1e-4 weight/output parity; THIS test proves the other
half: the reference's `S2STransformerBeamSearcher` + `ScorerBuilder`
(ref decoders/seq2seq.py:1853, decoders/scorer.py:1075) and our searcher
emit IDENTICAL token sequences on the same poured checkpoint and the
same audio features — beam bookkeeping, eos thresholding, length
normalization, CTC prefix scoring and LM fusion all agree end to end.

A tiny conformer encoder-decoder (+ctc/seq heads) and a TransformerLM
are TRAINED briefly in torch on a synthetic deterministic task so the
decode decisions are well-separated (an untrained model's near-uniform
distributions would let 1e-5 pour noise flip ties and prove nothing).
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"

# decode alphabet
V, BLANK, BOS, EOS = 24, 0, 1, 2
D, NHEAD, FFN = 32, 2, 64
T_IN, INPUT_SIZE, TGT_LEN, STRIDE = 24, 12, 5, 4
BATCH = 8


def _install_ref():
    for name, attrs in {
        "hyperpyyaml": ["resolve_references", "load_hyperpyyaml",
                        "dump_hyperpyyaml"],
        "torchaudio": ["load", "save", "info"],
    }.items():
        if name in sys.modules:
            continue
        m = types.ModuleType(name)
        for a in attrs:
            setattr(m, a, lambda *x, **k: None)
        if name == "torchaudio":
            m.__version__ = "2.0.0"
            tr = types.ModuleType("torchaudio.transforms")
            m.transforms = tr
            sys.modules["torchaudio.transforms"] = tr
        sys.modules[name] = m
    if REF not in sys.path:
        sys.path.insert(0, REF)


def _synthetic_batch(rng, batch=BATCH):
    """Deterministic features: each target token paints STRIDE frames
    with its own (fixed random) pattern; the model must learn the
    pattern -> token mapping."""
    targets = rng.integers(3, V, size=(batch, TGT_LEN))
    patterns = np.asarray(
        np.random.default_rng(7).standard_normal((V, INPUT_SIZE)), np.float32
    )
    feats = np.zeros((batch, T_IN, INPUT_SIZE), np.float32)
    for b in range(batch):
        for j in range(TGT_LEN):
            feats[b, j * STRIDE:(j + 1) * STRIDE] = patterns[targets[b, j]]
    feats += 0.05 * rng.standard_normal(feats.shape).astype(np.float32)
    return feats, targets


@pytest.fixture(scope="module")
def trained_torch_models():
    """Tiny reference conformer enc-dec + heads + TransformerLM, briefly
    trained (joint CTC+CE / LM CE) so decode decisions are peaked."""
    _install_ref()
    torch.manual_seed(3407)
    from speechbrain.lobes.models.transformer.TransformerASR import (
        TransformerASR as TorchASR,
    )
    from speechbrain.lobes.models.transformer.TransformerLM import (
        TransformerLM as TorchLM,
    )
    from speechbrain.nnet.linear import Linear as TorchLinear

    tnet = TorchASR(
        tgt_vocab=V, input_size=INPUT_SIZE, d_model=D, nhead=NHEAD,
        num_encoder_layers=2, num_decoder_layers=2, d_ffn=FFN,
        encoder_module="conformer", attention_type="RelPosMHAXL",
        kernel_size=7, normalize_before=True, causal=False, dropout=0.0,
    )
    tctc = TorchLinear(input_size=D, n_neurons=V)
    tseq = TorchLinear(input_size=D, n_neurons=V)
    tlm = TorchLM(
        vocab=V, d_model=D, nhead=NHEAD, num_encoder_layers=2,
        num_decoder_layers=0, d_ffn=FFN, dropout=0.0,
        activation=torch.nn.GELU, normalize_before=False,
    )

    rng = np.random.default_rng(11)
    feats, targets = _synthetic_batch(rng, batch=16)
    x = torch.from_numpy(feats)
    y = torch.from_numpy(targets).long()
    y_bos = torch.cat([torch.full((16, 1), BOS).long(), y], dim=1)
    y_eos = torch.cat([y, torch.full((16, 1), EOS).long()], dim=1)
    wl = torch.ones(16)

    opt = torch.optim.Adam(
        [*tnet.parameters(), *tctc.parameters(), *tseq.parameters()], lr=3e-3
    )
    for _ in range(180):
        opt.zero_grad()
        enc, dec = tnet(x, y_bos, wav_len=wl)
        ctc_logp = torch.log_softmax(tctc(enc), dim=-1)
        ctc = torch.nn.functional.ctc_loss(
            ctc_logp.transpose(0, 1),
            y, torch.full((16,), enc.shape[1]).long(),
            torch.full((16,), TGT_LEN).long(), blank=BLANK,
        )
        ce = torch.nn.functional.cross_entropy(
            tseq(dec).reshape(-1, V), y_eos.reshape(-1)
        )
        (ctc + ce).backward()
        opt.step()
    opt_lm = torch.optim.Adam(tlm.parameters(), lr=3e-3)
    for _ in range(120):
        opt_lm.zero_grad()
        pred = tlm(y_bos)
        torch.nn.functional.cross_entropy(
            pred.reshape(-1, V), y_eos.reshape(-1)
        ).backward()
        opt_lm.step()
    tnet.eval(), tlm.eval()
    return tnet, tctc, tseq, tlm


@pytest.fixture(scope="module")
def poured_jax_models(trained_torch_models, tmp_path_factory):
    """Pour every trained torch module through the exact converter
    registry into our models."""
    import jax
    import jax.numpy as jnp

    from speechbrain_tpu.lobes.models.transformer.TransformerASR import (
        TransformerASR,
    )
    from speechbrain_tpu.lobes.models.transformer.TransformerLM import (
        TransformerLM,
    )
    from speechbrain_tpu.nnet.linear import Linear
    from speechbrain_tpu.utils.torch_convert import (
        load_torch_state_dict_into_pytree,
        pour_reference_checkpoint,
    )

    tnet, tctc, tseq, tlm = trained_torch_models
    tmp = tmp_path_factory.mktemp("ckpts")

    net = TransformerASR(
        tgt_vocab=V, input_size=INPUT_SIZE, d_model=D, nhead=NHEAD,
        num_encoder_layers=2, num_decoder_layers=2, d_ffn=FFN,
        encoder_module="conformer", attention_type="RelPosMHAXL",
        kernel_size=7, normalize_before=True, dropout=0.0,
    )
    ctc_lin, seq_lin = Linear(n_neurons=V), Linear(n_neurons=V)
    lm = TransformerLM(
        vocab=V, d_model=D, nhead=NHEAD, num_encoder_layers=2, d_ffn=FFN,
        dropout=0.0, activation="gelu", normalize_before=False,
    )

    rng = jax.random.PRNGKey(0)
    src = jnp.zeros((2, T_IN, INPUT_SIZE), jnp.float32)
    tok = jnp.zeros((2, 3), jnp.int32)
    v = net.init(rng, src, tok)
    enc0 = net.apply(v, src, method="encode")
    v_ctc = ctc_lin.init(rng, enc0)
    dec0, _ = net.apply(v, tok, enc0, method="decode")
    v_seq = seq_lin.init(rng, dec0)
    v_lm = lm.init(rng, tok)

    p = tmp / "asr.ckpt"
    torch.save(tnet.state_dict(), p)
    v = pour_reference_checkpoint(net, v, str(p), strict=True)
    p = tmp / "lm.ckpt"
    torch.save(tlm.state_dict(), p)
    v_lm = pour_reference_checkpoint(lm, v_lm, str(p), strict=True)
    for tmod, tgt in ((tctc, "ctc"), (tseq, "seq")):
        p = tmp / f"{tgt}.ckpt"
        torch.save(tmod.state_dict(), p)
        if tgt == "ctc":
            v_ctc = load_torch_state_dict_into_pytree(str(p), v_ctc)
        else:
            v_seq = load_torch_state_dict_into_pytree(str(p), v_seq)
    return net, v, ctc_lin, v_ctc, seq_lin, v_seq, lm, v_lm


def test_poured_models_match_torch_outputs(
    trained_torch_models, poured_jax_models
):
    """Sanity gate: encoder / decoder-step / LM outputs agree before the
    searcher comparison means anything."""
    import jax.numpy as jnp

    tnet, tctc, tseq, tlm = trained_torch_models
    net, v, ctc_lin, v_ctc, seq_lin, v_seq, lm, v_lm = poured_jax_models
    rng = np.random.default_rng(5)
    feats, _ = _synthetic_batch(rng, batch=4)
    with torch.no_grad():
        tenc = tnet.encode(torch.from_numpy(feats), torch.ones(4))
        tlm_out = tlm(torch.tensor([[BOS, 5, 9], [BOS, 4, 3]]))
    jenc = net.apply(v, jnp.asarray(feats), method="encode")
    np.testing.assert_allclose(
        np.asarray(jenc), tenc.numpy(), rtol=2e-3, atol=2e-3
    )
    jlm = lm.apply(v_lm, jnp.asarray([[BOS, 5, 9], [BOS, 4, 3]]))
    np.testing.assert_allclose(
        np.asarray(jlm), tlm_out.numpy(), rtol=2e-3, atol=2e-3
    )


def _reference_hyps(trained_torch_models, feats, cfg):
    from speechbrain.decoders.scorer import (
        CTCScorer as RefCTCScorer,
        ScorerBuilder as RefScorerBuilder,
        TransformerLMScorer as RefTransformerLMScorer,
    )
    from speechbrain.decoders.seq2seq import (
        S2STransformerBeamSearcher as RefSearcher,
    )

    tnet, tctc, tseq, tlm = trained_torch_models
    scorer = None
    if cfg["fusion"]:
        scorer = RefScorerBuilder(
            full_scorers=[
                RefTransformerLMScorer(
                    language_model=tlm, temperature=cfg["lm_temperature"]
                )
            ],
            partial_scorers=[
                RefCTCScorer(ctc_fc=tctc, blank_index=BLANK, eos_index=EOS)
            ],
            weights={"transformerlm": cfg["lm_weight"],
                     "ctc": cfg["ctc_weight"]},
        )
    searcher = RefSearcher(
        modules=[tnet, tseq],
        bos_index=BOS, eos_index=EOS,
        min_decode_ratio=cfg["min_ratio"], max_decode_ratio=cfg["max_ratio"],
        beam_size=cfg["beam"], temperature=cfg["temperature"],
        using_eos_threshold=cfg["eos_threshold"] is not None,
        eos_threshold=cfg["eos_threshold"] or 1.5,
        length_normalization=cfg["length_norm"], scorer=scorer,
    )
    with torch.no_grad():
        enc = tnet.encode(torch.from_numpy(feats), torch.ones(len(feats)))
        hyps, _, scores, _ = searcher(enc, torch.ones(len(feats)))
    return hyps, np.asarray(scores)


def _our_hyps(poured_jax_models, feats, cfg, kv):
    import jax
    import jax.numpy as jnp

    from speechbrain_tpu.decoders.scorer import (
        CTCScorer, KVTransformerLMScorer, ScorerBuilder,
    )
    from speechbrain_tpu.decoders.seq2seq import (
        S2SKVBeamSearcher, S2STransformerBeamSearcher,
    )

    net, v, ctc_lin, v_ctc, seq_lin, v_seq, lm, v_lm = poured_jax_models
    enc = net.apply(v, jnp.asarray(feats), method="encode")
    T = enc.shape[1]
    max_steps = max(1, int(T * cfg["max_ratio"]))

    scorer = None
    if cfg["fusion"]:
        scorer = ScorerBuilder(
            weights={"transformerlm": cfg["lm_weight"],
                     "ctc": cfg["ctc_weight"]},
            full_scorers={
                "transformerlm": KVTransformerLMScorer(
                    step_fn=lambda t, c, s: lm.apply(
                        v_lm, t, c, s, method="score_step"
                    ),
                    init_cache_fn=lambda n, L: lm.apply(
                        v_lm, n, L, method="init_cache"
                    ),
                    max_length=max_steps + 1,
                    temperature=cfg["lm_temperature"],
                )
            },
            partial_scorers={
                "ctc": CTCScorer(
                    ctc_fn=lambda e: jax.nn.log_softmax(
                        ctc_lin.apply(v_ctc, e), -1
                    ),
                    blank_index=BLANK, eos_index=EOS,
                )
            },
        )
    common = dict(
        bos_index=BOS, eos_index=EOS,
        min_decode_ratio=cfg["min_ratio"], max_decode_ratio=cfg["max_ratio"],
        beam_size=cfg["beam"],
        using_eos_threshold=cfg["eos_threshold"] is not None,
        eos_threshold=cfg["eos_threshold"] or 1.5,
        length_normalization=cfg["length_norm"], scorer=scorer,
    )
    if kv:
        def decode_step_fn(toks, cache, enc_states, enc_lens, step):
            out, new_cache, attn = net.apply(
                v, toks, enc_states, cache, step, method="decode_step"
            )
            logits = seq_lin.apply(v_seq, out)
            return (
                jax.nn.log_softmax(logits / cfg["temperature"], -1),
                new_cache, attn,
            )

        searcher = S2SKVBeamSearcher(
            decode_step_fn,
            lambda n, e, l: net.apply(
                v, e, max_steps + 1, method="init_decoder_cache_with_cross"
            ),
            **common,
        )
    else:
        def decode_fn(buf, enc_states, enc_lens):
            out, attn = net.apply(v, buf, enc_states, method="decode")
            logits = seq_lin.apply(v_seq, out)
            return jax.nn.log_softmax(logits / cfg["temperature"], -1), attn

        searcher = S2STransformerBeamSearcher(
            decode_fn=decode_fn, max_length=max_steps + 1, **common,
        )
    hyps, _, scores, _ = searcher(enc, jnp.ones((len(feats),)))
    return hyps, np.asarray(scores)


FUSED = dict(
    fusion=True, beam=5, temperature=1.15, lm_temperature=1.15,
    lm_weight=0.4, ctc_weight=0.3, eos_threshold=1.5, length_norm=True,
    min_ratio=0.0, max_ratio=1.0,
)
PLAIN = dict(
    fusion=False, beam=4, temperature=1.0, lm_temperature=1.0,
    lm_weight=0.0, ctc_weight=0.0, eos_threshold=None, length_norm=False,
    min_ratio=0.0, max_ratio=0.5,
)


@pytest.mark.parametrize("cfg_name", ["fused", "plain"])
def test_decode_matches_reference_token_for_token(
    trained_torch_models, poured_jax_models, cfg_name
):
    """The reference searcher and ours, on the same poured checkpoint and
    the same features, must emit identical token sequences — for the
    LM+CTC fused north-star config (eos threshold + length norm on) and
    for the bare attention searcher (threshold off, no normalization)."""
    cfg = {"fused": FUSED, "plain": PLAIN}[cfg_name]
    feats, _ = _synthetic_batch(np.random.default_rng(23), batch=BATCH)
    ref_hyps, ref_scores = _reference_hyps(trained_torch_models, feats, cfg)
    our_hyps, our_scores = _our_hyps(poured_jax_models, feats, cfg, kv=True)
    assert our_hyps == [list(h) for h in ref_hyps], (
        f"{cfg_name}: hypothesis mismatch\nref: {ref_hyps}\nours: {our_hyps}"
    )
    np.testing.assert_allclose(our_scores, ref_scores, rtol=1e-2, atol=1e-2)


def test_buffer_searcher_matches_reference_fused(
    trained_torch_models, poured_jax_models
):
    """The non-KV (full-recompute) searcher takes the same decisions."""
    feats, _ = _synthetic_batch(np.random.default_rng(29), batch=4)
    ref_hyps, _ = _reference_hyps(trained_torch_models, feats, FUSED)
    our_hyps, _ = _our_hyps(poured_jax_models, feats, FUSED, kv=False)
    assert our_hyps == [list(h) for h in ref_hyps]


# ---------------------------------------------------------------------------
# CRDNN-style RNN decoder + RNNLM fusion (ref S2SRNNBeamSearcher :1752)
# ---------------------------------------------------------------------------

ENC_D, EMB_D, HID, ATTN_D = 20, 24, 32, 16
T_ENC = 20


def _rnn_synthetic_batch(rng, batch):
    """Synthetic 'encoder states': each target token paints 4 frames."""
    targets = rng.integers(3, V, size=(batch, TGT_LEN))
    patterns = np.asarray(
        np.random.default_rng(13).standard_normal((V, ENC_D)), np.float32
    )
    enc = np.zeros((batch, T_ENC, ENC_D), np.float32)
    for b in range(batch):
        for j in range(TGT_LEN):
            enc[b, j * 4:(j + 1) * 4] = patterns[targets[b, j]]
    enc += 0.05 * rng.standard_normal(enc.shape).astype(np.float32)
    return enc, targets


@pytest.fixture(scope="module")
def trained_rnn_torch_models():
    _install_ref()
    torch.manual_seed(1234)
    from speechbrain.lobes.models.RNNLM import RNNLM as TorchRNNLM
    from speechbrain.nnet.RNN import AttentionalRNNDecoder as TorchDec
    from speechbrain.nnet.linear import Linear as TorchLinear

    temb = torch.nn.Embedding(V, EMB_D)
    tdec = TorchDec(
        rnn_type="gru", attn_type="location", hidden_size=HID,
        attn_dim=ATTN_D, num_layers=1, enc_dim=ENC_D, input_size=EMB_D,
        channels=4, kernel_size=3, dropout=0.0,
    )
    tseq = TorchLinear(input_size=HID, n_neurons=V)
    tlm = TorchRNNLM(
        output_neurons=V, embedding_dim=16, rnn_layers=1, rnn_neurons=32,
        dnn_blocks=1, dnn_neurons=32, dropout=0.0, return_hidden=True,
    )

    rng = np.random.default_rng(31)
    enc, targets = _rnn_synthetic_batch(rng, 16)
    enc_t = torch.from_numpy(enc)
    y = torch.from_numpy(targets).long()
    y_bos = torch.cat([torch.full((16, 1), BOS).long(), y], dim=1)
    y_eos = torch.cat([y, torch.full((16, 1), EOS).long()], dim=1)
    wl = torch.ones(16)
    opt = torch.optim.Adam(
        [*temb.parameters(), *tdec.parameters(), *tseq.parameters()], lr=3e-3
    )
    for _ in range(200):
        opt.zero_grad()
        out, _ = tdec(temb(y_bos), enc_t, wl)
        torch.nn.functional.cross_entropy(
            tseq(out).reshape(-1, V), y_eos.reshape(-1)
        ).backward()
        opt.step()
    opt_lm = torch.optim.Adam(tlm.parameters(), lr=3e-3)
    for _ in range(120):
        opt_lm.zero_grad()
        pred, _ = tlm(y_bos)
        torch.nn.functional.cross_entropy(
            pred.reshape(-1, V), y_eos.reshape(-1)
        ).backward()
        opt_lm.step()
    tdec.eval(), tlm.eval()
    return temb, tdec, tseq, tlm


@pytest.fixture(scope="module")
def poured_rnn_jax_models(trained_rnn_torch_models, tmp_path_factory):
    import jax
    import jax.numpy as jnp

    from speechbrain_tpu.lobes.models.RNNLM import RNNLM
    from speechbrain_tpu.nnet.embedding import Embedding
    from speechbrain_tpu.nnet.linear import Linear
    from speechbrain_tpu.nnet.RNN import AttentionalRNNDecoder
    from speechbrain_tpu.utils.torch_convert import (
        load_torch_state_dict_into_pytree,
        pour_reference_checkpoint,
    )

    temb, tdec, tseq, tlm = trained_rnn_torch_models
    tmp = tmp_path_factory.mktemp("rnn_ckpts")
    rng = jax.random.PRNGKey(0)

    emb = Embedding(num_embeddings=V, embedding_dim=EMB_D)
    v_emb = emb.init(rng, jnp.zeros((2, 3), jnp.int32))
    dec = AttentionalRNNDecoder(
        hidden_size=HID, attn_dim=ATTN_D, num_layers=1, rnn_type="gru",
        attn_type="location", channels=4, kernel_size=3, dropout=0.0,
    )
    enc0 = jnp.zeros((2, T_ENC, ENC_D))
    v_dec = dec.init(
        rng, jnp.zeros((2, 3, EMB_D)), enc0, jnp.ones((2,))
    )
    seq_lin = Linear(n_neurons=V)
    v_seq = seq_lin.init(rng, jnp.zeros((2, HID)))
    lm = RNNLM(
        output_neurons=V, embedding_dim=16, rnn_layers=1, rnn_neurons=32,
        dnn_blocks=1, dnn_neurons=32, dropout=0.0,
    )
    v_lm = lm.init(rng, jnp.zeros((2, 3), jnp.int32))

    p = tmp / "emb.ckpt"; torch.save(temb.state_dict(), p)
    v_emb = load_torch_state_dict_into_pytree(str(p), v_emb)
    p = tmp / "dec.ckpt"; torch.save(tdec.state_dict(), p)
    v_dec = pour_reference_checkpoint(dec, v_dec, str(p), strict=True)
    p = tmp / "seq.ckpt"; torch.save(tseq.state_dict(), p)
    v_seq = load_torch_state_dict_into_pytree(str(p), v_seq)
    p = tmp / "lm.ckpt"; torch.save(tlm.state_dict(), p)
    v_lm = pour_reference_checkpoint(lm, v_lm, str(p), strict=True)
    return emb, v_emb, dec, v_dec, seq_lin, v_seq, lm, v_lm


def test_rnn_decoder_pour_matches_torch(
    trained_rnn_torch_models, poured_rnn_jax_models
):
    """Teacher-forced decoder + LM outputs agree post-pour."""
    import jax.numpy as jnp

    temb, tdec, tseq, tlm = trained_rnn_torch_models
    emb, v_emb, dec, v_dec, seq_lin, v_seq, lm, v_lm = poured_rnn_jax_models
    rng = np.random.default_rng(7)
    enc, _ = _rnn_synthetic_batch(rng, 4)
    toks = np.asarray([[BOS, 5, 9], [BOS, 4, 3], [BOS, 7, 7], [BOS, 3, 9]])
    with torch.no_grad():
        tout, _ = tdec(
            temb(torch.from_numpy(toks).long()),
            torch.from_numpy(enc), torch.ones(4),
        )
        tlm_out, _ = tlm(torch.from_numpy(toks).long())
    jemb = emb.apply(v_emb, jnp.asarray(toks))
    jout, _ = dec.apply(
        v_dec, jemb, jnp.asarray(enc), jnp.ones((4,))
    )
    np.testing.assert_allclose(
        np.asarray(jout), tout.numpy(), rtol=2e-3, atol=2e-3
    )
    jlm, _ = lm.apply(v_lm, jnp.asarray(toks))
    np.testing.assert_allclose(
        np.asarray(jlm), tlm_out.numpy(), rtol=2e-3, atol=2e-3
    )


def test_rnn_decode_matches_reference_token_for_token(
    trained_rnn_torch_models, poured_rnn_jax_models
):
    """Reference S2SRNNBeamSearcher + RNNLMScorer vs ours: identical
    hypotheses on the same poured checkpoint (location-aware attention,
    eos threshold + length norm on)."""
    import jax
    import jax.numpy as jnp

    from speechbrain.decoders.scorer import (
        RNNLMScorer as RefRNNLMScorer,
        ScorerBuilder as RefScorerBuilder,
    )
    from speechbrain.decoders.seq2seq import (
        S2SRNNBeamSearcher as RefRNNSearcher,
    )

    from speechbrain_tpu.decoders.scorer import RNNLMScorer, ScorerBuilder
    from speechbrain_tpu.decoders.seq2seq import S2SRNNBeamSearcher

    temb, tdec, tseq, tlm = trained_rnn_torch_models
    emb, v_emb, dec, v_dec, seq_lin, v_seq, lm, v_lm = poured_rnn_jax_models

    enc, _ = _rnn_synthetic_batch(np.random.default_rng(41), BATCH)
    beam_cfg = dict(
        bos_index=BOS, eos_index=EOS, min_decode_ratio=0.0,
        max_decode_ratio=0.5, beam_size=5, using_eos_threshold=True,
        eos_threshold=1.5, length_normalization=True,
    )

    ref_scorer = RefScorerBuilder(
        full_scorers=[RefRNNLMScorer(language_model=tlm, temperature=1.0)],
        weights={"rnnlm": 0.4},
    )
    ref_searcher = RefRNNSearcher(
        embedding=temb, decoder=tdec, linear=tseq, temperature=1.0,
        scorer=ref_scorer, **beam_cfg,
    )
    with torch.no_grad():
        ref_hyps, _, ref_scores, _ = ref_searcher(
            torch.from_numpy(enc), torch.ones(BATCH)
        )

    # ours: state pytrees are batch-leading for the beam permute; the
    # LM's (layers, batch, hid) LSTM state is transposed at the boundary
    def lm_fn(tokens, state):
        hx = jax.tree_util.tree_map(
            lambda t: jnp.moveaxis(t, 0, 1), state
        )
        logits, new_state = lm.apply(v_lm, tokens, hx=hx)
        return logits, jax.tree_util.tree_map(
            lambda t: jnp.moveaxis(t, 0, 1), new_state
        )

    def lm_init(n):
        z = jnp.zeros((n, 1, 32))
        return (z, z)  # (batch, layers, hid) h/c pair

    scorer = ScorerBuilder(
        weights={"rnnlm": 0.4},
        full_scorers={"rnnlm": RNNLMScorer(lm_fn, lm_init, temperature=1.0)},
    )

    def step_fn(inp_tokens, memory, enc_states, enc_lens):
        e = emb.apply(v_emb, inp_tokens[:, None])[:, 0]
        out, new_state, attn = dec.apply(
            v_dec, e, memory, enc_states, enc_lens, method="forward_step"
        )
        logits = seq_lin.apply(v_seq, out)
        return jax.nn.log_softmax(logits, axis=-1), new_state, attn

    def init_fn(batch_size, enc_states, enc_lens):
        state = dec.init_state(batch_size, enc_states.shape[1])
        T = enc_states.shape[1]
        mask0 = (
            jnp.arange(T)[None, :] < jnp.round(enc_lens * T)[:, None]
        ).astype(jnp.float32)
        state["prev_attn"] = mask0 / jnp.maximum(
            mask0.sum(-1, keepdims=True), 1.0
        )
        return state

    searcher = S2SRNNBeamSearcher(
        step_fn=step_fn, init_fn=init_fn, scorer=scorer, **beam_cfg,
    )
    our_hyps, _, our_scores, _ = searcher(
        jnp.asarray(enc), jnp.ones((BATCH,))
    )
    assert our_hyps == [list(h) for h in ref_hyps], (
        f"RNN hypothesis mismatch\nref: {ref_hyps}\nours: {our_hyps}"
    )
    np.testing.assert_allclose(
        our_scores, np.asarray(ref_scores), rtol=1e-2, atol=1e-2
    )


def test_rnn_decode_with_coverage_matches_reference(
    trained_rnn_torch_models, poured_rnn_jax_models
):
    """Coverage-penalty fusion: the reference CoverageScorer and ours
    take identical decisions inside the beam (the looping-penalty
    formula sum(max(cov, thr)) - T*thr divided by the step count)."""
    import jax
    import jax.numpy as jnp

    from speechbrain.decoders.scorer import (
        CoverageScorer as RefCoverageScorer,
        ScorerBuilder as RefScorerBuilder,
    )
    from speechbrain.decoders.seq2seq import (
        S2SRNNBeamSearcher as RefRNNSearcher,
    )

    from speechbrain_tpu.decoders.scorer import CoverageScorer, ScorerBuilder
    from speechbrain_tpu.decoders.seq2seq import S2SRNNBeamSearcher

    temb, tdec, tseq, tlm = trained_rnn_torch_models
    emb, v_emb, dec, v_dec, seq_lin, v_seq, lm, v_lm = poured_rnn_jax_models

    enc, _ = _rnn_synthetic_batch(np.random.default_rng(47), 4)
    beam_cfg = dict(
        bos_index=BOS, eos_index=EOS, min_decode_ratio=0.0,
        max_decode_ratio=0.5, beam_size=4, using_eos_threshold=True,
        eos_threshold=1.5, length_normalization=True,
    )
    ref_searcher = RefRNNSearcher(
        embedding=temb, decoder=tdec, linear=tseq, temperature=1.0,
        scorer=RefScorerBuilder(
            full_scorers=[RefCoverageScorer(vocab_size=V)],
            weights={"coverage": 1.5},
        ),
        **beam_cfg,
    )
    with torch.no_grad():
        ref_hyps, _, _, _ = ref_searcher(
            torch.from_numpy(enc), torch.ones(4)
        )

    def step_fn(inp_tokens, memory, enc_states, enc_lens):
        e = emb.apply(v_emb, inp_tokens[:, None])[:, 0]
        out, new_state, attn = dec.apply(
            v_dec, e, memory, enc_states, enc_lens, method="forward_step"
        )
        logits = seq_lin.apply(v_seq, out)
        return jax.nn.log_softmax(logits, axis=-1), new_state, attn

    def init_fn(batch_size, enc_states, enc_lens):
        state = dec.init_state(batch_size, enc_states.shape[1])
        T = enc_states.shape[1]
        mask0 = (
            jnp.arange(T)[None, :] < jnp.round(enc_lens * T)[:, None]
        ).astype(jnp.float32)
        state["prev_attn"] = mask0 / jnp.maximum(
            mask0.sum(-1, keepdims=True), 1.0
        )
        return state

    searcher = S2SRNNBeamSearcher(
        step_fn=step_fn, init_fn=init_fn,
        scorer=ScorerBuilder(
            full_scorers={"coverage": CoverageScorer(vocab_size=V)},
            weights={"coverage": 1.5},
        ),
        **beam_cfg,
    )
    our_hyps, _, _, _ = searcher(jnp.asarray(enc), jnp.ones((4,)))
    assert our_hyps == [list(h) for h in ref_hyps], (
        f"coverage mismatch\nref: {ref_hyps}\nours: {our_hyps}"
    )
