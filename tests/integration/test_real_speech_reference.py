"""Real-speech regression tier: the reference's SHIPPED spoken-audio
samples (read-only at /root/reference/tests/samples) decoded through BOTH
stacks.

Every other parity test in the repo synthesizes its inputs; this file is
the end-to-end evidence on actual recorded speech, covering three
inference interfaces:

* audio IO — our ``read_audio`` against a stdlib decode of the same file;
* ``SepformerSeparation`` — the reference's three-module
  encoder/masknet/decoder composition (ref inference/separation.py:46-83)
  poured and compared source-for-source on a real two-speaker mixture;
* ``EncoderClassifier`` (ECAPA speaker embeddings) — embeddings and
  speaker-similarity scores from real utterances of two speakers;
* seq2seq ASR — a briefly-trained tiny conformer encoder-decoder decodes
  real utterances token-for-token identically through the reference
  searcher (torch) and ours (wav -> fbank -> encode -> joint beam decode,
  each stack using its own feature frontend).
"""

import os
import sys
import types
import wave

import numpy as np
import pytest

torch = pytest.importorskip("torch")

SAMPLES = "/root/reference/tests/samples"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(SAMPLES), reason="reference samples not available"
)


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
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")


def _load_wav(path):
    """Independent-of-the-repo wav decode -> float32 in [-1, 1].
    Handles 16-bit PCM (stdlib) and IEEE-float wavs (manual RIFF parse —
    the reference's separation samples are float64)."""
    try:
        with wave.open(path, "rb") as f:
            assert f.getsampwidth() == 2
            data = np.frombuffer(f.readframes(f.getnframes()), np.int16)
            if f.getnchannels() > 1:
                data = data.reshape(-1, f.getnchannels())[:, 0]
        return (data / 32768.0).astype(np.float32)
    except wave.Error:
        raw = open(path, "rb").read()
        import struct

        assert raw[:4] == b"RIFF" and raw[8:12] == b"WAVE"
        pos, fmt, data = 12, None, None
        while pos + 8 <= len(raw):
            cid = raw[pos:pos + 4]
            size = struct.unpack("<I", raw[pos + 4:pos + 8])[0]
            body = raw[pos + 8:pos + 8 + size]
            if cid == b"fmt ":
                fmt = struct.unpack("<HHIIHH", body[:16])
            elif cid == b"data":
                data = body
            pos += 8 + size + (size % 2)
        audio_fmt, n_ch, _, _, _, bits = fmt
        assert audio_fmt == 3, f"unsupported wav format {audio_fmt}"
        dt = np.float64 if bits == 64 else np.float32
        arr = np.frombuffer(data, dt)
        if n_ch > 1:
            arr = arr.reshape(-1, n_ch)[:, 0]
        return arr.astype(np.float32)


def test_read_audio_matches_stdlib():
    from speechbrain_tpu.dataio.dataio import read_audio

    path = os.path.join(SAMPLES, "ASR", "spk1_snt1.wav")
    ours = np.asarray(read_audio(path))
    ref = _load_wav(path)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_separation_three_module_pour_on_real_mixture(tmp_path):
    """Tiny SepFormer, fixed weights: the reference three-module
    composition and our SepformerSeparation interface must emit the same
    separated sources for a real mixture."""
    _install_ref()
    import torch.nn.functional as F
    from speechbrain.lobes.models.dual_path import (
        Decoder as RefDecoder,
        Dual_Path_Model as RefDPM,
        Encoder as RefEncoder,
        SBTransformerBlock as RefBlock,
    )

    import jax.numpy as jnp

    from speechbrain_tpu.inference.separation import SepformerSeparation
    from speechbrain_tpu.lobes.models.dual_path import (
        Decoder, DualPathModel, Encoder, SBTransformerBlock,
    )
    from speechbrain_tpu.utils.torch_convert import (
        pour_reference_checkpoint,
    )

    N, KS, SPKS = 16, 16, 2
    torch.manual_seed(11)
    tenc = RefEncoder(kernel_size=KS, out_channels=N)
    tdec = RefDecoder(
        in_channels=N, out_channels=1, kernel_size=KS, stride=KS // 2,
        bias=False,
    )
    blk = lambda: RefBlock(num_layers=1, d_model=N, nhead=4, d_ffn=32,
                           use_positional_encoding=True,
                           norm_before=True)
    tmask = RefDPM(
        in_channels=N, out_channels=N, intra_model=blk(),
        inter_model=blk(), num_layers=1, norm="ln", K=10,
        num_spks=SPKS, skip_around_intra=True, linear_layer_after_inter_intra=False,
    )
    for m in (tenc, tdec, tmask):
        m.eval()

    mix_np = _load_wav(
        os.path.join(SAMPLES, "separation", "mixture_0.wav")
    )[:8000]
    mix_t = torch.from_numpy(mix_np)[None]
    with torch.no_grad():
        # the reference interface composition, line for line
        # (ref inference/separation.py:46-83)
        mix_w = tenc(mix_t)
        est_mask = tmask(mix_w)
        stacked = torch.stack([mix_w] * SPKS)
        sep_h = stacked * est_mask
        ref_src = torch.cat(
            [tdec(sep_h[i]).unsqueeze(-1) for i in range(SPKS)], dim=-1
        )
        T0, Te = mix_t.size(1), ref_src.size(1)
        if T0 > Te:
            ref_src = F.pad(ref_src, (0, 0, 0, T0 - Te))
        else:
            ref_src = ref_src[:, :T0]

    # pour into our modules
    import jax

    enc = Encoder(kernel_size=KS, out_channels=N)
    dec = Decoder(in_channels=N, out_channels=1, kernel_size=KS)
    jblk = lambda: SBTransformerBlock(
        num_layers=1, d_model=N, nhead=4, d_ffn=32,
        use_positional_encoding=True, norm_before=True,
    )
    mask = DualPathModel(
        in_channels=N, out_channels=N, intra_model=jblk(),
        inter_model=jblk(), num_layers=1, norm="ln", K=10,
        num_spks=SPKS, skip_around_intra=True,
        linear_layer_after_inter_intra=False,
    )
    rng = jax.random.PRNGKey(0)
    mix_j = jnp.asarray(mix_np)[None]
    v_enc = enc.init(rng, mix_j)
    w0 = enc.apply(v_enc, mix_j)
    v_mask = mask.init(rng, w0)
    v_dec = dec.init(rng, w0)
    for tmod, jmod, var, name in (
        (tenc, enc, v_enc, "enc"),
        (tmask, mask, v_mask, "mask"),
        (tdec, dec, v_dec, "dec"),
    ):
        p = tmp_path / f"{name}.ckpt"
        torch.save(tmod.state_dict(), p)
        var.update(pour_reference_checkpoint(jmod, var, str(p)))
        if name == "enc":
            v_enc = var
        elif name == "mask":
            v_mask = var
        else:
            v_dec = var

    sep = SepformerSeparation(
        modules={"encoder": enc, "masknet": mask, "decoder": dec},
        params={
            "encoder": v_enc["params"],
            "masknet": v_mask["params"],
            "decoder": v_dec["params"],
        },
        hparams={"num_spks": SPKS},
    )
    ours = np.asarray(sep.separate_batch(mix_j))
    assert ours.shape == tuple(ref_src.shape)
    np.testing.assert_allclose(
        ours, ref_src.numpy(), rtol=2e-3, atol=2e-3
    )


def test_speaker_embedding_parity_on_real_speech(tmp_path):
    """ECAPA embeddings of real utterances from two speakers: poured
    model must reproduce the reference embeddings and the same-vs-
    different speaker cosine ordering."""
    _install_ref()
    from speechbrain.lobes.features import Fbank as RefFbank
    from speechbrain.lobes.models.ECAPA_TDNN import ECAPA_TDNN as RefECAPA

    import jax
    import jax.numpy as jnp

    from speechbrain_tpu.inference.classifiers import EncoderClassifier
    from speechbrain_tpu.lobes.features import Fbank
    from speechbrain_tpu.lobes.models.ECAPA_TDNN import ECAPA_TDNN
    from speechbrain_tpu.nnet.linear import Linear
    from speechbrain_tpu.utils.torch_convert import (
        pour_reference_checkpoint,
    )

    torch.manual_seed(5)
    tmodel = RefECAPA(
        input_size=40, lin_neurons=32, channels=[32, 32, 32, 32, 64],
        kernel_sizes=[5, 3, 3, 3, 1], dilations=[1, 2, 3, 4, 1],
        attention_channels=16,
    )
    tmodel.eval()
    tfb = RefFbank(n_mels=40)

    wavs = [
        _load_wav(os.path.join(SAMPLES, "ASR", f))[:16000]
        for f in ("spk1_snt1.wav", "spk1_snt2.wav", "spk2_snt1.wav")
    ]
    L = min(len(w) for w in wavs)
    batch = np.stack([w[:L] for w in wavs])
    with torch.no_grad():
        tfeats = tfb(torch.from_numpy(batch))
        temb = tmodel(tfeats).squeeze(1).numpy()

    model = ECAPA_TDNN(
        lin_neurons=32, channels=(32, 32, 32, 32, 64),
        kernel_sizes=(5, 3, 3, 3, 1), dilations=(1, 2, 3, 4, 1),
        attention_channels=16,
    )
    fb = Fbank(n_mels=40)
    rng = jax.random.PRNGKey(0)
    feats = fb(jnp.asarray(batch))
    v = model.init(rng, feats)
    p = tmp_path / "ecapa.ckpt"
    torch.save(tmodel.state_dict(), p)
    v = pour_reference_checkpoint(model, v, str(p))

    clf = EncoderClassifier(
        modules={"embedding_model": model, "classifier": Linear(n_neurons=4)},
        params={"embedding_model": v["params"], "classifier": {}},
        model_state={"batch_stats": {"embedding_model": v["batch_stats"]}},
        hparams={"compute_features": fb},
    )
    ours = np.asarray(clf.encode_batch(jnp.asarray(batch)))
    if ours.ndim == 3:
        ours = ours[:, 0]
    np.testing.assert_allclose(ours, temb, rtol=5e-2, atol=5e-2)

    def cos(a, b):
        return float(
            np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))
        )

    # the similarity ORDERING (same speaker > different speaker) must
    # agree between the stacks — knife-edge-free because we compare
    # orderings, not raw scores
    same_ref, diff_ref = cos(temb[0], temb[1]), cos(temb[0], temb[2])
    same_ours, diff_ours = cos(ours[0], ours[1]), cos(ours[0], ours[2])
    assert (same_ref > diff_ref) == (same_ours > diff_ours)
    np.testing.assert_allclose(same_ours, same_ref, atol=5e-2)
    np.testing.assert_allclose(diff_ours, diff_ref, atol=5e-2)


def test_asr_decode_tokens_on_real_speech(tmp_path):
    """A tiny conformer encoder-decoder, briefly trained (torch) to map
    four real utterances to four distinct token strings, must decode the
    REAL audio to token-for-token identical hypotheses through the
    reference beam searcher and ours — each stack computing its own
    fbank front-end from the raw waveform."""
    _install_ref()
    from speechbrain.decoders.seq2seq import (
        S2STransformerBeamSearcher as RefSearcher,
    )
    from speechbrain.lobes.features import Fbank as RefFbank
    from speechbrain.lobes.models.transformer.TransformerASR import (
        TransformerASR as RefASR,
    )
    from speechbrain.nnet.linear import Linear as RefLinear

    import jax
    import jax.numpy as jnp

    from speechbrain_tpu.decoders.seq2seq import S2SKVBeamSearcher
    from speechbrain_tpu.lobes.features import Fbank
    from speechbrain_tpu.lobes.models.transformer.TransformerASR import (
        TransformerASR,
    )
    from speechbrain_tpu.nnet.linear import Linear
    from speechbrain_tpu.utils.torch_convert import (
        load_torch_state_dict_into_pytree,
        pour_reference_checkpoint,
    )

    V, D, BOS, EOS = 16, 32, 1, 2
    files = ["spk1_snt1.wav", "spk1_snt2.wav", "spk2_snt1.wav",
             "spk2_snt2.wav"]
    wavs = np.stack([
        _load_wav(os.path.join(SAMPLES, "ASR", f))[:16000] for f in files
    ])
    rng = np.random.default_rng(0)
    # distinct tokens per utterance (no repeats: repeated-token strings
    # are harder for the toy attention task and need not converge)
    targets = np.stack([
        rng.choice(np.arange(3, V), size=4, replace=False)
        for _ in range(4)
    ])

    torch.manual_seed(1234)
    tfb = RefFbank(n_mels=40)
    tnet = RefASR(
        tgt_vocab=V, input_size=40, d_model=D, nhead=4,
        num_encoder_layers=2, num_decoder_layers=1, d_ffn=64,
        encoder_module="transformer", attention_type="regularMHA",
        normalize_before=True, dropout=0.0, causal=False,
    )
    tseq = RefLinear(input_size=D, n_neurons=V)
    with torch.no_grad():
        tfeats = tfb(torch.from_numpy(wavs))
    y = torch.from_numpy(targets).long()
    y_bos = torch.cat([torch.full((4, 1), BOS).long(), y], dim=1)
    y_eos = torch.cat([y, torch.full((4, 1), EOS).long()], dim=1)
    opt = torch.optim.Adam(
        list(tnet.parameters()) + list(tseq.parameters()), lr=2e-3
    )
    for _ in range(250):
        opt.zero_grad()
        enc, dec = tnet(tfeats, y_bos, torch.ones(4))
        loss = torch.nn.functional.cross_entropy(
            tseq(dec).reshape(-1, V), y_eos.reshape(-1)
        )
        loss.backward()
        opt.step()
    tnet.eval()
    assert float(loss) < 0.1, f"toy task did not converge: {loss}"

    searcher = RefSearcher(
        modules=[tnet, tseq], bos_index=BOS, eos_index=EOS,
        min_decode_ratio=0.0, max_decode_ratio=0.12, beam_size=5,
        using_eos_threshold=False, length_normalization=True,
    )
    with torch.no_grad():
        enc = tnet.encode(tfeats, torch.ones(4))
        ref_hyps, _, _, _ = searcher(enc, torch.ones(4))
    ref_tokens = [list(map(int, h)) for h in ref_hyps]
    assert ref_tokens == [list(map(int, t)) for t in targets], (
        "reference decode should reproduce the trained targets"
    )

    # ours: same waveforms through OUR fbank + poured model
    net = TransformerASR(
        tgt_vocab=V, input_size=40, d_model=D, nhead=4,
        num_encoder_layers=2, num_decoder_layers=1, d_ffn=64,
        encoder_module="transformer", attention_type="regularMHA",
        normalize_before=True, dropout=0.0,
    )
    seq_lin = Linear(n_neurons=V)
    fb = Fbank(n_mels=40)
    jrng = jax.random.PRNGKey(0)
    jfeats = fb(jnp.asarray(wavs))
    tok0 = jnp.zeros((4, 3), jnp.int32)
    v = net.init(jrng, jfeats, tok0)
    enc0 = net.apply(v, jfeats, method="encode")
    d0, _ = net.apply(v, tok0, enc0, method="decode")
    v_seq = seq_lin.init(jrng, d0)
    p = tmp_path / "asr.ckpt"
    torch.save(tnet.state_dict(), p)
    v = pour_reference_checkpoint(net, v, str(p), strict=True)
    p = tmp_path / "seq.ckpt"
    torch.save(tseq.state_dict(), p)
    v_seq = load_torch_state_dict_into_pytree(str(p), v_seq)

    def decode_step_fn(toks, cache, enc_states, enc_lens, step, anc=None):
        out, nc, attn = net.apply(
            v, toks, enc_states, cache, step, anc=anc, method="decode_step"
        )
        return (
            jax.nn.log_softmax(seq_lin.apply(v_seq, out), -1), nc, attn
        )

    jenc = net.apply(v, jfeats, method="encode")
    max_steps = max(1, int(jenc.shape[1] * 0.12))
    ours = S2SKVBeamSearcher(
        decode_step_fn,
        lambda n, e, l: net.apply(
            v, e, max_steps + 1, n, method="init_decoder_cache_with_cross"
        ),
        shared_cross_kv=True, ancestry_kv=True,
        bos_index=BOS, eos_index=EOS, min_decode_ratio=0.0,
        max_decode_ratio=0.12, beam_size=5, using_eos_threshold=False,
        length_normalization=True,
    )
    our_hyps, _, _, _ = ours(jenc, jnp.ones(4))
    assert our_hyps == ref_tokens, (our_hyps, ref_tokens)
