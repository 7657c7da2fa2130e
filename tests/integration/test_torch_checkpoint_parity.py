"""Checkpoint-pouring proof: build THE REFERENCE's ECAPA-TDNN in torch,
save its state_dict, pour it into our flax ECAPA_TDNN via the exact
key-map converter, and assert the speaker embeddings match the torch
forward within 1e-4 (the BASELINE.md north star is metric parity when
loading the same checkpoints — this test fails if any layer mapping or
layout transpose is wrong).

Reference modules: /root/reference/speechbrain/lobes/models/ECAPA_TDNN.py
(ECAPA_TDNN :420, Classifier :562); loading path mirrors
utils/parameter_transfer.py:188-299 transfer hooks.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")


@pytest.fixture(autouse=True)
def _seed_torch():
    """torch param init + randomized BN stats draw from torch's GLOBAL
    rng; seed it for run-to-run determinism. Tolerances are 5e-4:
    accumulated fp32 reduction-order differences across stacked layers
    can marginally exceed 1e-4, while real mapping/layout bugs produce
    O(1e-2)+ divergence."""
    torch.manual_seed(3407)

import os

REF = os.environ.get("SB_REFERENCE_PATH", "/root/reference")
if not os.path.isdir(os.path.join(REF, "speechbrain")):
    pytest.skip(
        "reference speechbrain checkout not found (set SB_REFERENCE_PATH)",
        allow_module_level=True,
    )


def _import_reference_ecapa():
    """Import the reference's ECAPA with its unused IO deps stubbed."""
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
    from speechbrain.lobes.models.ECAPA_TDNN import (  # noqa: E402
        ECAPA_TDNN as TorchECAPA,
        Classifier as TorchClassifier,
    )
    return TorchECAPA, TorchClassifier


CFG = dict(
    lin_neurons=64,
    channels=(32, 32, 32, 32, 96),
    kernel_sizes=(5, 3, 3, 3, 1),
    dilations=(1, 2, 3, 4, 1),
    attention_channels=16,
    res2net_scale=4,
    se_channels=16,
)


def test_ecapa_torch_checkpoint_pours_to_output_parity(tmp_path):
    import jax
    import jax.numpy as jnp

    from speechbrain_tpu.lobes.models.ECAPA_TDNN import ECAPA_TDNN
    from speechbrain_tpu.utils.torch_convert import (
        ecapa_key_map,
        load_torch_state_dict,
        pour_torch_keys,
    )

    TorchECAPA, _ = _import_reference_ecapa()
    tm = TorchECAPA(input_size=40, **{
        k: list(v) if isinstance(v, tuple) else v for k, v in CFG.items()
    })
    tm.eval()
    # randomize BN running stats so a stats-mapping bug can't hide
    with torch.no_grad():
        for mod in tm.modules():
            if hasattr(mod, "running_mean") and mod.running_mean is not None:
                mod.running_mean.uniform_(-0.5, 0.5)
                mod.running_var.uniform_(0.5, 1.5)
    ckpt = tmp_path / "embedding_model.ckpt"
    torch.save(tm.state_dict(), str(ckpt))

    x = np.random.default_rng(0).standard_normal((3, 120, 40)).astype(np.float32)
    with torch.no_grad():
        ref_out = tm(torch.from_numpy(x)).numpy()  # (B, 1, lin_neurons)

    jm = ECAPA_TDNN(**CFG)
    variables = jm.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    variables = jax.tree_util.tree_map(np.asarray, dict(variables))
    state = load_torch_state_dict(str(ckpt))
    poured = pour_torch_keys(state, variables, ecapa_key_map, strict=True)
    poured = jax.tree_util.tree_map(jnp.asarray, poured)
    out = np.asarray(jm.apply(poured, jnp.asarray(x), train=False))

    assert out.shape == ref_out.shape
    np.testing.assert_allclose(out, ref_out, atol=5e-4, rtol=5e-4)


def test_ecapa_pour_is_strict_about_missing_targets(tmp_path):
    """A wrong mapping must fail loudly, not silently keep random init."""
    import jax
    import jax.numpy as jnp

    from speechbrain_tpu.lobes.models.ECAPA_TDNN import ECAPA_TDNN
    from speechbrain_tpu.utils.torch_convert import pour_torch_keys

    jm = ECAPA_TDNN(**CFG)
    x = jnp.ones((1, 50, 40))
    variables = jax.tree_util.tree_map(
        np.asarray, dict(jm.init(jax.random.PRNGKey(0), x, train=False))
    )
    state = {"nonexistent.layer.weight": np.zeros((4, 4))}
    with pytest.raises(KeyError):
        pour_torch_keys(
            state, variables,
            lambda k: "params/not/a/real/leaf", strict=True,
        )


def test_old_key_remapping_applied_on_load(tmp_path):
    """Old-typo checkpoint keys are renamed on load (the reference's
    KEYS_MAPPING compatibility hooks, utils/checkpoints.py:84-130)."""
    from speechbrain_tpu.utils.torch_convert import (
        load_torch_state_dict,
        map_old_state_dict_weights,
    )

    sd = {"layer.mutihead_attn.in_proj.weight": torch.zeros(4, 4)}
    ckpt = tmp_path / "old.ckpt"
    torch.save(sd, str(ckpt))
    state = load_torch_state_dict(str(ckpt))
    assert "layer.multihead_attn.in_proj.weight" in state
    assert "layer.mutihead_attn.in_proj.weight" not in state

    remapped = map_old_state_dict_weights(
        {"a.old_name.w": 1}, {".old_name": ".new_name"}
    )
    assert remapped == {"a.new_name.w": 1}


def test_crdnn_torch_checkpoint_pours_to_output_parity(tmp_path):
    """CRDNN (the asr-crdnn-rnnlm-librispeech encoder architecture,
    LSTM variant): reference torch forward == poured flax forward at
    1e-4 — covers 2-D convs with (F, C) LayerNorm, bidirectional LSTM
    with merged biases, and the BatchNorm DNN blocks."""
    import jax
    import jax.numpy as jnp

    from speechbrain_tpu.lobes.models.CRDNN import CRDNN
    from speechbrain_tpu.utils.torch_convert import (
        crdnn_key_map,
        load_torch_state_dict,
        merge_lstm_biases,
        pour_torch_keys,
    )

    _import_reference_ecapa()  # ensures stubs + sys.path
    from speechbrain.lobes.models.CRDNN import CRDNN as TorchCRDNN
    import speechbrain.nnet.RNN as SBRNN

    tm = TorchCRDNN(
        input_size=40, cnn_blocks=2, cnn_channels=(8, 8),
        inter_layer_pooling_size=(2, 2), rnn_class=SBRNN.LSTM,
        rnn_layers=2, rnn_neurons=16, rnn_bidirectional=True,
        dnn_blocks=1, dnn_neurons=16, dropout=0.15,
    )
    tm.eval()
    with torch.no_grad():
        for mod in tm.modules():
            if hasattr(mod, "running_mean") and mod.running_mean is not None:
                mod.running_mean.uniform_(-0.5, 0.5)
                mod.running_var.uniform_(0.5, 1.5)
    ckpt = tmp_path / "crdnn.ckpt"
    torch.save(tm.state_dict(), str(ckpt))

    x = np.random.default_rng(0).standard_normal((2, 50, 40)).astype(
        np.float32
    )
    with torch.no_grad():
        ref_out = tm(torch.from_numpy(x)).numpy()

    jm = CRDNN(
        cnn_blocks=2, cnn_channels=(8, 8), inter_layer_pooling_size=(2, 2),
        rnn_class="lstm", rnn_layers=2, rnn_neurons=16,
        rnn_bidirectional=True, dnn_blocks=1, dnn_neurons=16, dropout=0.15,
    )
    variables = jax.tree_util.tree_map(
        np.asarray,
        dict(jm.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)),
    )
    state = merge_lstm_biases(load_torch_state_dict(str(ckpt)))
    poured = pour_torch_keys(state, variables, crdnn_key_map, strict=True)
    poured = jax.tree_util.tree_map(jnp.asarray, poured)
    out = np.asarray(jm.apply(poured, jnp.asarray(x), train=False))

    assert out.shape == ref_out.shape
    np.testing.assert_allclose(out, ref_out, atol=5e-4, rtol=5e-4)


def test_conformer_encoder_torch_checkpoint_pours_to_output_parity(tmp_path):
    """Build the reference's torch ConformerEncoder (RelPosMHAXL +
    conv module + half-FFNs + final eps-1e-6 norm, ref Conformer.py:606),
    pour its state_dict through conformer_encoder_key_map, and assert
    encoder outputs match within 1e-4 — the flagship
    asr-conformer-transformerlm checkpoint path."""
    for name, attrs in {
        "hyperpyyaml": ["resolve_references", "load_hyperpyyaml",
                        "dump_hyperpyyaml"],
        "torchaudio": ["load", "save", "info"],
    }.items():
        if name not in sys.modules:
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
    from speechbrain.lobes.models.transformer.Conformer import (
        ConformerEncoder as TorchConformerEncoder,
    )
    from speechbrain.nnet.attention import RelPosEncXL as TorchRelPosEncXL

    # head_dim != nhead is load-bearing: pos_bias_u/v pours are a
    # RESHAPE of torch's (head_dim, nhead) storage, and square head
    # configs cannot distinguish reshape from transpose
    D, H, FFN, K, L = 32, 2, 32, 7, 2
    tenc = TorchConformerEncoder(
        num_layers=L, d_model=D, d_ffn=FFN, nhead=H, kernel_size=K,
        dropout=0.0,
    ).eval()
    tpe_mod = TorchRelPosEncXL(D)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 12, D)).astype(np.float32)
    with torch.no_grad():
        tx = torch.from_numpy(x)
        tpe = tpe_mod(tx)
        tout = tenc(tx, pos_embs=tpe)[0].numpy()

    ckpt = tmp_path / "conformer.ckpt"
    torch.save(tenc.state_dict(), ckpt)

    import jax
    import jax.numpy as jnp

    from speechbrain_tpu.lobes.models.transformer.Conformer import (
        ConformerEncoder,
    )
    from speechbrain_tpu.nnet.attention import RelPosEncXL
    from speechbrain_tpu.utils.torch_convert import (
        conformer_encoder_key_map,
        load_torch_state_dict,
        pour_torch_keys,
        split_conformer_inproj,
    )

    enc = ConformerEncoder(
        num_layers=L, d_model=D, d_ffn=FFN, nhead=H, kernel_size=K,
        dropout=0.0,
    )
    jx = jnp.asarray(x)
    pe = RelPosEncXL(emb_dim=D)(jx)
    variables = enc.init(jax.random.PRNGKey(0), jx, pos_embs=pe)
    state = split_conformer_inproj(load_torch_state_dict(str(ckpt)), nhead=H)
    poured = pour_torch_keys(
        state, variables, conformer_encoder_key_map, strict=True
    )
    # positional encodings must agree before the encoder comparison means
    # anything
    np.testing.assert_allclose(
        np.asarray(pe), tpe.numpy(), rtol=1e-5, atol=1e-5
    )
    out, _ = enc.apply(poured, jx, pos_embs=pe)
    np.testing.assert_allclose(np.asarray(out), tout, rtol=5e-4, atol=5e-4)


def test_transformer_encoder_torch_checkpoint_pours_to_output_parity(
    tmp_path,
):
    """Vanilla TransformerEncoder pour (torch.nn.MultiheadAttention
    inside, ref Transformer.py:306) — the TransformerLM / decoder path."""
    _import_reference_ecapa()  # installs the hyperpyyaml/torchaudio stubs
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from speechbrain.lobes.models.transformer.Transformer import (
        TransformerEncoder as TorchTransformerEncoder,
    )

    D, H, FFN, L = 16, 4, 32, 2
    tenc = TorchTransformerEncoder(
        num_layers=L, d_model=D, d_ffn=FFN, nhead=H, dropout=0.0
    ).eval()
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 10, D)).astype(np.float32)
    with torch.no_grad():
        tout = tenc(torch.from_numpy(x))[0].numpy()
    ckpt = tmp_path / "tenc.ckpt"
    torch.save(tenc.state_dict(), ckpt)

    import jax
    import jax.numpy as jnp

    from speechbrain_tpu.lobes.models.transformer.Transformer import (
        TransformerEncoder,
    )
    from speechbrain_tpu.utils.torch_convert import (
        load_torch_state_dict,
        pour_torch_keys,
        split_torch_mha_inproj,
        transformer_encoder_key_map,
    )

    enc = TransformerEncoder(
        num_layers=L, d_model=D, d_ffn=FFN, nhead=H, dropout=0.0
    )
    jx = jnp.asarray(x)
    variables = enc.init(jax.random.PRNGKey(0), jx)
    state = split_torch_mha_inproj(load_torch_state_dict(str(ckpt)))
    poured = pour_torch_keys(
        state, variables, transformer_encoder_key_map, strict=True
    )
    out, _ = enc.apply(poured, jx)
    np.testing.assert_allclose(np.asarray(out), tout, rtol=5e-4, atol=5e-4)


def test_sepformer_masknet_torch_checkpoint_pours_to_output_parity(
    tmp_path,
):
    """Dual_Path_Model (SepFormer masknet, ref dual_path.py:934) pour —
    the sepformer-wsj02mix checkpoint path. Per-stage transformers have
    independent weights (the reference deep-copies per stage)."""
    _import_reference_ecapa()  # installs the import stubs
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from speechbrain.lobes.models.dual_path import (
        Dual_Path_Model as TorchDualPath,
        SBTransformerBlock as TorchSBBlock,
    )

    D, H, FFN, K = 16, 4, 32, 10
    tintra = TorchSBBlock(num_layers=1, d_model=D, nhead=H, d_ffn=FFN,
                          use_positional_encoding=True, norm_before=True)
    tinter = TorchSBBlock(num_layers=1, d_model=D, nhead=H, d_ffn=FFN,
                          use_positional_encoding=True, norm_before=True)
    tnet = TorchDualPath(
        in_channels=D, out_channels=D, intra_model=tintra,
        inter_model=tinter, num_layers=2, num_spks=2, K=K,
        linear_layer_after_inter_intra=True,
    ).eval()
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, D, 40)).astype(np.float32)  # torch (B,N,T)
    with torch.no_grad():
        tout = tnet(torch.from_numpy(x)).numpy()  # (spks, B, N, T)
    ckpt = tmp_path / "sepformer.ckpt"
    torch.save(tnet.state_dict(), ckpt)

    import jax
    import jax.numpy as jnp

    from speechbrain_tpu.lobes.models.dual_path import (
        DualPathModel,
        SBTransformerBlock,
    )
    from speechbrain_tpu.utils.torch_convert import (
        load_torch_state_dict,
        pour_torch_keys,
        reshape_sepformer_convs,
        sepformer_masknet_key_map,
        split_torch_mha_inproj,
    )

    intra = SBTransformerBlock(num_layers=1, d_model=D, nhead=H, d_ffn=FFN)
    inter = SBTransformerBlock(num_layers=1, d_model=D, nhead=H, d_ffn=FFN)
    net = DualPathModel(
        in_channels=D, out_channels=D, intra_model=intra,
        inter_model=inter, num_layers=2, num_spks=2, K=K,
        linear_layer_after_inter_intra=True,
    )
    jx = jnp.asarray(x.transpose(0, 2, 1))  # ours is (B, T, N)
    variables = net.init(jax.random.PRNGKey(0), jx)
    state = reshape_sepformer_convs(
        split_torch_mha_inproj(load_torch_state_dict(str(ckpt)))
    )
    poured = pour_torch_keys(
        state, variables, sepformer_masknet_key_map, strict=True
    )
    out = net.apply(poured, jx)  # (spks, B, T, N)
    ours = np.asarray(out).transpose(0, 1, 3, 2)  # -> (spks, B, N, T)
    np.testing.assert_allclose(ours, tout, rtol=5e-4, atol=5e-4)


def test_xvector_torch_checkpoint_pours_to_output_parity(tmp_path):
    """Xvector pour (ref Xvector.py:19) — the spkrec-xvect checkpoint
    path, with randomized BN running stats."""
    _import_reference_ecapa()
    from speechbrain.lobes.models.Xvector import Xvector as TorchXvector

    tm = TorchXvector(
        in_channels=24, tdnn_channels=[32, 32, 32, 32, 96], lin_neurons=16
    ).eval()
    with torch.no_grad():
        for mod in tm.modules():
            if hasattr(mod, "running_mean") and mod.running_mean is not None:
                mod.running_mean.uniform_(-0.5, 0.5)
                mod.running_var.uniform_(0.5, 1.5)
    x = np.random.default_rng(4).standard_normal((3, 60, 24)).astype(
        np.float32
    )
    with torch.no_grad():
        tout = tm(torch.from_numpy(x)).numpy()
    ckpt = tmp_path / "xvector.ckpt"
    torch.save(tm.state_dict(), ckpt)

    import jax
    import jax.numpy as jnp

    from speechbrain_tpu.lobes.models.Xvector import Xvector
    from speechbrain_tpu.utils.torch_convert import (
        load_torch_state_dict,
        pour_torch_keys,
        xvector_key_map,
    )

    jm = Xvector(tdnn_channels=(32, 32, 32, 32, 96), lin_neurons=16)
    variables = jm.init(
        jax.random.PRNGKey(0), jnp.asarray(x), train=False
    )
    poured = pour_torch_keys(
        load_torch_state_dict(str(ckpt)), variables, xvector_key_map,
        strict=True,
    )
    out = np.asarray(jm.apply(poured, jnp.asarray(x), train=False))
    assert out.shape == tout.shape
    np.testing.assert_allclose(out, tout, atol=5e-4, rtol=5e-4)


def test_rnnlm_torch_checkpoint_pours_to_output_parity(tmp_path):
    """RNNLM pour (ref RNNLM.py) — the asr-crdnn-rnnlm-librispeech LM /
    rescorer checkpoint path."""
    _import_reference_ecapa()
    from speechbrain.lobes.models.RNNLM import RNNLM as TorchRNNLM

    tm = TorchRNNLM(
        output_neurons=20, embedding_dim=8, rnn_neurons=16, rnn_layers=2,
        dnn_neurons=16, dnn_blocks=1,
    ).eval()
    ids = np.random.default_rng(5).integers(
        0, 20, size=(3, 7)
    ).astype(np.int64)
    with torch.no_grad():
        tout = tm(torch.from_numpy(ids)).numpy()
    ckpt = tmp_path / "lm.ckpt"
    torch.save(tm.state_dict(), ckpt)

    import jax
    import jax.numpy as jnp

    from speechbrain_tpu.lobes.models.RNNLM import RNNLM
    from speechbrain_tpu.utils.torch_convert import (
        load_torch_state_dict,
        merge_lstm_biases,
        pour_torch_keys,
        rnnlm_key_map,
    )

    jm = RNNLM(output_neurons=20, embedding_dim=8, rnn_neurons=16,
               rnn_layers=2, dnn_neurons=16)
    jx = jnp.asarray(ids.astype(np.int32))
    variables = jm.init(jax.random.PRNGKey(0), jx)
    state = merge_lstm_biases(load_torch_state_dict(str(ckpt)))
    poured = pour_torch_keys(state, variables, rnnlm_key_map, strict=True)
    out = jm.apply(poured, jx)
    out = out[0] if isinstance(out, tuple) else out
    np.testing.assert_allclose(
        np.asarray(out), tout, atol=5e-4, rtol=5e-4
    )


def test_hifigan_generator_torch_checkpoint_pours_to_output_parity(
    tmp_path,
):
    """HifiganGenerator pour (ref HifiGAN.py:371) with weight-norm
    fusion — the tts-hifigan vocoder checkpoint path."""
    _import_reference_ecapa()
    from speechbrain.lobes.models.HifiGAN import (
        HifiganGenerator as TorchGen,
    )

    tg = TorchGen(
        in_channels=8, out_channels=1, resblock_type="1",
        resblock_dilation_sizes=[[1, 3, 5], [1, 3, 5]],
        resblock_kernel_sizes=[3, 7],
        upsample_kernel_sizes=[4, 4], upsample_initial_channel=16,
        upsample_factors=[2, 2],
    ).eval()
    tg.remove_weight_norm()  # fold the parametrization like inference
    mel = np.random.default_rng(6).standard_normal((2, 8, 20)).astype(
        np.float32
    )  # torch layout (B, C, T)
    with torch.no_grad():
        tout = tg(torch.from_numpy(mel)).numpy()
    ckpt = tmp_path / "gen.ckpt"
    torch.save(tg.state_dict(), ckpt)

    import jax
    import jax.numpy as jnp

    from speechbrain_tpu.lobes.models.HifiGAN import HifiganGenerator
    from speechbrain_tpu.utils.torch_convert import (
        fuse_weight_norm,
        hifigan_generator_key_map,
        load_torch_state_dict,
        pour_torch_keys,
    )

    g = HifiganGenerator(
        in_channels=8, out_channels=1, resblock_type="1",
        resblock_dilation_sizes=((1, 3, 5), (1, 3, 5)),
        resblock_kernel_sizes=(3, 7),
        upsample_kernel_sizes=(4, 4), upsample_initial_channel=16,
        upsample_factors=(2, 2),
    )
    jx = jnp.asarray(mel.transpose(0, 2, 1))  # ours (B, T, C)
    variables = g.init(jax.random.PRNGKey(0), jx)
    state = fuse_weight_norm(load_torch_state_dict(str(ckpt)))
    poured = pour_torch_keys(
        state, variables, hifigan_generator_key_map(n_kernels=2),
        strict=True,
    )
    out = np.asarray(g.apply(poured, jx))  # (B, T*4)
    np.testing.assert_allclose(
        out, tout[:, 0, :], atol=5e-4, rtol=5e-4
    )


def test_tacotron2_torch_checkpoint_pours_to_output_parity(tmp_path):
    """Tacotron2 teacher-forced pour (ref Tacotron2.py:54) — the
    tts-tacotron2-ljspeech checkpoint path. The reference prenet keeps
    dropout on even in eval; it is zeroed on both sides so the
    comparison is deterministic."""
    _import_reference_ecapa()
    from speechbrain.lobes.models.Tacotron2 import Tacotron2 as TorchT2

    D, MEL = 16, 8
    tm = TorchT2(
        n_symbols=20, symbols_embedding_dim=D, encoder_embedding_dim=D,
        attention_rnn_dim=D, decoder_rnn_dim=D, attention_dim=8,
        attention_location_n_filters=4, attention_location_kernel_size=5,
        n_mel_channels=MEL, prenet_dim=8, postnet_embedding_dim=D,
        p_attention_dropout=0.0, p_decoder_dropout=0.0,
    ).eval()
    tm.decoder.prenet.dropout = 0.0  # always-on dropout -> deterministic
    with torch.no_grad():
        for mod in tm.modules():
            if hasattr(mod, "running_mean") and mod.running_mean is not None:
                mod.running_mean.uniform_(-0.5, 0.5)
                mod.running_var.uniform_(0.5, 1.5)

    rng = np.random.default_rng(11)
    text = rng.integers(1, 20, size=(2, 6)).astype(np.int64)
    text_lens = np.array([6, 6], np.int64)
    mels = rng.standard_normal((2, MEL, 12)).astype(np.float32)
    out_lens = np.array([12, 12], np.int64)
    with torch.no_grad():
        t_mel, t_post, t_gate, t_align = tm(
            (
                torch.from_numpy(text), torch.from_numpy(text_lens),
                torch.from_numpy(mels), 6, torch.from_numpy(out_lens),
            )
        )[:4]
    ckpt = tmp_path / "tacotron2.ckpt"
    torch.save(tm.state_dict(), ckpt)

    import jax
    import jax.numpy as jnp

    from speechbrain_tpu.lobes.models.Tacotron2 import Tacotron2
    from speechbrain_tpu.utils.torch_convert import (
        load_torch_state_dict,
        merge_lstm_biases,
        merge_lstmcell_biases,
        pour_torch_keys,
        tacotron2_key_map,
    )

    jm = Tacotron2(
        n_symbols=20, symbols_embedding_dim=D, encoder_embedding_dim=D,
        attention_rnn_dim=D, decoder_rnn_dim=D, attention_dim=8,
        attention_location_n_filters=4, attention_location_kernel_size=5,
        n_mel_channels=MEL, prenet_sizes=(8, 8), postnet_embedding_dim=D,
        prenet_dropout=0.0,
    )
    jtext = jnp.asarray(text.astype(np.int32))
    jmels = jnp.asarray(mels.transpose(0, 2, 1))  # ours (B, T, n_mel)
    jlens = jnp.asarray(text_lens / text.shape[1])
    variables = jm.init(
        {"params": jax.random.PRNGKey(0),
         "dropout": jax.random.PRNGKey(1)},
        jtext, jlens, jmels,
    )
    state = merge_lstmcell_biases(
        merge_lstm_biases(load_torch_state_dict(str(ckpt)))
    )
    poured = pour_torch_keys(
        state, variables, tacotron2_key_map, strict=True
    )
    j_mel, j_post, j_gate, j_align = jm.apply(
        poured, jtext, jlens, jmels, train=False
    )
    np.testing.assert_allclose(
        np.asarray(j_mel).transpose(0, 2, 1), t_mel.numpy(),
        atol=5e-4, rtol=5e-4,
    )
    np.testing.assert_allclose(
        np.asarray(j_post).transpose(0, 2, 1), t_post.numpy(),
        atol=5e-4, rtol=5e-4,
    )


def test_pretrainer_uses_exact_converter_registry(tmp_path):
    """Pretrainer(modules=...) routes torch checkpoints through the
    parity-tested converter for the module's architecture — the
    user-facing from_hparams pour path."""
    import jax
    import jax.numpy as jnp

    from speechbrain_tpu.lobes.models.ECAPA_TDNN import ECAPA_TDNN
    from speechbrain_tpu.utils.checkpoints import PytreeRef
    from speechbrain_tpu.utils.parameter_transfer import Pretrainer

    TorchECAPA, _ = _import_reference_ecapa()
    tm = TorchECAPA(input_size=40, **{
        k: list(v) if isinstance(v, tuple) else v for k, v in CFG.items()
    }).eval()
    ckpt = tmp_path / "embedding_model.ckpt"
    torch.save(tm.state_dict(), str(ckpt))

    jm = ECAPA_TDNN(**CFG)
    x = np.random.default_rng(3).standard_normal((2, 60, 40)).astype(
        np.float32
    )
    variables = jax.tree_util.tree_map(
        np.asarray,
        dict(jm.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)),
    )
    ref = PytreeRef(variables)
    pre = Pretrainer(
        collect_in=str(tmp_path),
        loadables={"embedding_model": ref},
        paths={"embedding_model": str(ckpt)},
        modules={"embedding_model": jm},
    )
    pre.collect_files()
    pre.load_collected()
    with torch.no_grad():
        tout = tm(torch.from_numpy(x)).numpy()
    out = np.asarray(
        jm.apply(
            jax.tree_util.tree_map(jnp.asarray, ref.tree),
            jnp.asarray(x), train=False,
        )
    )
    np.testing.assert_allclose(out, tout, atol=5e-4, rtol=5e-4)


def test_transformer_decoder_torch_checkpoint_pours_to_output_parity(
    tmp_path,
):
    """Vanilla TransformerDecoder pour (self + cross attention, ref
    Transformer.py:630) — completes the asr-conformer enc+dec path."""
    _import_reference_ecapa()
    from speechbrain.lobes.models.transformer.Transformer import (
        TransformerDecoder as TorchDec,
    )

    D, H, FFN, L = 16, 4, 32, 2
    tdec = TorchDec(num_layers=L, d_model=D, d_ffn=FFN, nhead=H,
                    dropout=0.0).eval()
    rng = np.random.default_rng(12)
    tgt = rng.standard_normal((2, 5, D)).astype(np.float32)
    mem = rng.standard_normal((2, 9, D)).astype(np.float32)
    with torch.no_grad():
        tout = tdec(torch.from_numpy(tgt), torch.from_numpy(mem))[0].numpy()
    ckpt = tmp_path / "tdec.ckpt"
    torch.save(tdec.state_dict(), ckpt)

    import jax
    import jax.numpy as jnp

    from speechbrain_tpu.lobes.models.transformer.Transformer import (
        TransformerDecoder,
    )
    from speechbrain_tpu.utils.torch_convert import (
        pour_reference_checkpoint,
    )

    dec = TransformerDecoder(num_layers=L, d_model=D, d_ffn=FFN, nhead=H,
                             dropout=0.0)
    jt, jm = jnp.asarray(tgt), jnp.asarray(mem)
    variables = dec.init(jax.random.PRNGKey(0), jt, jm)
    poured = pour_reference_checkpoint(dec, variables, str(ckpt))
    out = dec.apply(poured, jt, jm)[0]
    np.testing.assert_allclose(np.asarray(out), tout, atol=5e-4, rtol=5e-4)


def test_branchformer_encoder_torch_checkpoint_pours_to_output_parity(
    tmp_path,
):
    """BranchformerEncoder pour (RelPosMHAXL branch + cgMLP branch +
    merge, ref Branchformer.py) — the asr-branchformer checkpoint
    path."""
    _import_reference_ecapa()
    from speechbrain.lobes.models.transformer.Branchformer import (
        BranchformerEncoder as TorchBF,
    )
    from speechbrain.nnet.attention import RelPosEncXL as TorchPE

    # non-square head config (see conformer test note on pos_bias)
    D, H, K, CS, L = 32, 2, 7, 32, 2
    tenc = TorchBF(num_layers=L, d_model=D, nhead=H, kernel_size=K,
                   csgu_linear_units=CS, dropout=0.0).eval()
    rng = np.random.default_rng(13)
    x = rng.standard_normal((2, 10, D)).astype(np.float32)
    with torch.no_grad():
        tpe = TorchPE(D)(torch.from_numpy(x))
        tout = tenc(torch.from_numpy(x), pos_embs=tpe)[0].numpy()
    ckpt = tmp_path / "bf.ckpt"
    torch.save(tenc.state_dict(), ckpt)

    import jax
    import jax.numpy as jnp

    from speechbrain_tpu.lobes.models.transformer.Branchformer import (
        BranchformerEncoder,
    )
    from speechbrain_tpu.nnet.attention import RelPosEncXL
    from speechbrain_tpu.utils.torch_convert import (
        pour_reference_checkpoint,
    )

    enc = BranchformerEncoder(num_layers=L, d_model=D, nhead=H,
                              kernel_size=K, csgu_linear_units=CS)
    jx = jnp.asarray(x)
    pe = RelPosEncXL(emb_dim=D)(jx)
    variables = enc.init(jax.random.PRNGKey(0), jx, pos_embs=pe)
    poured = pour_reference_checkpoint(enc, variables, str(ckpt))
    out = enc.apply(poured, jx, pos_embs=pe)
    out = out[0] if isinstance(out, tuple) else out
    np.testing.assert_allclose(np.asarray(out), tout, atol=5e-4, rtol=5e-4)


def test_metricgan_generator_torch_checkpoint_pours_to_output_parity(
    tmp_path,
):
    """MetricGAN+ EnhancementGenerator pour (biLSTM masker, ref
    MetricGAN.py:59) — the metricgan-plus-voicebank checkpoint path.
    The reference head is hardcoded to 400->300->257, so the test uses
    the published dimensions."""
    _import_reference_ecapa()
    from speechbrain.lobes.models.MetricGAN import (
        EnhancementGenerator as TorchGen,
    )

    tm = TorchGen(input_size=257, hidden_size=200, num_layers=2,
                  dropout=0.0).eval()
    rng = np.random.default_rng(14)
    mag = np.abs(rng.standard_normal((2, 12, 257))).astype(np.float32)
    with torch.no_grad():
        tout = tm(torch.from_numpy(mag),
                  lengths=torch.ones(2)).numpy()
    ckpt = tmp_path / "mg.ckpt"
    torch.save(tm.state_dict(), ckpt)

    import jax
    import jax.numpy as jnp

    from speechbrain_tpu.lobes.models.MetricGAN import (
        EnhancementGenerator,
    )
    from speechbrain_tpu.utils.torch_convert import (
        pour_reference_checkpoint,
    )

    g = EnhancementGenerator(lstm_neurons=200, dnn_neurons=300)
    jx = jnp.asarray(mag)
    variables = g.init(jax.random.PRNGKey(0), jx)
    poured = pour_reference_checkpoint(g, variables, str(ckpt))
    out = g.apply(poured, jx)
    out = out[0] if isinstance(out, tuple) else out
    np.testing.assert_allclose(np.asarray(out), tout, atol=5e-4, rtol=5e-4)


def test_resnet_torch_checkpoint_pours_to_output_parity(tmp_path):
    """ResNet speaker encoder pour (pre-act 3-conv SE blocks +
    frequency-flattened attentive stats, ref ResNet.py:235) — the
    spkrec-resnet-voxceleb checkpoint path."""
    _import_reference_ecapa()
    from speechbrain.lobes.models.ResNet import ResNet as TorchResNet

    tm = TorchResNet(
        input_size=24, channels=[8, 8, 16, 16], block_sizes=[1, 1, 1, 1],
        lin_neurons=16,
    ).eval()
    with torch.no_grad():
        for mod in tm.modules():
            if hasattr(mod, "running_mean") and mod.running_mean is not None:
                mod.running_mean.uniform_(-0.5, 0.5)
                mod.running_var.uniform_(0.5, 1.5)
    rng = np.random.default_rng(16)
    x = rng.standard_normal((2, 40, 24)).astype(np.float32)
    with torch.no_grad():
        tout = tm(torch.from_numpy(x)).numpy()
    ckpt = tmp_path / "resnet.ckpt"
    torch.save(tm.state_dict(), ckpt)

    import jax
    import jax.numpy as jnp

    from speechbrain_tpu.lobes.models.ResNet import ResNet
    from speechbrain_tpu.utils.torch_convert import (
        pour_reference_checkpoint,
    )

    jm = ResNet(layers=(1, 1, 1, 1), channels=(8, 8, 16, 16),
                lin_neurons=16)
    jx = jnp.asarray(x)
    variables = jm.init(jax.random.PRNGKey(0), jx, train=False)
    poured = pour_reference_checkpoint(jm, variables, str(ckpt))
    out = np.asarray(jm.apply(poured, jx, train=False))
    np.testing.assert_allclose(
        out.reshape(tout.shape), tout, atol=5e-4, rtol=5e-4
    )


def test_diffwave_torch_checkpoint_pours_to_output_parity(tmp_path):
    """DiffWave denoiser pour (ref DiffWave.py:357) including the 2-D
    ConvTranspose2d(k=(3,32)) spectrogram upsampler and the reference's
    10^(d*4/63) diffusion-step embedding table — the
    tts-diffwave-ljspeech vocoder checkpoint path."""
    _import_reference_ecapa()
    from speechbrain.lobes.models.DiffWave import DiffWave as TorchDiffWave

    n_mels, C, layers = 8, 8, 2
    tm = TorchDiffWave(
        input_channels=n_mels, residual_layers=layers, residual_channels=C,
        dilation_cycle_length=2, total_steps=50, unconditional=False,
    ).eval()
    rng = np.random.default_rng(17)
    audio = rng.standard_normal((2, 1, 512)).astype(np.float32)
    mel = rng.standard_normal((2, n_mels, 2)).astype(np.float32)
    t = np.asarray([3, 7])
    with torch.no_grad():
        tout = tm(
            torch.from_numpy(audio), torch.from_numpy(t),
            torch.from_numpy(mel),
        ).numpy()
    ckpt = tmp_path / "diffwave.ckpt"
    torch.save(tm.state_dict(), ckpt)

    import jax
    import jax.numpy as jnp

    from speechbrain_tpu.lobes.models.DiffWave import DiffWave
    from speechbrain_tpu.utils.torch_convert import (
        pour_reference_checkpoint,
    )

    jm = DiffWave(
        residual_layers=layers, residual_channels=C,
        dilation_cycle_length=2, total_steps=50, unconditional=False,
    )
    jx = jnp.asarray(audio[:, 0, :])
    jmel = jnp.asarray(mel.transpose(0, 2, 1))  # ours (B, T_mel, M)
    jt = jnp.asarray(t, jnp.int32)
    variables = jm.init(jax.random.PRNGKey(0), jx, jt, jmel)
    poured = pour_reference_checkpoint(jm, variables, str(ckpt))
    out = np.asarray(jm.apply(poured, jx, jt, jmel))
    np.testing.assert_allclose(out, tout[:, 0, :], atol=5e-4, rtol=5e-4)


def test_fastspeech2_torch_checkpoint_pours_to_output_parity(tmp_path):
    """FastSpeech2 teacher-forced pour (ref FastSpeech2.py:390) with the
    conv-FFN ("1dcnn") FFT blocks, masked sequential variance adaptors
    and LayerNorm postnet — the tts-fastspeech2-ljspeech checkpoint
    path."""
    _import_reference_ecapa()
    from speechbrain.lobes.models.FastSpeech2 import (
        FastSpeech2 as TorchFastSpeech2,
    )

    d, layers, n_mels = 32, 2, 8
    tm = TorchFastSpeech2(
        enc_num_layers=layers, enc_num_head=4, enc_d_model=d,
        enc_ffn_dim=64, enc_k_dim=d, enc_v_dim=d, enc_dropout=0.0,
        dec_num_layers=layers, dec_num_head=4, dec_d_model=d,
        dec_ffn_dim=64, dec_k_dim=d, dec_v_dim=d, dec_dropout=0.0,
        normalize_before=False, ffn_type="1dcnn",
        ffn_cnn_kernel_size_list=[9, 1], n_char=30, n_mels=n_mels,
        postnet_embedding_dim=16, postnet_kernel_size=5,
        postnet_n_convolutions=5, postnet_dropout=0.0, padding_idx=0,
        dur_pred_kernel_size=3, pitch_pred_kernel_size=3,
        energy_pred_kernel_size=3, variance_predictor_dropout=0.0,
    ).eval()
    rng = np.random.default_rng(18)
    tokens = rng.integers(1, 30, (2, 6))
    durs = rng.integers(1, 4, (2, 6))
    T_de = int(durs.sum(axis=1).max())
    pitch = rng.standard_normal((2, T_de)).astype(np.float32)
    energy = rng.standard_normal((2, T_de)).astype(np.float32)
    with torch.no_grad():
        (t_mel, t_post, t_dur, t_pitch, t_avg_pitch, t_energy,
         t_avg_energy, t_lens) = tm(
            torch.from_numpy(tokens), durations=torch.from_numpy(durs),
            pitch=torch.from_numpy(pitch), energy=torch.from_numpy(energy),
        )
    ckpt = tmp_path / "fastspeech2.ckpt"
    torch.save(tm.state_dict(), ckpt)

    import jax
    import jax.numpy as jnp

    from speechbrain_tpu.lobes.models.FastSpeech2 import FastSpeech2
    from speechbrain_tpu.utils.torch_convert import (
        pour_reference_checkpoint,
    )

    jm = FastSpeech2(
        n_symbols=30, d_model=d, nhead=4, d_ffn=64, enc_layers=layers,
        dec_layers=layers, n_mel_channels=n_mels, dropout=0.0,
        max_mel_len=T_de, normalize_before=False, ffn_type="1dcnn",
        ffn_cnn_kernel_size_list=(9, 1), postnet_embedding_dim=16,
        variance_dropout=0.0,
    )
    jt = jnp.asarray(tokens, jnp.int32)
    jd = jnp.asarray(durs, jnp.int32)
    variables = jm.init(
        jax.random.PRNGKey(0), jt, jd, jnp.asarray(pitch),
        jnp.asarray(energy),
    )
    poured = pour_reference_checkpoint(jm, variables, str(ckpt))
    out = jm.apply(poured, jt, jd, jnp.asarray(pitch), jnp.asarray(energy))
    # compare over each utterance's valid mel frames (padding conventions
    # differ: ours repeats the last frame, torch zero-pads)
    for b, L in enumerate(np.asarray(out["mel_lens"])):
        L = min(int(L), t_mel.shape[1])
        np.testing.assert_allclose(
            np.asarray(out["mel"][b, :L]), t_mel[b, :L].numpy(),
            atol=5e-4, rtol=5e-4,
        )
        np.testing.assert_allclose(
            np.asarray(out["mel_post"][b, :L]), t_post[b, :L].numpy(),
            atol=5e-4, rtol=5e-4,
        )
    np.testing.assert_allclose(
        np.asarray(out["log_durations"]), t_dur.numpy(), atol=5e-4,
        rtol=5e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out["pitch"]), t_pitch[..., 0].numpy(), atol=5e-4,
        rtol=5e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out["avg_energy"]), t_avg_energy[..., 0].numpy(),
        atol=5e-4, rtol=5e-4,
    )


def test_beats_torch_checkpoint_pours_to_output_parity(tmp_path):
    """BEATs encoder pour (ref beats.py:30): patch embedding, grouped
    pos_conv (weight-norm dim=2), deep-norm post-norm layers and the
    shared gated relative position bias. Both sides consume an identical
    precomputed fbank grid (the Kaldi frontend is validated separately)."""
    _import_reference_ecapa()
    if "torchaudio.compliance" not in sys.modules:
        comp = types.ModuleType("torchaudio.compliance")
        kaldi = types.ModuleType("torchaudio.compliance.kaldi")
        kaldi.fbank = lambda *a, **k: None
        comp.kaldi = kaldi
        sys.modules["torchaudio"].compliance = comp
        sys.modules["torchaudio.compliance"] = comp
        sys.modules["torchaudio.compliance.kaldi"] = kaldi
    import speechbrain.lobes.models.beats as rb

    tiny = dict(
        input_patch_size=16, embed_dim=16, encoder_layers=2,
        encoder_embed_dim=24, encoder_ffn_embed_dim=48,
        encoder_attention_heads=4, conv_pos=8, conv_pos_groups=4,
        deep_norm=True, layer_norm_first=False,
        relative_position_embedding=True, gru_rel_pos=True,
        num_buckets=32, max_distance=60, dropout=0.0, dropout_input=0.0,
        attention_dropout=0.0, activation_dropout=0.0,
        encoder_layerdrop=0.0, finetuned_model=False,
    )
    orig_cfg = rb.BEATsConfig

    class TinyCfg(orig_cfg):
        def __init__(self, cfg=None):
            super().__init__(cfg)
            self.update(tiny)

    rb.BEATsConfig = TinyCfg
    try:
        tm = rb.BEATs(ckp_path=None, freeze=False).eval()
    finally:
        rb.BEATsConfig = orig_cfg
    rng = np.random.default_rng(19)
    fbank = rng.standard_normal((2, 32, 128)).astype(np.float32)
    tm.preprocess = (
        lambda wav, fbank_mean=0.0, fbank_std=0.0: torch.from_numpy(fbank)
    )
    wav = torch.zeros(2, 16000)
    with torch.no_grad():
        (tout,) = tm.extract_features(wav, torch.ones(2))
    ckpt = tmp_path / "beats.ckpt"
    torch.save(tm.state_dict(), ckpt)

    import jax
    import jax.numpy as jnp

    from speechbrain_tpu.lobes.models.beats import BEATs
    from speechbrain_tpu.utils.torch_convert import (
        pour_reference_checkpoint,
    )

    jm = BEATs(
        input_patch_size=16, embed_dim=16, encoder_embed_dim=24,
        encoder_layers=2, encoder_ffn_embed_dim=48,
        encoder_attention_heads=4, conv_pos=8, conv_pos_groups=4,
        num_buckets=32, max_distance=60, gru_rel_pos=True, deep_norm=True,
        dropout=0.0,
    )
    jfb = jnp.asarray(fbank)
    variables = jm.init(jax.random.PRNGKey(0), jfb, method="encode_fbank")
    poured = pour_reference_checkpoint(jm, variables, str(ckpt))
    out = np.asarray(jm.apply(poured, jfb, method="encode_fbank"))
    np.testing.assert_allclose(out, tout.numpy(), atol=5e-4, rtol=5e-4)


def test_w2v_latent_extractor_torch_checkpoint_pours_to_output_parity(
    tmp_path,
):
    """SB-native wav2vec2 SSL latent extractor pour (ref wav2vec.py:26):
    bias-free strided conv + LayerNorm + erf-GELU stack, signal layer
    norm, and the trailing LayerNorm."""
    _import_reference_ecapa()
    from speechbrain.lobes.models.wav2vec import (
        W2VLatentExtractor as TorchExtractor,
    )

    tm = TorchExtractor(
        out_channels=[8, 8, 8], kernel_sizes=[11, 3, 3], strides=[5, 2, 2]
    ).eval()
    rng = np.random.default_rng(20)
    x = rng.standard_normal((2, 4000)).astype(np.float32)
    with torch.no_grad():
        tout = tm(torch.from_numpy(x)).numpy()
    ckpt = tmp_path / "w2v_latent.ckpt"
    torch.save(tm.state_dict(), ckpt)

    import jax
    import jax.numpy as jnp

    from speechbrain_tpu.lobes.models.wav2vec import W2VLatentExtractor
    from speechbrain_tpu.utils.torch_convert import (
        pour_reference_checkpoint,
    )

    jm = W2VLatentExtractor(
        out_channels=(8, 8, 8), kernel_sizes=(11, 3, 3), strides=(5, 2, 2)
    )
    jx = jnp.asarray(x)
    variables = jm.init(jax.random.PRNGKey(0), jx)
    poured = pour_reference_checkpoint(jm, variables, str(ckpt))
    out = np.asarray(jm.apply(poured, jx))
    np.testing.assert_allclose(out, tout, atol=5e-4, rtol=5e-4)
