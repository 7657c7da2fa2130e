"""BGE-M3 native heads vs torch on a tiny XLM-RoBERTa (reference
integrations/nlp/bgeM3_embeddings.py wraps FlagEmbedding; ours computes
dense / sparse / colbert natively — each head is checked numerically
against the torch backbone here)."""

import jax
import numpy as np
import pytest

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def tiny_xlmr(tmp_path_factory):
    cfg = transformers.XLMRobertaConfig(
        vocab_size=64, hidden_size=16, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=32,
        max_position_embeddings=40, type_vocab_size=1,
        pad_token_id=1, bos_token_id=0, eos_token_id=2,
    )
    torch.manual_seed(0)
    model = transformers.XLMRobertaModel(cfg)
    model.eval()
    d = tmp_path_factory.mktemp("bgem3") / "model"
    model.save_pretrained(str(d), safe_serialization=False)
    return str(d), model


def test_dense_matches_torch_cls_norm(tiny_xlmr):
    from speechbrain_tpu.integrations.nlp.bgeM3_embeddings import (
        BGEM3SentenceEmbeddings,
    )

    src, torch_model = tiny_xlmr
    emb = BGEM3SentenceEmbeddings(src, from_pt=True, use_fp16=False)
    assert emb.tokenizer is None  # ids-only below
    ids = np.array([[0, 5, 9, 2, 1, 1], [0, 7, 7, 11, 13, 2]])
    mask = np.array([[1, 1, 1, 1, 0, 0], [1, 1, 1, 1, 1, 1]])
    ours = np.asarray(emb.encode_ids(ids, mask)["dense_vecs"])
    with torch.no_grad():
        hid = torch_model(
            torch.from_numpy(ids), attention_mask=torch.from_numpy(mask)
        ).last_hidden_state
        cls = hid[:, 0, :]
        want = (cls / cls.norm(dim=-1, keepdim=True)).numpy()
    np.testing.assert_allclose(ours, want, rtol=1e-4, atol=1e-5)


def test_sparse_and_colbert_heads(tiny_xlmr):
    from speechbrain_tpu.integrations.nlp.bgeM3_embeddings import (
        BGEM3SentenceEmbeddings,
    )

    src, torch_model = tiny_xlmr
    rng = np.random.default_rng(3)
    w_sp = rng.standard_normal((1, 16)).astype(np.float32)
    b_sp = rng.standard_normal((1,)).astype(np.float32)
    w_cb = rng.standard_normal((8, 16)).astype(np.float32)
    b_cb = rng.standard_normal((8,)).astype(np.float32)
    emb = BGEM3SentenceEmbeddings(
        src, from_pt=True, return_dense=True, return_sparse=True,
        return_colbert_vecs=True, sparse_weights=(w_sp, b_sp),
        colbert_weights=(w_cb, b_cb),
    )
    # token 7 repeats: the lexical dict must keep the max weight
    ids = np.array([[0, 7, 7, 11, 2, 1]])
    mask = np.array([[1, 1, 1, 1, 1, 0]])
    raw = emb.encode_ids(ids, mask)
    with torch.no_grad():
        hid = torch_model(
            torch.from_numpy(ids), attention_mask=torch.from_numpy(mask)
        ).last_hidden_state.numpy()
    want_lex = np.maximum(hid @ w_sp.T + b_sp, 0.0)[..., 0] * mask
    np.testing.assert_allclose(
        np.asarray(raw["token_weights"]), want_lex, rtol=1e-4, atol=1e-5
    )
    proj = hid[:, 1:, :] @ w_cb.T + b_cb
    want_cb = proj / (
        np.linalg.norm(proj, axis=-1, keepdims=True) + 1e-9
    ) * mask[:, 1:, None]
    np.testing.assert_allclose(
        np.asarray(raw["colbert_vecs"]), want_cb, rtol=1e-4, atol=1e-5
    )
    # host-side lexical aggregation: repeats keep the max, specials drop;
    # keys are str(token_id) — FlagEmbedding's lexical_weights contract
    lex = emb._lexical_dicts(ids, raw["token_weights"])[0]
    assert set(lex) <= {"7", "11"}
    if "7" in lex:
        assert lex["7"] == pytest.approx(
            max(want_lex[0, 1], want_lex[0, 2]), rel=1e-4
        )


def test_sparse_requested_without_weights_raises(tiny_xlmr):
    from speechbrain_tpu.integrations.nlp.bgeM3_embeddings import (
        BGEM3SentenceEmbeddings,
    )

    src, _ = tiny_xlmr
    with pytest.raises(RuntimeError, match="sparse"):
        BGEM3SentenceEmbeddings(src, from_pt=True, return_sparse=True)


def test_use_fp16_runs_backbone_in_bf16(tiny_xlmr):
    """use_fp16 maps to bfloat16 on TPU: backbone params are cast and
    the dense output stays close to the fp32 result."""
    import jax.numpy as jnp

    from speechbrain_tpu.integrations.nlp.bgeM3_embeddings import (
        BGEM3SentenceEmbeddings,
    )

    src, _ = tiny_xlmr
    emb32 = BGEM3SentenceEmbeddings(src, from_pt=True, use_fp16=False)
    emb16 = BGEM3SentenceEmbeddings(src, from_pt=True, use_fp16=True)
    leaves = jax.tree_util.tree_leaves(emb16.encoder.params)
    assert any(x.dtype == jnp.bfloat16 for x in leaves)
    ids = np.array([[0, 5, 9, 2]])
    a = np.asarray(emb32.encode_ids(ids)["dense_vecs"], np.float32)
    b = np.asarray(emb16.encode_ids(ids)["dense_vecs"], np.float32)
    np.testing.assert_allclose(a, b, atol=0.06)


def test_call_rejects_bad_inputs(tiny_xlmr):
    from speechbrain_tpu.integrations.nlp.bgeM3_embeddings import (
        BGEM3SentenceEmbeddings,
    )

    src, _ = tiny_xlmr
    emb = BGEM3SentenceEmbeddings(src, from_pt=True)
    with pytest.raises(ValueError):
        emb("a single string")
    with pytest.raises(ValueError):
        emb([])
