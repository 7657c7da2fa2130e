"""BGE-M3 sentence embeddings, TPU-native (reference
``speechbrain/integrations/nlp/bgeM3_embeddings.py``,
BGEM3SentenceEmbeddings at bgeM3_embeddings.py:28).

The reference wraps ``FlagEmbedding.BGEM3FlagModel``; here the three
BGE-M3 retrieval heads run natively on the XLM-RoBERTa backbone through
the Flax bridge, so the whole embedding path is one jitted TPU program:

- dense:   l2-normalized [CLS] pooling of the last hidden state
- sparse:  per-token lexical weights ``relu(W_lex h + b)`` aggregated
           per token id (max over repeats, special tokens dropped)
- colbert: l2-normalized per-token projections (CLS excluded)

The sparse/colbert projection weights live beside the backbone in the
published checkpoint (``sparse_linear.pt`` / ``colbert_linear.pt``);
they are picked up automatically from a local checkpoint dir, or can be
passed as arrays. FlagEmbedding is NOT required.
"""

import os

import numpy as np

from speechbrain_tpu.utils.logger import get_logger

logger = get_logger(__name__)


def _load_head(source, filename, save_path=""):
    """Fetch a FlagEmbedding-format projection head (torch state dict
    with ``weight``/``bias``) as numpy: from a local checkpoint dir, or
    downloaded from the hub when ``source`` is a repo id (the reference
    gets them through FlagEmbedding's own download)."""
    path = os.path.join(str(source), filename)
    if not os.path.isfile(path):
        try:
            from huggingface_hub import hf_hub_download

            path = hf_hub_download(
                str(source), filename, cache_dir=save_path or None
            )
        except Exception as e:
            logger.debug("no %s for %r (%r)", filename, source, e)
            return None
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    return (
        np.asarray(state["weight"].float()),
        np.asarray(state["bias"].float()),
    )


class BGEM3SentenceEmbeddings:
    """Dense / sparse / multi-vector sentence embeddings from BGE-M3.

    ``__call__(sentences)`` mirrors the reference's forward
    (bgeM3_embeddings.py:103): dense-only requests return an ``(B, D)``
    array; otherwise a dict with the requested ``dense_vecs`` /
    ``lexical_weights`` / ``colbert_vecs`` fields.

    Arguments
    ---------
    source : str
        HF repo id or local checkpoint dir (XLM-RoBERTa backbone).
    sparse_weights, colbert_weights : (weight, bias) array pairs, optional
        Projection heads; default to ``sparse_linear.pt`` /
        ``colbert_linear.pt`` found next to a local checkpoint.
    tokenizer : optional
        Pre-built tokenizer; loaded from ``source`` when omitted.
    """

    def __init__(self, source="BAAI/bge-m3", save_path="", use_fp16=False,
                 return_dense=True, return_sparse=False,
                 return_colbert_vecs=False, max_length=8192, batch_size=12,
                 config_only=False, from_pt=False, sparse_weights=None,
                 colbert_weights=None, tokenizer=None, **kwargs):
        import jax
        import jax.numpy as jnp

        from speechbrain_tpu.integrations.huggingface.textencoder import (
            TextEncoder,
        )

        self.return_dense = bool(return_dense)
        self.return_sparse = bool(return_sparse)
        self.return_colbert_vecs = bool(return_colbert_vecs)
        self.max_length = int(max_length)
        self.batch_size = int(batch_size)
        self.encoder = TextEncoder(
            source, save_path, freeze=True, config_only=config_only,
            from_pt=from_pt, **kwargs,
        )
        self.tokenizer = tokenizer
        if self.tokenizer is None:
            try:
                import transformers

                self.tokenizer = transformers.AutoTokenizer.from_pretrained(
                    source, cache_dir=save_path or None
                )
            except Exception:
                # ids-only operation (config_only tests, custom frontends)
                self.tokenizer = None
        # the reference's use_fp16 runs the whole model reduced-precision;
        # on TPU bfloat16 is the native reduced dtype (fp16 overflows in
        # 1024-dim norms and has no MXU advantage), so the flag casts the
        # BACKBONE params and the head math to bf16
        self._dtype = jnp.bfloat16 if use_fp16 else jnp.float32
        if use_fp16 and getattr(self.encoder, "params", None) is not None:
            self.encoder.params = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
                self.encoder.params,
            )
        load = lambda name: (
            None if config_only else _load_head(source, name, save_path)
        )
        self.sparse_head = sparse_weights or load("sparse_linear.pt")
        self.colbert_head = colbert_weights or load("colbert_linear.pt")

        def heads(input_ids, attention_mask):
            hidden = self.encoder(input_ids, attention_mask)
            hidden = hidden.astype(self._dtype)
            out = {}
            if self.return_dense:
                cls = hidden[:, 0, :]
                out["dense_vecs"] = cls / (
                    jnp.linalg.norm(cls, axis=-1, keepdims=True) + 1e-9
                )
            if self.return_sparse:
                w, b = self.sparse_head
                lex = jax.nn.relu(
                    hidden @ jnp.asarray(w, self._dtype).T
                    + jnp.asarray(b, self._dtype)
                )[..., 0]
                out["token_weights"] = lex * attention_mask
            if self.return_colbert_vecs:
                w, b = self.colbert_head
                vecs = (
                    hidden[:, 1:, :] @ jnp.asarray(w, self._dtype).T
                    + jnp.asarray(b, self._dtype)
                )
                vecs = vecs / (
                    jnp.linalg.norm(vecs, axis=-1, keepdims=True) + 1e-9
                )
                out["colbert_vecs"] = vecs * attention_mask[:, 1:, None]
            return out

        for name, head in (("sparse", self.sparse_head),
                           ("colbert", self.colbert_head)):
            if getattr(self, f"return_{name}" if name == "sparse"
                       else "return_colbert_vecs") and head is None:
                raise RuntimeError(
                    f"BGE-M3 {name} output requested but no {name}_linear "
                    f"weights were found at {source!r} (expected "
                    f"{name}_linear.pt beside the backbone) and none were "
                    "passed explicitly."
                )
        self._heads = jax.jit(heads)

    def _special_ids(self):
        tok = self.tokenizer
        if tok is None:
            return {0, 1, 2, 3}  # XLM-R convention: bos/pad/eos/unk
        return {
            i for i in (tok.cls_token_id, tok.bos_token_id,
                        tok.eos_token_id, tok.sep_token_id,
                        tok.pad_token_id, tok.unk_token_id)
            if i is not None
        }

    def encode_ids(self, input_ids, attention_mask=None):
        """Run the heads on pre-tokenized ids; returns the raw dict with
        device arrays (``token_weights`` still per-position)."""
        import jax.numpy as jnp

        input_ids = jnp.asarray(input_ids, jnp.int32)
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids)
        return self._heads(
            input_ids, jnp.asarray(attention_mask, self._dtype)
        )

    def _lexical_dicts(self, input_ids, token_weights):
        """Per-sentence ``{str(token_id): weight}`` dicts —
        ``str`` keys match FlagEmbedding's lexical_weights contract, so
        code written against either wrapper indexes them identically."""
        ids = np.asarray(input_ids)
        weights = np.asarray(token_weights)
        skip = self._special_ids()
        out = []
        for row_ids, row_w in zip(ids, weights):
            lex = {}
            for tid, w in zip(row_ids.tolist(), row_w.tolist()):
                if w > 0 and tid not in skip:
                    key = str(tid)
                    lex[key] = max(lex.get(key, 0.0), w)
            out.append(lex)
        return out

    def __call__(self, inputs):
        if isinstance(inputs, str):
            raise ValueError(
                "Expected a list of sentences, not a single str."
            )
        if not isinstance(inputs, (list, tuple)) or len(inputs) == 0:
            raise ValueError("Input must be a non-empty list of sentences.")
        if self.tokenizer is None:
            raise RuntimeError(
                "No tokenizer available; pass pre-tokenized ids to "
                "encode_ids() or construct with a tokenizer."
            )
        dense, lexical, colbert = [], [], []
        for start in range(0, len(inputs), self.batch_size):
            chunk = list(inputs[start:start + self.batch_size])
            enc = self.tokenizer(
                chunk, padding=True, truncation=True,
                max_length=self.max_length, return_tensors="np",
            )
            # bucket the padded length to a multiple of 32 so the jitted
            # heads compile for a bounded set of shapes instead of one
            # program per distinct longest-sentence length
            ids_np, mask_np = enc["input_ids"], enc["attention_mask"]
            L = ids_np.shape[1]
            Lb = min(-(-L // 32) * 32, self.max_length)
            if Lb > L:
                pad_id = (
                    self.tokenizer.pad_token_id
                    if self.tokenizer.pad_token_id is not None else 0
                )
                ids_np = np.pad(
                    ids_np, ((0, 0), (0, Lb - L)), constant_values=pad_id
                )
                mask_np = np.pad(mask_np, ((0, 0), (0, Lb - L)))
            enc = {"input_ids": ids_np, "attention_mask": mask_np}
            raw = self.encode_ids(enc["input_ids"], enc["attention_mask"])
            if self.return_dense:
                dense.append(np.asarray(raw["dense_vecs"]))
            if self.return_sparse:
                lexical.extend(self._lexical_dicts(
                    enc["input_ids"], raw["token_weights"]
                ))
            if self.return_colbert_vecs:
                lens = enc["attention_mask"].sum(-1).astype(int) - 1
                vecs = np.asarray(raw["colbert_vecs"])
                colbert.extend(v[:n] for v, n in zip(vecs, lens))
        only_dense = self.return_dense and not (
            self.return_sparse or self.return_colbert_vecs
        )
        if only_dense:
            return np.concatenate(dense, axis=0)
        out = {}
        if self.return_dense:
            out["dense_vecs"] = np.concatenate(dense, axis=0)
        if self.return_sparse:
            # both spellings: 'lexical_weights' (FlagEmbedding's output
            # key) and 'sparse_vecs' (the reference wrapper's filter key,
            # ref bgeM3_embeddings.py docstring) point at the same list
            out["lexical_weights"] = lexical
            out["sparse_vecs"] = lexical
        if self.return_colbert_vecs:
            out["colbert_vecs"] = colbert
        return out

    def embed_sentence(self, sentence):
        """Dense vector for one sentence (reference
        bgeM3_embeddings.py:165)."""
        out = self([sentence])
        if isinstance(out, dict):
            return out["dense_vecs"][0]
        return out[0]
