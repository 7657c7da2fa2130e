"""Semantic-distance metrics over LM embeddings.

Capability parity with the reference's ``speechbrain/utils/semdist.py``
and ``bertscore.py``: cosine semantic distance / BERTScore-style recall
between reference and hypothesis texts using any embedding function
(HF flax text encoders plug in; gated on transformers).
"""

import numpy as np

from speechbrain_tpu.utils.metric_stats import MetricStats


class BaseSemDistStats(MetricStats):
    """Accumulate (ref, hyp) text pairs; summarize with an embedding fn."""

    def __init__(self, embed_fn, scale=1000.0):
        # embed_fn: list[str] -> (N, D) sentence embeddings
        self.embed_fn = embed_fn
        self.scale = scale
        self.clear()

    def clear(self):
        self.ids = []
        self.refs = []
        self.hyps = []
        self.summary = {}

    def append(self, ids, predict, target):
        self.ids.extend(ids)
        self.hyps.extend(predict)
        self.refs.extend(target)

    def summarize(self, field=None):
        import jax.numpy as jnp

        from speechbrain_tpu.utils.distances import cosine_similarity_matrix

        ref_emb = jnp.asarray(self.embed_fn(self.refs))
        hyp_emb = jnp.asarray(self.embed_fn(self.hyps))
        sims = jnp.sum(
            cosine_similarity_matrix(ref_emb, hyp_emb)
            * jnp.eye(ref_emb.shape[0]),
            axis=-1,
        )
        semdist = float((1.0 - sims.mean()) * self.scale)
        self.summary = {"semdist": semdist}
        if field is not None:
            return self.summary[field]
        return self.summary


class SemDistStats(BaseSemDistStats):
    """Mean-pooled embedding semantic distance (reference semdist.py)."""


class BertScoreStats(MetricStats):
    """BERTScore-style token-level recall/precision/F1 with any token
    embedder (reference bertscore.py, sans the hard transformers dep)."""

    def __init__(self, token_embed_fn):
        # token_embed_fn: list[str] -> list of (T_i, D) arrays
        self.token_embed_fn = token_embed_fn
        self.clear()

    def clear(self):
        self.ids = []
        self.refs = []
        self.hyps = []
        self.summary = {}

    def append(self, ids, predict, target):
        self.ids.extend(ids)
        self.hyps.extend(predict)
        self.refs.extend(target)

    def summarize(self, field=None):
        import jax.numpy as jnp

        from speechbrain_tpu.utils.distances import cosine_similarity_matrix

        ref_tok = self.token_embed_fn(self.refs)
        hyp_tok = self.token_embed_fn(self.hyps)
        recalls, precisions = [], []
        for r, h in zip(ref_tok, hyp_tok):
            sim = cosine_similarity_matrix(jnp.asarray(r), jnp.asarray(h))
            recalls.append(float(sim.max(axis=1).mean()))
            precisions.append(float(sim.max(axis=0).mean()))
        rec = float(np.mean(recalls))
        prec = float(np.mean(precisions))
        f1 = 2 * rec * prec / max(rec + prec, 1e-9)
        self.summary = {"recall": rec, "precision": prec, "f1": f1}
        if field is not None:
            return self.summary[field]
        return self.summary
