"""Flair embeddings wrapper (reference
``speechbrain/integrations/nlp/flair_embeddings.py``; FlairEmbeddings at
flair_embeddings.py:23). flair is not bundled — constructs only when
installed; embeddings are returned as numpy for device-side use."""

import numpy as np

from speechbrain_tpu.utils.importutils import LazyModule

flair = LazyModule("flair")


class FlairEmbeddings:
    """Word embeddings from any flair embedding class.

    ``from_hf(flair.embeddings.FastTextEmbeddings, source)`` fetches a
    model; ``__call__(sentences)`` -> list of (n_tokens, D) arrays.
    """

    def __init__(self, embeddings):
        self.embeddings = embeddings

    @classmethod
    def from_hf(cls, embeddings_class, source, save_path="./model_cache",
                filename="model.bin"):
        from speechbrain_tpu.utils.fetching import fetch

        path = fetch(filename, source=source, savedir=save_path)
        return cls(embeddings_class(str(path)))

    def __call__(self, sentences, pad_tensor=None):
        Sentence = flair.data.Sentence
        out = []
        for s in sentences:
            sent = Sentence(s if isinstance(s, str) else " ".join(s))
            self.embeddings.embed(sent)
            out.append(
                np.stack([t.embedding.cpu().numpy() for t in sent.tokens])
            )
        return out
