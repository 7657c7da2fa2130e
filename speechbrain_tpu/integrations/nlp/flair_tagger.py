"""Flair sequence tagger wrapper (reference
``speechbrain/integrations/nlp/flair_tagger.py``; FlairSequenceTagger at
flair_tagger.py:15). flair is not bundled — constructs only when
installed."""

from speechbrain_tpu.utils.importutils import LazyModule

flair = LazyModule("flair")


class FlairSequenceTagger:
    """POS/NER tagging with a flair SequenceTagger.

    ``from_hf(source)`` fetches a model; ``__call__(sentences)`` returns
    per-sentence label lists.
    """

    def __init__(self, model):
        self.model = model

    @classmethod
    def from_hf(cls, source, save_path="./model_cache",
                filename="pytorch_model.bin"):
        from speechbrain_tpu.utils.fetching import fetch

        path = fetch(filename, source=source, savedir=save_path)
        from flair.models import SequenceTagger

        return cls(SequenceTagger.load(str(path)))

    def __call__(self, inputs):
        Sentence = flair.data.Sentence
        sents = [
            Sentence(s if isinstance(s, str) else " ".join(s))
            for s in inputs
        ]
        self.model.predict(sents)
        return [[label.value for label in s.get_labels()] for s in sents]
