"""spaCy pipeline wrapper (reference
``speechbrain/integrations/nlp/spacy_pipeline.py``; SpacyPipeline at
spacy_pipeline.py:50). spaCy is not bundled in this environment — the
class constructs only when it is installed."""

from typing import Iterable, List, Union

from speechbrain_tpu.utils.importutils import LazyModule

spacy = LazyModule("spacy")


def _as_sentence(sentence: Union[str, List[str]]) -> str:
    """Join token lists into a plain sentence string."""
    if isinstance(sentence, str):
        return sentence
    return " ".join(sentence)


class SpacyPipeline:
    """Lemmatization/POS pipeline over a spaCy model.

    ``from_name("fr_core_news_md")`` loads a model;
    ``lemmatize(sentences)`` returns per-sentence lemma lists.
    """

    def __init__(self, nlp):
        self.nlp = nlp

    @classmethod
    def from_name(cls, name, exclude=("parser", "ner")):
        return cls(spacy.load(name, exclude=list(exclude)))

    def __call__(self, sentences: Iterable[Union[str, List[str]]]):
        return list(self.nlp.pipe(_as_sentence(s) for s in sentences))

    def lemmatize(self, sentences):
        """Per-sentence lists of lemmas."""
        return [
            [tok.lemma_ for tok in doc if not tok.is_space]
            for doc in self(sentences)
        ]
