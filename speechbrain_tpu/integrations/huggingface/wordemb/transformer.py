"""Transformer-LM word embeddings (reference
``speechbrain/integrations/huggingface/wordemb/transformer.py``
TransformerWordEmbeddings :18): per-word contextual embeddings from the
summed hidden states of selected layers of an HF encoder (BERT-style),
via the Flax model classes."""

import numpy as np

from speechbrain_tpu.utils.logger import get_logger

logger = get_logger(__name__)


def _last_n_layers(count):
    return slice(-count, None)


class MissingTransformersError(Exception):
    """Raised when HF transformers is unavailable (reference :263)."""

    def __init__(self):
        super().__init__("This module requires HuggingFace transformers")


def _get_model(identifier):
    try:
        import transformers
    except ImportError as e:
        raise MissingTransformersError() from e
    return transformers.FlaxAutoModel.from_pretrained(
        identifier, output_hidden_states=True, from_pt=True
    )


def _get_tokenizer(identifier):
    try:
        import transformers
    except ImportError as e:
        raise MissingTransformersError() from e
    return transformers.AutoTokenizer.from_pretrained(identifier)


class TransformerWordEmbeddings:
    """Word embeddings from an HF masked LM (reference transformer.py:18).

    Arguments
    ---------
    model : str | Flax model
        HF hub id, or a constructed model (must output hidden states).
    tokenizer : optional tokenizer (required when ``model`` is not a
        hub id; must be a fast tokenizer exposing ``word_ids``).
    layers : int | slice | list
        Which hidden-state layers to sum (default: last 4).
    """

    MSG_WORD = "'word' should be a word or the index of a word"
    DEFAULT_LAYERS = 4

    def __init__(self, model, tokenizer=None, layers=None):
        if layers is None:
            layers = _last_n_layers(self.DEFAULT_LAYERS)
        elif isinstance(layers, int):
            layers = _last_n_layers(layers)
        elif isinstance(layers, list):
            layers = np.asarray(layers)
        self.layers = layers
        if isinstance(model, str):
            if tokenizer is None:
                tokenizer = model
            model = _get_model(model)
        if isinstance(tokenizer, str):
            tokenizer = _get_tokenizer(tokenizer)
        elif tokenizer is None:
            raise ValueError(
                "A tokenizer is required when passing a constructed model"
            )
        self.model = model
        self.tokenizer = tokenizer

    def __call__(self, sentence, word=None):
        """embedding(sentence, word) when a word is given, else
        embeddings(sentence) (reference :111)."""
        if word is not None:
            return self.embedding(sentence, word)
        return self.embeddings(sentence)

    def _run(self, encoded):
        import jax.numpy as jnp

        out = self.model(
            input_ids=jnp.asarray(encoded["input_ids"]),
            attention_mask=jnp.asarray(encoded["attention_mask"]),
            output_hidden_states=True,
        )
        return jnp.stack(out.hidden_states)

    def embedding(self, sentence, word):
        """Embedding of one word (first occurrence) in a sentence."""
        encoded = self.tokenizer(sentence)
        if isinstance(word, str):
            idx = sentence.split(" ").index(word)
        elif isinstance(word, int):
            idx = word
        else:
            raise ValueError(self.MSG_WORD)
        states = self._run(
            self.tokenizer(sentence, return_tensors="np")
        )
        token_ids_word = np.where(
            np.array(encoded.word_ids()) == idx
        )[0]
        return self._get_hidden_states(states, token_ids_word).mean(axis=0)

    def embeddings(self, sentence):
        """All word-position embeddings of a sentence."""
        encoded = self.tokenizer(sentence)
        states = self._run(self.tokenizer(sentence, return_tensors="np"))
        token_ids_word = np.asarray(
            [i for i, w in enumerate(encoded.word_ids()) if w is not None]
        )
        return self._get_hidden_states(states, token_ids_word)

    def batch_embeddings(self, sentences):
        """(B, T, E) embeddings for a batch of sentences (special
        tokens trimmed)."""
        encoded = self.tokenizer(
            sentences, padding=True, return_tensors="np"
        )
        states = self._run(encoded)
        return self._get_hidden_states(states)

    def _get_hidden_states(self, states, token_ids_word=None):
        output = states[self.layers].sum(0).squeeze()
        if token_ids_word is not None:
            output = output[np.asarray(token_ids_word)]
        else:
            output = output[:, 1:-1, :]
        return output
