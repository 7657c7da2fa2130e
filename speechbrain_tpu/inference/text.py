"""Text-processing inference interfaces.

Capability parity with the reference's ``speechbrain/inference/text.py``
(GraphemeToPhoneme :27, GPT/Llama ResponseGenerator :222/:341).
"""

import jax.numpy as jnp
import numpy as np

from speechbrain_tpu.inference.interfaces import Pretrained


class GraphemeToPhoneme(Pretrained):
    """Word/sentence G2P (reference text.py:27)."""

    HPARAMS_NEEDED = ["grapheme_encoder", "phoneme_encoder"]
    MODULES_NEEDED = ["model"]

    @property
    def phonemes(self):
        return list(self.hparams.phoneme_encoder.lab2ind.keys())

    def g2p(self, text):
        """Text -> list of phonemes (greedy decode)."""
        g_enc = self.hparams.grapheme_encoder
        p_enc = self.hparams.phoneme_encoder
        seq = g_enc.encode_sequence_array(list(text.lower()))
        tokens = jnp.asarray(seq)[None]
        bos = p_enc.get_bos_index() if hasattr(p_enc, "get_bos_index") else 0
        prefix = jnp.asarray([[bos]], jnp.int32)
        out_phonemes = []
        for _ in range(len(text) * 2 + 5):
            logp = self.apply("model", tokens, jnp.ones(1), prefix)
            nxt = int(jnp.argmax(logp[0, -1]))
            if hasattr(p_enc, "get_eos_index") and nxt == p_enc.get_eos_index():
                break
            out_phonemes.append(p_enc.decode_ind(nxt))
            prefix = jnp.concatenate(
                [prefix, jnp.asarray([[nxt]], jnp.int32)], axis=1
            )
        return out_phonemes

    def __call__(self, text):
        if isinstance(text, list):
            return [self.g2p(t) for t in text]
        return self.g2p(text)


class ResponseGenerator(Pretrained):
    """Dialogue response generation base (reference text.py:222)."""

    MODULES_NEEDED = []

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.history = []

    def generate_response(self, turn):
        """Append a user turn, generate the reply with the wrapped LM."""
        self.history.append(turn)
        lm = self.hparams.lm  # e.g. integrations.huggingface.gpt.GPT
        tokenizer = self.hparams.lm_tokenizer
        prompt = " ".join(self.history)
        ids = jnp.asarray([tokenizer.encode(prompt)], jnp.int32)
        out = lm.generate(ids)
        reply = tokenizer.decode(np.asarray(out[0, ids.shape[1]:]).tolist())
        self.history.append(reply)
        return reply


class GPTResponseGenerator(ResponseGenerator):
    """GPT-backed responder (reference text.py:222)."""


class LlamaResponseGenerator(ResponseGenerator):
    """Llama-backed responder (reference text.py:341). Requires a flax
    llama implementation; the wrapper contract is identical."""
