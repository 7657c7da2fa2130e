"""SpeechLLMASR end-to-end over tiny synthetic modules (reference
inference/ASR.py:1366): audio feats are projected into a toy LLM's
embedding space; the LLM is rigged so the audio prefix determines the
emitted tokens — proving the multimodal fusion + jitted greedy
generation path works."""

import numpy as np

import jax
import jax.numpy as jnp

from speechbrain_tpu.inference.ASR import (
    SpeechLLMASR,
    SpeechLLMGreedySearcher,
)

VOCAB, D, EOS, BOS = 8, 4, 0, 1


class ToyTokenizer:
    """Minimal HF-tokenizer surface used by SpeechLLMASR."""

    def __call__(self, text, add_special_tokens=False):
        return {"input_ids": [3, 4]}  # fixed prompt ids

    def convert_tokens_to_ids(self, token):
        return {"<|start_of_audio|>": 5, "<|end_of_audio|>": 6}[token]

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(str(i) for i in ids)


class ToyLLM:
    """Embedding table + a forward whose next-token logits follow the MEAN
    of the input embeddings: the audio prefix steers the output."""

    def __init__(self):
        rng = np.random.default_rng(0)
        self.table = jnp.asarray(rng.standard_normal((VOCAB, D)), jnp.float32)
        self.tokenizer = ToyTokenizer()

    def embed_tokens(self, ids):
        return jnp.take(self.table, jnp.asarray(ids), axis=0)

    def forward_embeds(self, embeds):
        # causal-ish: logits at position t from the running mean up to t
        csum = jnp.cumsum(embeds, axis=1)
        denom = jnp.arange(1, embeds.shape[1] + 1)[None, :, None]
        ctx = csum / denom
        return jnp.einsum("btd,vd->btv", ctx, self.table)


def test_speechllm_asr_transcribe_batch():
    llm = ToyLLM()
    searcher = SpeechLLMGreedySearcher(
        llm_embeds_fn=llm.forward_embeds,
        embed_fn=llm.embed_tokens,
        eos_index=EOS,
        max_new_tokens=6,
    )
    modules = {
        "speech_encoder": lambda wavs, lens: jnp.tile(
            jnp.mean(wavs, axis=-1)[:, None, None], (1, 10, D)
        ),
        "feat_downsampler": lambda feats: feats[:, ::2],
        "proj": lambda feats: feats * 0.1,
        "llm": llm,
        "normalize": lambda wavs, lens: wavs,
        "searcher": searcher,
    }
    hparams = {"bos_index": BOS, "eos_index": EOS, "prompt": "transcribe:"}
    asr = SpeechLLMASR(modules=modules, hparams=hparams)

    wavs = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 1600)), jnp.float32
    )
    words, tokens = asr.transcribe_batch(wavs, jnp.ones(2))
    assert len(words) == 2 and len(tokens) == 2
    for t in tokens:
        assert len(t) <= 6 and EOS not in t


def test_speechllm_greedy_searcher_stops_at_eos():
    llm = ToyLLM()
    # force eos immediately: logits always peak at EOS
    def always_eos(embeds):
        logits = jnp.full(embeds.shape[:2] + (VOCAB,), -5.0)
        return logits.at[..., EOS].set(5.0)

    searcher = SpeechLLMGreedySearcher(
        llm_embeds_fn=always_eos, embed_fn=llm.embed_tokens,
        eos_index=EOS, max_new_tokens=5,
    )
    embds = jnp.zeros((3, 4, D))
    hyps, _ = searcher(embds, None, None)
    assert hyps == [[], [], []]
