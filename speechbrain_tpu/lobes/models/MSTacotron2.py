"""Zero-shot multi-speaker Tacotron2.

Capability parity with the reference's
``speechbrain/lobes/models/MSTacotron2.py``: Tacotron2 conditioned on a
speaker embedding injected after the text encoder.
"""

import flax.linen as nn
import jax.numpy as jnp

from speechbrain_tpu.lobes.models.Tacotron2 import Tacotron2
from speechbrain_tpu.nnet.linear import Linear


class MSTacotron2(Tacotron2):
    """Tacotron2 + speaker conditioning (reference MSTacotron2.py).

    ``__call__(text, text_lens, mels, spk_embs)``: the speaker embedding
    is projected and added to every encoder state.
    """

    spk_emb_size: int = 192

    def setup(self):
        super().setup()
        self.spk_proj = Linear(self.encoder_embedding_dim, name="spk_proj")

    def _condition(self, memory, spk_embs):
        if spk_embs is None:
            return memory
        if spk_embs.ndim == 3:
            spk_embs = spk_embs[:, 0, :]
        cond = self.spk_proj(spk_embs)[:, None, :]
        return memory + cond

    def __call__(self, text, text_lens, mels, spk_embs=None, train=False):
        # reuse the parent forward but with conditioned memory: replicate
        # its body around the conditioning hook
        import jax

        B, T_mel, _ = mels.shape
        emb = self.embedding(text)
        memory = self.encoder(emb, train=train)
        memory = self._condition(memory, spk_embs)
        processed_memory = self.attn_memory(memory)
        T_enc = memory.shape[1]
        mask = (
            jnp.arange(T_enc)[None, :]
            < jnp.round(text_lens * T_enc)[:, None]
        )
        go_frame = jnp.zeros((B, 1, self.n_mel_channels), mels.dtype)
        dec_inputs = jnp.concatenate([go_frame, mels[:, :-1]], axis=1)
        state = self._init_state(B, T_enc, mels.dtype)

        def body(mdl, carry, mel_in):
            return mdl._decode_step(carry, mel_in, memory, processed_memory, mask)

        scan = nn.scan(
            body,
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
        )
        _, (mel_outs, gates, aligns) = scan(
            self, state, jnp.moveaxis(dec_inputs, 1, 0)
        )
        mel_outs = jnp.moveaxis(mel_outs, 0, 1)
        gates = jnp.moveaxis(gates, 0, 1)
        aligns = jnp.moveaxis(aligns, 0, 1)
        mel_post = mel_outs + self.postnet(mel_outs, train=train)
        return mel_outs, mel_post, gates, aligns
