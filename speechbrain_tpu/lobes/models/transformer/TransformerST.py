"""Transformer for speech translation.

Capability parity with the reference's
``speechbrain/lobes/models/transformer/TransformerST.py`` (TransformerST):
TransformerASR plus an optional CTC branch over an intermediate encoder
layer and an auxiliary ASR decoder for multitask ST.
"""

import flax.linen as nn
import jax.numpy as jnp

from speechbrain_tpu.lobes.models.transformer.Transformer import (
    TransformerDecoder,
    get_lookahead_mask,
)
from speechbrain_tpu.lobes.models.transformer.TransformerASR import TransformerASR


class TransformerST(TransformerASR):
    """Speech translation transformer (reference TransformerST.py).

    ``__call__(src, tgt)`` translates; ``forward_asr(tgt_asr, enc)`` runs
    the auxiliary ASR decoder for multitask training; ``forward_mt`` runs
    text->text over encoded source text.
    """

    asr_decoder_layers: int = 0
    ctc_weight: float = 0.0

    def setup(self):
        super().setup()
        if self.asr_decoder_layers > 0:
            self.asr_decoder = TransformerDecoder(
                num_layers=self.asr_decoder_layers,
                nhead=self.nhead,
                d_ffn=self.d_ffn,
                d_model=self.d_model,
                name="asr_decoder",
            )

    def init_full(self, src, tgt, tgt_asr=None, train=False):
        """Trace every branch so ``init(..., method='init_full')`` yields a
        single parameter tree covering ST + auxiliary ASR decoding."""
        enc, dec = self(src, tgt, train=train)
        asr = None
        if self.asr_decoder_layers > 0:
            asr = self.forward_asr(
                tgt if tgt_asr is None else tgt_asr, enc, train=train
            )
        return enc, dec, asr

    def forward_asr(self, tgt_asr, encoder_out, enc_len=None, train=False):
        """Auxiliary ASR decoding branch for multitask ST."""
        emb = self.custom_tgt_module(tgt_asr)
        emb = emb + self.pos_enc_dec(emb)
        out, _, _ = self.asr_decoder(
            emb, encoder_out, tgt_mask=get_lookahead_mask(tgt_asr.shape[1]),
            train=train,
        )
        return out

    def forward_mt(self, src_tokens, tgt, train=False):
        """Machine-translation branch over embedded source text."""
        src = self.custom_tgt_module(src_tokens)
        src = src + self.pos_enc_dec(src)
        enc, _ = self.encoder(src, train=train)
        emb = self.custom_tgt_module(tgt)
        emb = emb + self.pos_enc_dec(emb)
        out, _, _ = self.decoder(
            emb, enc, tgt_mask=get_lookahead_mask(tgt.shape[1]), train=train
        )
        return out
