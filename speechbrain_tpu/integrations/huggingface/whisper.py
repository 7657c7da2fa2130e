"""Whisper wrapper (Flax).

Capability parity with the reference's
``speechbrain/integrations/huggingface/whisper.py`` (Whisper :665):
encoder-only feature mode or full seq2seq with log-mel frontend and
greedy/beam decoding hooks for the toolkit's searchers.
"""

import jax
import jax.numpy as jnp
import numpy as np

from speechbrain_tpu.integrations.huggingface.huggingface import (
    HFTransformersInterface,
)


class Whisper(HFTransformersInterface):
    """Pretrained Whisper: ``forward_encoder(mel)`` and
    ``forward_decoder(enc, tokens)``; mel extraction included.

    Arguments mirror the reference: encoder_only, freeze, freeze_encoder.
    """

    def __init__(self, source, save_path="", sampling_rate=16000,
                 encoder_only=False, freeze=False, freeze_encoder=False,
                 output_attentions=False, config_only=False,
                 tokenizer_source=None, **kwargs):
        import transformers

        cls = (
            transformers.FlaxWhisperForConditionalGeneration
            if not encoder_only
            else transformers.FlaxWhisperModel
        )
        super().__init__(
            source, save_path=save_path, freeze=freeze, model_class=cls,
            with_processor=not config_only, config_only=config_only, **kwargs,
        )
        self.sampling_rate = sampling_rate
        self.encoder_only = encoder_only
        self.freeze_encoder = freeze_encoder
        self._mel = None
        if self.processor is None:
            # build + warm the fallback mel frontend EAGERLY: STFT
            # memoizes its DFT matrices on first call, and a first call
            # under jit would cache leaked tracers
            from speechbrain_tpu.lobes.features import Fbank

            self._mel = Fbank(
                n_mels=80, n_fft=400, hop_length=10, win_length=25
            )
            self._mel(jnp.zeros((1, 400), jnp.float32))
        self.tokenizer = None
        try:
            self.tokenizer = transformers.WhisperTokenizer.from_pretrained(
                tokenizer_source or source
            )
        except Exception:
            pass  # offline / no tokenizer files: caller may set one

    def _log_mel(self, wav):
        """Whisper-style 80-bin log-mel (fallback when no processor)."""
        if self.processor is not None:
            # AutoProcessor wraps the extractor; AutoFeatureExtractor IS it
            fe = getattr(self.processor, "feature_extractor",
                         self.processor)
            feats = fe(
                np.asarray(wav), sampling_rate=self.sampling_rate,
                return_tensors="np",
            )["input_features"]
            return jnp.asarray(feats)
        from speechbrain_tpu.lobes.features import Fbank

        if self._mel is None:
            self._mel = Fbank(n_mels=80, n_fft=400, hop_length=10, win_length=25)
        mel = jnp.moveaxis(self._mel(wav), 1, 2)  # (B, 80, T)
        # Whisper's encoder demands exactly max_source_positions*2 frames
        # (3000 = 30 s); pad with the log-mel floor or trim
        target = 2 * self.model.config.max_source_positions
        T = mel.shape[-1]
        if T < target:
            floor = jnp.min(mel, axis=(1, 2), keepdims=True)
            pad = jnp.broadcast_to(
                floor, mel.shape[:2] + (target - T,)
            )
            mel = jnp.concatenate([mel, pad], axis=-1)
        elif T > target:
            mel = mel[..., :target]
        return mel

    def forward_encoder(self, wav):
        mel = self._log_mel(wav)
        module = (
            self.model.get_encoder() if hasattr(self.model, "get_encoder") else self.model
        )
        out = self.model.encode(input_features=mel, params=self.params)
        enc = out.last_hidden_state
        if self.freeze or self.freeze_encoder:
            enc = jax.lax.stop_gradient(enc)
        return enc

    def forward_decoder(self, encoder_out, tokens):
        out = self.model.decode(
            decoder_input_ids=tokens,
            encoder_outputs=(encoder_out,),
            params=self.params,
        )
        logits = out.logits if hasattr(out, "logits") else out.last_hidden_state
        if self.freeze:
            logits = jax.lax.stop_gradient(logits)
        return logits

    def init_decode_cache(self, batch_size, max_length, encoder_out):
        """Flax KV cache for incremental decoding (batch-leading leaves,
        so beam search can permute hypotheses with an axis-0 gather)."""
        return self.model.init_cache(
            batch_size, max_length, (encoder_out,)
        )

    def forward_decoder_step(self, encoder_out, tokens_t, cache, position):
        """Decode ONE token with the KV cache: tokens_t (B,) ->
        (logits (B, V), new_cache). O(enc_T + position) per step."""
        out = self.model.decode(
            decoder_input_ids=tokens_t[:, None],
            encoder_outputs=(encoder_out,),
            past_key_values=cache,
            params=self.params,
            decoder_position_ids=jnp.full(
                (tokens_t.shape[0], 1), position, jnp.int32
            ),
        )
        logits = out.logits[:, 0]
        if self.freeze:
            logits = jax.lax.stop_gradient(logits)
        return logits, out.past_key_values

    def __call__(self, wav, decoder_input_ids=None):
        enc = self.forward_encoder(wav)
        if self.encoder_only or decoder_input_ids is None:
            return enc
        return enc, self.forward_decoder(enc, decoder_input_ids)
