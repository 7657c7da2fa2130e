"""Fairseq wav2vec wrappers (reference
``speechbrain/lobes/models/fairseq_wav2vec.py``). Deprecated upstream in
favour of the HuggingFace wrappers; fairseq is not bundled here. Use
:mod:`speechbrain_tpu.integrations.huggingface.wav2vec2` (Flax) or the
native :mod:`speechbrain_tpu.lobes.models.wav2vec` instead."""

import warnings

warnings.warn(
    "fairseq wav2vec wrappers are deprecated; use "
    "speechbrain_tpu.integrations.huggingface.wav2vec2 or "
    "speechbrain_tpu.lobes.models.wav2vec",
    DeprecationWarning,
    stacklevel=2,
)


class FairseqWav2Vec2:
    """Unavailable: fairseq is not installed (deprecated path)."""

    def __init__(self, *args, **kwargs):
        raise ImportError(
            "fairseq is not installed and this integration is deprecated; "
            "use the HuggingFace or native wav2vec2 implementations."
        )


class FairseqWav2Vec1(FairseqWav2Vec2):
    """Unavailable: fairseq is not installed (deprecated path)."""
