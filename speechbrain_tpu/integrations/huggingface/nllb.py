"""NLLB wrapper (reference
``speechbrain/integrations/huggingface/nllb.py``): the HF NLLB models
load with the mBART architecture, so the wrapper inherits
:class:`~speechbrain_tpu.integrations.huggingface.mbart.mBART`
verbatim — used as the text decoder of speech-translation stacks."""

from speechbrain_tpu.integrations.huggingface.mbart import mBART


class NLLB(mBART):
    """NLLB text decoder over precomputed speech-encoder states
    (reference nllb.py:16). Same call surface as mBART; only the
    default target language differs.

    Arguments
    ---------
    source : str
        HF hub id, e.g. "facebook/nllb-200-distilled-600M".
    save_path : str
        Snapshot cache directory.
    target_lang : str
        NLLB language code (default fra_Latn).
    """

    def __init__(self, source, save_path="", freeze=True,
                 target_lang="fra_Latn", decoder_only=True,
                 config_only=False, **kwargs):
        super().__init__(
            source, save_path, freeze=freeze, target_lang=target_lang,
            decoder_only=decoder_only, config_only=config_only, **kwargs,
        )
