"""Export a trained model for Pretrained/from_hparams loading.

Capability parity with the reference's ``speechbrain/utils/pretrained.py``
(save_for_pretrained at pretrained.py:16): recover the best checkpoint
and copy each pretrainer-loadable file to the pretrainer's paths, so the
experiment directory doubles as a ``Pretrained.from_hparams`` source.
"""

import shutil
from pathlib import Path


def save_for_pretrained(hparams, min_key=None, max_key=None,
                        ckpt_predicate=None, pretrainer_key="pretrainer",
                        checkpointer_key="checkpointer"):
    """Copy the best checkpoint's files to the pretrainer targets
    (reference pretrained.py:16)."""
    if pretrainer_key not in hparams:
        raise ValueError(
            f"hparams must contain a pretrainer under {pretrainer_key!r}"
        )
    if checkpointer_key not in hparams:
        raise ValueError(
            f"hparams must contain a checkpointer under {checkpointer_key!r}"
        )
    pretrainer = hparams[pretrainer_key]
    checkpointer = hparams[checkpointer_key]
    ckpt = checkpointer.find_checkpoint(
        min_key=min_key, max_key=max_key, ckpt_predicate=ckpt_predicate
    )
    if ckpt is None:
        raise RuntimeError("no checkpoint found to export")
    for name, target in pretrainer.loadables.items():
        src = Path(ckpt.path) / f"{name}.ckpt"
        if not src.exists():
            continue
        dst = Path(pretrainer.paths.get(name, src))
        dst.parent.mkdir(parents=True, exist_ok=True)
        if src != dst:
            shutil.copy(src, dst)
