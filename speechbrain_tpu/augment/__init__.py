"""Data augmentation: orchestrator + time/freq-domain perturbations."""

from speechbrain_tpu.augment.augmenter import Augmenter  # noqa: F401
