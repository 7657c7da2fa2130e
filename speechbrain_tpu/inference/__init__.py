"""Inference interfaces: Pretrained base + task-specific APIs."""

from speechbrain_tpu.inference.interfaces import Pretrained, foreign_class  # noqa: F401
