"""Utilities: dependency graphs, data pipelines, seeding, logging, metrics,
checkpointing, and training helpers."""

from speechbrain_tpu.utils import depgraph  # noqa: F401
from speechbrain_tpu.utils import data_pipeline  # noqa: F401
from speechbrain_tpu.utils import data_utils  # noqa: F401
from speechbrain_tpu.utils import seed  # noqa: F401
from speechbrain_tpu.utils import logger  # noqa: F401
