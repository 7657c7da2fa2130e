"""speechbrain_tpu — a TPU-native (JAX/XLA/Pallas) conversational-AI toolkit.

A from-scratch framework with the capabilities of SpeechBrain (reference:
speechbrain/speechbrain v1.1.0), designed TPU-first:

* functional core — params/opt-state are pytrees, the train step is one
  jit-compiled donated-buffer function,
* data parallelism (and beyond) is expressed with ``jax.sharding.Mesh`` +
  ``NamedSharding`` instead of DDP module wrappers,
* hot DSP ops (mel frontend, attention) have fused Pallas TPU kernels,
* decoders are fixed-shape ``lax.while_loop`` programs, not Python loops.

User-facing contracts mirror the reference (see SURVEY.md):
``Brain``-style training with ``compute_forward``/``compute_objectives``
overrides, ``DynamicItemDataset`` pipelines, padded relative-length batches,
directory-based checkpointing, and ``Pretrained``-style inference interfaces.
"""

__version__ = "0.1.0"

from speechbrain_tpu.utils.quirks import apply_quirks as _apply_quirks

_apply_quirks()  # XLA compile cache etc. (reference core.py:52 idiom)

from speechbrain_tpu import utils  # noqa: F401
from speechbrain_tpu import dataio  # noqa: F401
from speechbrain_tpu.core import Brain, Stage, create_experiment_directory, parse_arguments  # noqa: F401
