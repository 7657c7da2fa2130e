"""Data IO: dynamic-item datasets, padded batches, samplers, encoders."""

from speechbrain_tpu.dataio.dataset import (  # noqa: F401
    DynamicItemDataset,
    FilteredSortedDynamicItemDataset,
)
from speechbrain_tpu.dataio.batch import PaddedBatch, PaddedData  # noqa: F401
from speechbrain_tpu.dataio.dataio import (  # noqa: F401
    length_to_mask,
    load_data_json,
    load_data_csv,
    read_audio,
    write_audio,
)
