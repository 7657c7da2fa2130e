"""HDF5-backed caching for data pipelines (requires h5py)."""

from speechbrain_tpu.integrations.hdf5.cached_item import (  # noqa: F401
    CachedHDF5DynamicItem,
)
