"""HDF5-backed cache for expensive data transforms.

Capability parity with the reference's
``speechbrain/integrations/hdf5/cached_item.py``
(CachedHDF5DynamicItem at cached_item.py:16). h5py is not bundled in
this environment, so the import is lazy: constructing the item without
h5py installed raises an ImportError naming the dependency.
"""

from pathlib import Path

from speechbrain_tpu.utils.data_pipeline import CachedDynamicItem
from speechbrain_tpu.utils.importutils import LazyModule

h5py = LazyModule("h5py")


class CachedHDF5DynamicItem(CachedDynamicItem):
    """CachedDynamicItem storing every result in one HDF5 file — a single
    container beats one-file-per-id for filesystem metadata pressure on
    large corpora (reference cached_item.py:16)."""

    def __init__(
        self,
        cache_location,
        file_mode="a",
        cache_filename="cache.hdf5",
        compression=None,
        *args,
        **kwargs,
    ):
        super().__init__(cache_location, *args, **kwargs)
        self.file_mode = file_mode
        self.compression = compression
        self.cache_filename = Path(cache_filename)
        self.hdf5file = h5py.File(self.hdf5_path, file_mode)

    @property
    def hdf5_path(self):
        return Path(self.cache_location) / self.cache_filename

    def _is_cached(self, uid):
        return uid in self.hdf5file

    def _load(self, uid):
        return self.hdf5file[uid][:]

    def _cache(self, result, uid):
        self.hdf5file.create_dataset(
            uid, data=result, compression=self.compression
        )

    def __getstate__(self):
        state = self.__dict__.copy()
        state.pop("hdf5file", None)
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)
        self.hdf5file = h5py.File(self.hdf5_path, self.file_mode)

    def close(self):
        """Close the HDF5 handle (flushes pending writes)."""
        if getattr(self, "hdf5file", None) is not None:
            self.hdf5file.close()
            self.hdf5file = None
