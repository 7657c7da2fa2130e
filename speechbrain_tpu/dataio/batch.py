"""Batch collation with right-padding and relative lengths.

Capability parity with the reference's ``speechbrain/dataio/batch.py``
(PaddedBatch :24, PaddedData namedtuple, BatchsizeGuesser :251), with one
TPU-first addition: ``pad_to_multiple`` quantizes padded time axes to a
bucket multiple so XLA sees few distinct shapes (compile-cache discipline —
see SURVEY.md §7 "Static shapes discipline").

PaddedData holds (data, lengths) where lengths are *relative* (len/max_len),
the toolkit-wide convention.
"""

import collections

import numpy as np

PaddedData = collections.namedtuple("PaddedData", ["data", "lengths"])


def _is_arrayable(value):
    if isinstance(value, (np.ndarray, np.generic, float, int, bool)):
        return True
    # lists/tuples of numbers
    if isinstance(value, (list, tuple)) and len(value) and isinstance(
        value[0], (int, float, np.ndarray, np.generic)
    ):
        return True
    # jax arrays / torch tensors expose __array__
    return hasattr(value, "__array__")


class PaddedBatch:
    """Collates a list of example dicts; pads array-like values.

    Arguments
    ---------
    examples : list of dict
    padded_keys : list, optional
        Keys to pad; default: every array-like value.
    device_prep_keys : list, optional
        Keys to transfer with ``to_device``; default: all padded keys.
    padding_func : callable
        Performs padding+stacking; default pads right with a value.
    padding_kwargs : dict
        Extra args to the padding func (e.g. {"value": -1}).
    nonpadded_stack : bool
        Stack non-padded array-likes when shapes match.
    pad_to_multiple : int or dict
        Quantize the padded length axis up to a multiple (global int or
        per-key dict), bounding the number of distinct compiled shapes.

    Example
    -------
    >>> batch = PaddedBatch([
    ...     {"id": "ex1", "val": np.array([1.0])},
    ...     {"id": "ex2", "val": np.array([2.0, 1.0])},
    ... ])
    >>> batch.id
    ['ex1', 'ex2']
    >>> batch.val.data.shape
    (2, 2)
    >>> [round(float(x), 2) for x in batch.val.lengths]
    [0.5, 1.0]
    """

    def __init__(
        self,
        examples,
        padded_keys=None,
        device_prep_keys=None,
        padding_func=None,
        padding_kwargs=None,
        nonpadded_stack=True,
        pad_to_multiple=1,
    ):
        from speechbrain_tpu.utils.data_utils import batch_pad_right, round_up

        padding_func = padding_func or batch_pad_right
        padding_kwargs = padding_kwargs or {}
        self.__length = len(examples)
        self.__keys = list(examples[0].keys())
        self.__padded_keys = []
        self.__device_prep_keys = []
        for key in self.__keys:
            values = [example[key] for example in examples]
            if (padded_keys is not None and key in padded_keys) or (
                padded_keys is None and _is_arrayable(values[0])
            ):
                arrays = [np.asarray(v) for v in values]
                mult = (
                    pad_to_multiple.get(key, 1)
                    if isinstance(pad_to_multiple, dict)
                    else (pad_to_multiple or 1)
                )
                if mult > 1 and arrays[0].ndim >= 1:
                    # Quantize the padded time axis to the bucket boundary so
                    # XLA compiles a small set of shapes. Relative lengths are
                    # computed against the bucketed max, keeping masks exact.
                    target_t = round_up(max(a.shape[0] for a in arrays), mult)
                    pad_value = padding_kwargs.get("value", 0)
                    padded_arrays, lengths = [], []
                    for a in arrays:
                        pads = [(0, target_t - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
                        padded_arrays.append(
                            np.pad(a, pads, mode="constant", constant_values=pad_value)
                        )
                        lengths.append(a.shape[0] / target_t)
                    padded = PaddedData(
                        np.stack(padded_arrays), np.asarray(lengths, dtype=np.float32)
                    )
                else:
                    padded = PaddedData(*padding_func(arrays, **padding_kwargs))
                setattr(self, key, padded)
                self.__padded_keys.append(key)
                if device_prep_keys is None or key in device_prep_keys:
                    self.__device_prep_keys.append(key)
            else:
                if nonpadded_stack and _is_arrayable(values[0]):
                    arrays = [np.asarray(v) for v in values]
                    if len({a.shape for a in arrays}) == 1:
                        values = np.stack(arrays)
                setattr(self, key, values)
                if device_prep_keys is not None and key in device_prep_keys:
                    self.__device_prep_keys.append(key)

    def __len__(self):
        return self.__length

    def __getitem__(self, key):
        if key in self.__keys:
            return getattr(self, key)
        raise KeyError(f"Batch doesn't have key: {key}")

    def __iter__(self):
        """Iterate over keys' values in order, supporting unpacking:

        >>> batch = PaddedBatch([{"x": np.array([1.0]), "y": np.array([2.0])}])
        >>> x, y = batch
        >>> x.data.shape
        (1, 1)
        """
        return iter(getattr(self, key) for key in self.__keys)

    @property
    def batchsize(self):
        return self.__length

    @property
    def padded_keys(self):
        return list(self.__padded_keys)

    def as_dict(self):
        return {key: getattr(self, key) for key in self.__keys}

    def numpy(self):
        """Return {key: PaddedData-of-numpy or raw value} (host side)."""
        return self.as_dict()

    def to_device(self, sharding=None):
        """Device-put all device-prep keys; returns a dict pytree of
        jnp arrays ready for a jitted step. With a ``NamedSharding`` the
        transfer shards the batch over the mesh's data axis directly."""
        import jax

        out = {}
        for key in self.__keys:
            value = getattr(self, key)
            if key in self.__device_prep_keys and isinstance(value, PaddedData):
                data = jax.device_put(np.asarray(value.data), sharding)
                lengths = jax.device_put(np.asarray(value.lengths), sharding)
                out[key] = PaddedData(data, lengths)
            else:
                out[key] = value
        return out


class BatchsizeGuesser:
    """Guess the batch size from whatever the dataloader yields."""

    def __init__(self):
        self.method = None

    def __call__(self, batch):
        try:
            return self.method(batch)
        except TypeError:
            return self.find_suitable_method(batch)

    def find_suitable_method(self, batch):
        candidates = [
            self.attr_based,
            self.dict_based,
            self.len_of_first,
            self.len_of_batch,
        ]
        for cand in candidates:
            try:
                bs = cand(batch)
                self.method = cand
                return bs
            except Exception:
                continue
        self.method = lambda b: 1
        return 1

    def attr_based(self, batch):
        return batch.batchsize

    def dict_based(self, batch):
        first = next(iter(batch.values()))
        return len(first)

    def len_of_first(self, batch):
        return len(batch[0])

    def len_of_batch(self, batch):
        return len(batch)
