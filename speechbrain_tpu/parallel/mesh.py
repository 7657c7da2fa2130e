"""Device-mesh construction and sharding helpers.

The TPU-native replacement for the reference's DDP wrapping
(reference core.py:1309 _wrap_distributed): parallelism is a
``jax.sharding.Mesh`` + ``NamedSharding`` annotations; XLA inserts
collectives over ICI (intra-slice) / DCN (cross-slice). The reference
supports data parallelism only (SURVEY.md §2.2); this module also carries
a model axis for tensor-parallel sharding of large layers.
"""

import numpy as np

from speechbrain_tpu.utils.logger import get_logger

logger = get_logger(__name__)


def make_mesh(axis_shapes=None, devices=None):
    """Create a Mesh.

    Arguments
    ---------
    axis_shapes : dict, optional
        e.g. {"data": 8} or {"data": 4, "model": 2}. Default: all devices
        on one "data" axis.
    devices : list, optional
        Devices to use (default jax.devices()).

    Example
    -------
    >>> mesh = make_mesh()  # doctest: +SKIP
    """
    import jax
    from jax.sharding import Mesh

    devices = devices if devices is not None else jax.devices()
    if axis_shapes is None:
        axis_shapes = {"data": len(devices)}
    names = tuple(axis_shapes.keys())
    shape = tuple(axis_shapes.values())
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"Mesh needs {n} devices, have {len(devices)}")
    dev_array = np.asarray(devices[:n]).reshape(shape)
    return Mesh(dev_array, axis_names=names)


def batch_sharding(mesh, axis="data"):
    """NamedSharding putting the leading (batch) dim on ``axis``."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    return NamedSharding(mesh, P(axis))


def replicated(mesh):
    """Fully-replicated NamedSharding."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    return NamedSharding(mesh, P())


def shard_batch(batch, mesh, axis="data"):
    """device_put a pytree of batch arrays sharded over the data axis."""
    import jax

    sharding = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding)
        if hasattr(x, "shape") and x.ndim > 0
        else x,
        batch,
    )


def pad_batch_to_devices(batch, n_devices):
    """Pad the leading dim of every array to a multiple of n_devices
    (so the batch divides evenly across the mesh)."""
    import numpy as _np

    import jax

    def pad(x):
        if not hasattr(x, "shape") or x.ndim == 0:
            return x
        B = x.shape[0]
        rem = (-B) % n_devices
        if rem == 0:
            return x
        pad_width = [(0, rem)] + [(0, 0)] * (x.ndim - 1)
        return _np.pad(_np.asarray(x), pad_width, mode="edge")

    return jax.tree_util.tree_map(pad, batch)
