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


# ---------------------------------------------------------------------------
# Tensor-parallel sharding rules (Megatron pattern over a "model" axis)
# ---------------------------------------------------------------------------

TENSOR_PARALLEL_RULES = (
    # (path-substring, kernel-ndim, PartitionSpec dims)
    # attention: column-parallel QKV/pos, row-parallel output proj
    ("q_proj/kernel", (None, "model")),
    ("k_proj/kernel", (None, "model")),
    ("v_proj/kernel", (None, "model")),
    ("pos_proj/kernel", (None, "model")),
    ("q_proj/bias", ("model",)),
    ("k_proj/bias", ("model",)),
    ("v_proj/bias", ("model",)),
    ("out_proj/kernel", ("model", None)),
    # per-head relative-position biases: heads on the model axis
    ("pos_bias_u", ("model", None)),
    ("pos_bias_v", ("model", None)),
    # feed-forward: column- then row-parallel
    ("ffn1/kernel", (None, "model")),
    ("ffn1/bias", ("model",)),
    ("ffn2/kernel", ("model", None)),
    # conformer conv module: pointwise expand/contract + channel-sharded dw
    ("pw1/kernel", (None, None, "model")),
    ("pw1/bias", ("model",)),
    ("dw/kernel", (None, None, "model")),
    ("dw/bias", ("model",)),
    ("pw2/kernel", (None, "model", None)),
)


def param_partition_spec(path, leaf, rules=TENSOR_PARALLEL_RULES):
    """PartitionSpec for one parameter: first rule whose substring
    matches the '/'-joined path and whose rank matches the leaf wins;
    everything else is replicated."""
    from jax.sharding import PartitionSpec as P

    for pattern, dims in rules:
        if pattern in path and len(dims) == leaf.ndim:
            return P(*dims)
    return P()


def shard_params_tensor_parallel(params, mesh, rules=TENSOR_PARALLEL_RULES):
    """Place a param pytree on ``mesh`` with tensor-parallel sharding:
    attention heads and FFN hidden dims split over the "model" axis,
    everything else replicated. Returns the sharded pytree.

    Requires each sharded dim to divide by the model-axis size (pad your
    d_ffn / nhead accordingly — standard Megatron constraint).
    """
    import jax
    from jax.sharding import NamedSharding

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = []
    for path, leaf in flat:
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        spec = param_partition_spec(name, leaf, rules)
        out.append(jax.device_put(leaf, NamedSharding(mesh, spec)))
    return jax.tree_util.tree_unflatten(treedef, out)
