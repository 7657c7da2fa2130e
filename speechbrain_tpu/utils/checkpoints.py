"""Directory-based checkpointing with per-object hooks and retention.

Capability parity with the reference's ``speechbrain/utils/checkpoints.py``
(Checkpointer :536, register_checkpoint_hooks/mark_as_saver/loader/transfer
:320-476, save_and_keep_only :768, find_checkpoint :841,
recover_if_possible :990, average_checkpoints :1271), rebuilt for JAX:

* a checkpoint is a directory ``CKPT+<timestamp>/`` holding one file per
  registered recoverable plus a ``CKPT.yaml`` meta file;
* pytrees of jax/numpy arrays are (de)serialized with flax msgpack —
  params, optimizer states and mutable batch stats all round-trip as-is;
* arbitrary objects participate via ``@mark_as_saver``/``@mark_as_loader``
  methods, exactly the reference's extension contract;
* retention: ``save_and_keep_only`` with min/max importance keys;
* checkpoint averaging for eval (``average_checkpoints``).

Multi-host: only process 0 writes; all hosts sync before reading.
"""

import collections
import inspect
import os
import pathlib
import shutil
import time
import uuid

import numpy as np
import yaml

from speechbrain_tpu.utils.logger import get_logger

logger = get_logger(__name__)

CKPT_PREFIX = "CKPT"
METAFNAME = f"{CKPT_PREFIX}.yaml"
PARAMFILE_EXT = ".ckpt"

Checkpoint = collections.namedtuple("Checkpoint", ["path", "meta", "paramfiles"])
Checkpoint.__doc__ = """A loaded-from-disk checkpoint descriptor.

path: pathlib.Path of the checkpoint dir;
meta: dict from CKPT.yaml (always has "unixtime");
paramfiles: {recoverable_name: Path} of each saved object file.
"""


# ---------------------------------------------------------------------------
# Hook registration
# ---------------------------------------------------------------------------

def mark_as_saver(method):
    """Mark ``method(self, path)`` as the saver for its class."""
    sig = inspect.signature(method)
    try:
        sig.bind(object(), pathlib.Path("testpath"))
    except TypeError:
        raise TypeError("Checkpoint saver must take (self, path)")
    method._speechbrain_saver = True
    return method


def mark_as_loader(method):
    """Mark ``method(self, path, end_of_epoch=bool)`` as the loader."""
    sig = inspect.signature(method)
    try:
        sig.bind(object(), pathlib.Path("testpath"), end_of_epoch=True)
    except TypeError:
        raise TypeError("Checkpoint loader must take (self, path, end_of_epoch)")
    method._speechbrain_loader = True
    return method


def mark_as_transfer(method):
    """Mark ``method(self, path)`` as the parameter-transfer hook (used by
    Pretrainer-style non-strict loading)."""
    sig = inspect.signature(method)
    try:
        sig.bind(object(), pathlib.Path("testpath"))
    except TypeError:
        raise TypeError("Transfer hook must take (self, path)")
    method._speechbrain_transfer = True
    return method


def register_checkpoint_hooks(cls):
    """Class decorator: collect marked saver/loader/transfer methods."""
    global DEFAULT_SAVE_HOOKS, DEFAULT_LOAD_HOOKS, DEFAULT_TRANSFER_HOOKS
    for name, method in cls.__dict__.items():
        if getattr(method, "_speechbrain_saver", False):
            DEFAULT_SAVE_HOOKS[cls] = method
        if getattr(method, "_speechbrain_loader", False):
            DEFAULT_LOAD_HOOKS[cls] = method
        if getattr(method, "_speechbrain_transfer", False):
            DEFAULT_TRANSFER_HOOKS[cls] = method
    return cls


def get_default_hook(obj, default_hooks):
    """Resolve a hook by walking the MRO (subclasses inherit hooks)."""
    for cls in type(obj).__mro__:
        if cls in default_hooks:
            return default_hooks[cls]
    return None


# ---------------------------------------------------------------------------
# Pytree (de)serialization — default hooks for params / opt states
# ---------------------------------------------------------------------------

def save_pytree(tree, path):
    """Serialize a pytree of arrays with flax msgpack."""
    from flax import serialization

    with open(path, "wb") as f:
        f.write(serialization.to_bytes(tree))


def load_pytree(path, target=None):
    """Load a pytree; with a ``target`` the stored leaves are poured into
    the target's structure (shape-checked), else raw nested dicts return."""
    from flax import serialization

    with open(path, "rb") as f:
        data = f.read()
    if target is not None:
        return serialization.from_bytes(target, data)
    return serialization.msgpack_restore(data)


class PytreeRef:
    """Mutable holder making a bare pytree checkpointable by reference.

    The Brain registers ``PytreeRef`` wrappers for params/opt-state so the
    Checkpointer can swap their contents on recovery — the functional
    analogue of torch modules' in-place ``load_state_dict``.
    """

    def __init__(self, tree=None):
        self.tree = tree

    @mark_as_saver
    def _save(self, path):
        save_pytree(self.tree, path)

    @mark_as_loader
    def _load(self, path, end_of_epoch=False):
        self.tree = load_pytree(path, target=self.tree)

    @mark_as_transfer
    def _transfer(self, path):
        self.tree = load_pytree(path, target=self.tree)


DEFAULT_SAVE_HOOKS = {}
DEFAULT_LOAD_HOOKS = {}
DEFAULT_TRANSFER_HOOKS = {}
register_checkpoint_hooks(PytreeRef)


def _is_process_zero():
    try:
        import jax

        return jax.process_index() == 0
    except Exception:
        return True


def _sync_processes():
    try:
        import jax

        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("checkpointer")
    except Exception:
        pass


# ---------------------------------------------------------------------------
# Checkpointer
# ---------------------------------------------------------------------------

class Checkpointer:
    """Saves and recovers registered "recoverables" to checkpoint dirs.

    Arguments
    ---------
    checkpoints_dir : str | Path
    recoverables : dict, optional
        {name: object} registered immediately.
    custom_load_hooks / custom_save_hooks : dict, optional
        {name: fn} overrides per recoverable.
    allow_partial_load : bool
        Tolerate checkpoints missing some recoverables.

    Example
    -------
    >>> import tempfile
    >>> class Counter:
    ...     def __init__(self): self.value = 0
    >>> # (hooks are normally added via @register_checkpoint_hooks)
    """

    def __init__(
        self,
        checkpoints_dir,
        recoverables=None,
        custom_load_hooks=None,
        custom_save_hooks=None,
        allow_partial_load=False,
    ):
        self.checkpoints_dir = pathlib.Path(checkpoints_dir)
        self.recoverables = {}
        self.optional_recoverables = {}
        if recoverables is not None:
            self.add_recoverables(recoverables)
        self.custom_load_hooks = custom_load_hooks or {}
        self.custom_save_hooks = custom_save_hooks or {}
        self.allow_partial_load = allow_partial_load

    def add_recoverable(
        self, name, obj, custom_load_hook=None, custom_save_hook=None, optional_load=False
    ):
        """Register one object under ``name``."""
        self.recoverables[name] = obj
        self.optional_recoverables[name] = optional_load
        if custom_load_hook is not None:
            self.custom_load_hooks[name] = custom_load_hook
        if custom_save_hook is not None:
            self.custom_save_hooks[name] = custom_save_hook

    def add_recoverables(self, recoverables):
        if not hasattr(recoverables, "items"):
            raise ValueError("Recoverables must be a mapping {name: object}")
        for name, obj in recoverables.items():
            self.add_recoverable(name, obj)

    # -- saving --------------------------------------------------------------
    def save_checkpoint(self, meta={}, end_of_epoch=True, name=None, verbosity=True):
        """Save a new checkpoint directory; returns a Checkpoint namedtuple."""
        if name is None:
            ckpt_dir = self._new_checkpoint_dirpath()
        else:
            ckpt_dir = self._custom_checkpoint_dirpath(name)
        saved_meta = None
        if _is_process_zero():
            os.makedirs(ckpt_dir, exist_ok=True)
            saved_meta = self._save_checkpoint_metafile(
                ckpt_dir / METAFNAME, meta, end_of_epoch
            )
            for name_, obj in self.recoverables.items():
                objfname = f"{name_}{PARAMFILE_EXT}"
                savepath = ckpt_dir / objfname
                if name_ in self.custom_save_hooks:
                    self.custom_save_hooks[name_](obj, savepath)
                    continue
                default_hook = get_default_hook(obj, DEFAULT_SAVE_HOOKS)
                if default_hook is None:
                    raise RuntimeError(
                        f"Don't know how to save {type(obj)}. Register default "
                        "hooks with @register_checkpoint_hooks or pass a "
                        "custom_save_hook."
                    )
                default_hook(obj, savepath)
            if verbosity:
                logger.info("Saved a checkpoint in %s", ckpt_dir)
        _sync_processes()
        if saved_meta is None:
            saved_meta = self._load_checkpoint_extra_data(ckpt_dir / METAFNAME)
        paramfiles = {
            name_: ckpt_dir / f"{name_}{PARAMFILE_EXT}"
            for name_ in self.recoverables
        }
        return Checkpoint(ckpt_dir, saved_meta, paramfiles)

    def save_and_keep_only(
        self,
        meta={},
        end_of_epoch=True,
        name=None,
        num_to_keep=1,
        keep_recent=True,
        importance_keys=[],
        max_keys=[],
        min_keys=[],
        ckpt_predicate=None,
        verbosity=True,
    ):
        """Save, then delete checkpoints not in any top-k kept set."""
        self.save_checkpoint(
            meta=meta, end_of_epoch=end_of_epoch, name=name, verbosity=verbosity
        )
        if keep_recent:
            importance_keys = list(importance_keys) + [ckpt_recency]
        self.delete_checkpoints(
            num_to_keep=num_to_keep,
            importance_keys=importance_keys,
            max_keys=max_keys,
            min_keys=min_keys,
            ckpt_predicate=ckpt_predicate,
            verbosity=verbosity,
        )

    # -- finding ---------------------------------------------------------------
    def find_checkpoint(
        self, importance_key=None, max_key=None, min_key=None, ckpt_predicate=None
    ):
        """Return the single best checkpoint (by recency or a meta key)."""
        ckpts = self.find_checkpoints(
            importance_key=importance_key,
            max_key=max_key,
            min_key=min_key,
            ckpt_predicate=ckpt_predicate,
            max_num_checkpoints=1,
        )
        return ckpts[0] if ckpts else None

    def find_checkpoints(
        self,
        importance_key=None,
        max_key=None,
        min_key=None,
        ckpt_predicate=None,
        max_num_checkpoints=None,
    ):
        """Return checkpoints sorted best-first by the given criterion."""
        if sum(x is not None for x in (importance_key, max_key, min_key)) > 1:
            raise ValueError("Provide at most one of importance_key/max_key/min_key")
        if max_key is not None:
            importance_key = lambda ckpt: ckpt.meta[max_key]
            predicate_extension = lambda ckpt: max_key in ckpt.meta
        elif min_key is not None:
            importance_key = lambda ckpt: -ckpt.meta[min_key]
            predicate_extension = lambda ckpt: min_key in ckpt.meta
        else:
            predicate_extension = None
            if importance_key is None:
                importance_key = ckpt_recency
        ckpts = self.list_checkpoints()
        if ckpt_predicate is not None:
            ckpts = [c for c in ckpts if ckpt_predicate(c)]
        if predicate_extension is not None:
            ckpts = [c for c in ckpts if predicate_extension(c)]
        ckpts = sorted(ckpts, key=importance_key, reverse=True)
        if max_num_checkpoints is not None:
            ckpts = ckpts[:max_num_checkpoints]
        return ckpts

    def list_checkpoints(self):
        """All checkpoints under checkpoints_dir."""
        return self._construct_checkpoint_objects(self._list_checkpoint_dirs())

    # -- loading -----------------------------------------------------------------
    def recover_if_possible(
        self, importance_key=None, max_key=None, min_key=None, ckpt_predicate=None
    ):
        """Load the best checkpoint if any exists; returns it (or None)."""
        _sync_processes()
        chosen_ckpt = self.find_checkpoint(
            importance_key, max_key, min_key, ckpt_predicate
        )
        if chosen_ckpt is not None:
            self.load_checkpoint(chosen_ckpt)
        return chosen_ckpt

    def load_checkpoint(self, checkpoint):
        """Run every recoverable's load hook against the checkpoint files."""
        self._call_load_hooks(checkpoint)

    def _call_load_hooks(self, checkpoint):
        end_of_epoch = checkpoint.meta["end-of-epoch"]
        for name, obj in self.recoverables.items():
            try:
                loadpath = checkpoint.paramfiles[name]
            except KeyError:
                if self.allow_partial_load or self.optional_recoverables.get(name):
                    continue
                raise RuntimeError(
                    f"Loading checkpoint from {checkpoint.path}, expected "
                    f"{name} to exist in it."
                )
            if not loadpath.exists():
                if self.allow_partial_load or self.optional_recoverables.get(name):
                    continue
                raise RuntimeError(f"Missing checkpoint file {loadpath}")
            if name in self.custom_load_hooks:
                self.custom_load_hooks[name](obj, loadpath, end_of_epoch)
                continue
            default_hook = get_default_hook(obj, DEFAULT_LOAD_HOOKS)
            if default_hook is None:
                raise RuntimeError(
                    f"Don't know how to load {type(obj)}. Register default "
                    "hooks or pass a custom_load_hook."
                )
            default_hook(obj, loadpath, end_of_epoch)

    # (delete_checkpoints is attached below, after ckpt_recency is defined)

    # -- internals ------------------------------------------------------------------
    def _list_checkpoint_dirs(self):
        if not self.checkpoints_dir.exists():
            return []
        return [
            x
            for x in self.checkpoints_dir.iterdir()
            if Checkpointer._is_checkpoint_dir(x)
        ]

    @staticmethod
    def _construct_checkpoint_objects(checkpoint_dirs):
        checkpoints = []
        for ckpt_dir in checkpoint_dirs:
            with open(ckpt_dir / METAFNAME, encoding="utf-8") as fi:
                meta = yaml.safe_load(fi)
            paramfiles = {}
            for ckptfile in ckpt_dir.iterdir():
                if ckptfile.suffix == PARAMFILE_EXT:
                    paramfiles[ckptfile.stem] = ckptfile
            checkpoints.append(Checkpoint(ckpt_dir, meta, paramfiles))
        return checkpoints

    @staticmethod
    def _is_checkpoint_dir(path):
        path = pathlib.Path(path)
        if not path.is_dir():
            return False
        if not path.name.startswith(CKPT_PREFIX):
            return False
        return (path / METAFNAME).exists()

    def _new_checkpoint_dirpath(self):
        t = time.time()
        stamp = time.strftime("%Y-%m-%d+%H-%M-%S", time.localtime(t))
        suffix_num = 0
        while (
            self.checkpoints_dir / f"{CKPT_PREFIX}+{stamp}+{suffix_num:02d}"
        ).exists():
            suffix_num += 1
        return self.checkpoints_dir / f"{CKPT_PREFIX}+{stamp}+{suffix_num:02d}"

    def _custom_checkpoint_dirpath(self, name):
        return self.checkpoints_dir / f"{CKPT_PREFIX}+{name}"

    def _save_checkpoint_metafile(self, fpath, meta_to_include={}, end_of_epoch=True):
        meta = {"unixtime": time.time(), "end-of-epoch": end_of_epoch}
        meta.update(meta_to_include)
        with open(fpath, "w", encoding="utf-8") as fo:
            fo.write(yaml.dump(_yamlable(meta)))
        return meta

    @staticmethod
    def _delete_checkpoint(checkpoint, verbosity=True):
        if not Checkpointer._is_checkpoint_dir(checkpoint.path):
            raise RuntimeError("Checkpoint does not appear valid for deletion.")
        shutil.rmtree(checkpoint.path)
        if verbosity:
            logger.info("Deleted checkpoint in %s", checkpoint.path)


def _yamlable(obj):
    """Coerce meta values (numpy/jax scalars) to plain python for yaml."""
    if isinstance(obj, dict):
        return {k: _yamlable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_yamlable(v) for v in obj]
    if isinstance(obj, (np.generic,)):
        return obj.item()
    if hasattr(obj, "item") and getattr(obj, "ndim", None) == 0:
        return obj.item()
    return obj


def ckpt_recency(ckpt):
    """Recency importance key (the default retention criterion)."""
    return ckpt.meta["unixtime"]


def _delete_checkpoints_impl(
    self,
    *,
    num_to_keep=1,
    min_keys=None,
    max_keys=None,
    importance_keys=None,
    ckpt_predicate=None,
    verbosity=True,
):
    """Keep the union of top-k checkpoints over every criterion; delete the
    rest (only those passing ckpt_predicate are considered at all)."""
    if importance_keys is None:
        importance_keys = []
    potential = self.list_checkpoints()
    if ckpt_predicate is not None:
        potential = [c for c in potential if ckpt_predicate(c)]
    protected = set()
    keys = list(importance_keys)
    if not keys and not max_keys and not min_keys:
        keys = [ckpt_recency]
    for key in keys:
        scored = sorted(potential, key=key, reverse=True)
        protected.update(c.path for c in scored[:num_to_keep])
    for mk in max_keys or []:
        scored = sorted(
            [c for c in potential if mk in c.meta],
            key=lambda c: c.meta[mk],
            reverse=True,
        )
        protected.update(c.path for c in scored[:num_to_keep])
    for mk in min_keys or []:
        scored = sorted(
            [c for c in potential if mk in c.meta], key=lambda c: c.meta[mk]
        )
        protected.update(c.path for c in scored[:num_to_keep])
    if _is_process_zero():
        for ckpt in potential:
            if ckpt.path not in protected:
                Checkpointer._delete_checkpoint(ckpt, verbosity=verbosity)
    _sync_processes()


Checkpointer.delete_checkpoints = _delete_checkpoints_impl
Checkpointer._load_checkpoint_extra_data = staticmethod(
    lambda metapath: yaml.safe_load(open(metapath, encoding="utf-8"))
)


def average_checkpoints(checkpoint_list, recoverable_name, target=None):
    """Elementwise average of one recoverable's pytree across checkpoints
    (the reference's checkpoint-averaging eval trick, checkpoints.py:1271)."""
    import jax

    trees = [
        load_pytree(c.paramfiles[recoverable_name], target=target)
        for c in checkpoint_list
    ]
    n = float(len(trees))
    return jax.tree_util.tree_map(
        lambda *leaves: sum(np.asarray(l, dtype=np.float64) for l in leaves) / n
        if not np.issubdtype(np.asarray(leaves[0]).dtype, np.integer)
        else leaves[0],
        *trees,
    )


def torch_recovery(obj, path, end_of_epoch=False):
    """Compatibility shim name — not used on TPU; raises with guidance."""
    raise NotImplementedError(
        "torch state dicts load through the weight converter in "
        "speechbrain_tpu.utils.parameter_transfer, not via torch_recovery."
    )
