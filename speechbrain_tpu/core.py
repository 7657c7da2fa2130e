"""The Brain training engine, TPU-native.

Capability parity with the reference's ``speechbrain/core.py`` (Brain :157,
fit :1130, fit_batch :814, evaluate :1337, Stage :148,
create_experiment_directory :62), re-architected for JAX:

* Params / optimizer state / mutable model state (batch-norm stats) live in
  a single ``TrainState`` pytree; the train step is ONE jit-compiled,
  buffer-donating function — forward, loss, grad, clip, update fused by XLA.
* Data parallelism is a ``jax.sharding.Mesh``: the batch is sharded over the
  "data" axis, params are replicated, and XLA inserts the gradient
  all-reduce over ICI — there is no DDP wrapper and no explicit collective
  in user code (reference ``core.py:1309`` _wrap_distributed becomes a
  sharding annotation).
* Gradient accumulation happens inside the step function via
  ``optax.MultiSteps``-style local accumulation (reference ``no_sync`` at
  core.py:1428 is unnecessary: nothing syncs until the jit output is used).
* bf16 autocast is a cast policy applied in the forward, not a context
  manager (MXU-native bfloat16).

Users subclass Brain and override the pure functions
``compute_forward(params, model_state, batch, stage, rng)`` and
``compute_objectives(predictions, batch, stage)``. Both are traced by XLA;
keep control flow static. Everything else (epoch loop, checkpoint cadence,
LR scheduling, logging, progressbars) mirrors the reference's contract.
"""

import inspect
import logging
import os
import shutil
import sys
import time
from dataclasses import dataclass, field
from enum import Enum, auto
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np

from speechbrain_tpu.dataio.batch import PaddedData
from speechbrain_tpu.dataio.dataloader import LoopedLoader, SaveableDataLoader, make_dataloader
from speechbrain_tpu.dataio.sampler import DistributedSamplerWrapper
from speechbrain_tpu.utils.checkpoints import (
    PytreeRef,
    mark_as_loader,
    mark_as_saver,
    register_checkpoint_hooks,
)
from speechbrain_tpu.utils.logger import get_logger

logger = get_logger(__name__)

DEFAULT_LOG_CONFIG = None
INTRA_EPOCH_CKPT_FLAG = "brain_intra_epoch_ckpt"


class Stage(Enum):
    """Current phase of an experiment: TRAIN, VALID or TEST."""

    TRAIN = auto()
    VALID = auto()
    TEST = auto()


@dataclass
class RunOptions:
    """Runtime controls, mirroring the reference's RunOptions
    (utils/run_opts.py:58) with TPU-appropriate fields."""

    test_only: bool = False  # skip training, evaluate only
    debug: bool = False
    debug_batches: int = 2
    debug_epochs: int = 2
    debug_persistently: bool = False  # keep debug artifacts on disk
    device: str = "auto"  # "auto" | "tpu" | "cpu"
    precision: str = "fp32"  # "fp32" | "bf16"
    eval_precision: str = "fp32"  # precision for VALID/TEST stages
    data_parallel_count: int = -1  # -1: all local devices
    tensor_parallel_count: int = 1  # "model" mesh axis size
    max_grad_norm: float = 5.0
    skip_nonfinite_grads: bool = False  # also skip on nonfinite grad norm
    grad_accumulation_factor: int = 1
    optimizer_step_limit: int = None  # stop after N optimizer updates
    nonfinite_patience: int = 3
    loss_sync_interval: int = 1  # sync loss/nonfinite counters every N steps
    ckpt_interval_minutes: float = 0.0
    ckpt_interval_steps: int = 0
    noprogressbar: bool = False
    train_log_interval: int = 100
    jit: bool = True  # disable to debug python-side
    donate_state: bool = True
    profile_training: bool = False
    profile_warmup: int = 5
    profile_steps: int = 10
    seed: int = 563375142

    @classmethod
    def from_dict(cls, d):
        valid = {f for f in cls.__dataclass_fields__}
        return cls(**{k: v for k, v in d.items() if k in valid})


def parse_arguments(arg_list=None):
    """Parse ``train.py hparams.yaml --override=value`` command lines.

    Returns (hparams_file, run_opts_dict, overrides_dict) — the same triple
    shape as the reference's parse_arguments (utils/run_opts.py:245).
    """
    import argparse

    parser = argparse.ArgumentParser(description="Run an experiment")
    parser.add_argument("param_file", type=str, help="hparams yaml file")
    known, unknown = parser.parse_known_args(arg_list)
    run_opt_fields = set(RunOptions.__dataclass_fields__)
    run_opts, overrides = {}, {}
    i = 0
    while i < len(unknown):
        arg = unknown[i]
        if not arg.startswith("--"):
            raise ValueError(f"Cannot parse argument {arg}")
        if "=" in arg:
            key, value = arg[2:].split("=", 1)
            i += 1
        else:
            key = arg[2:]
            if i + 1 < len(unknown) and not unknown[i + 1].startswith("--"):
                value = unknown[i + 1]
                i += 2
            else:
                value = "True"
                i += 1
        parsed = _parse_scalar(value)
        if key in run_opt_fields:
            run_opts[key] = parsed
        else:
            overrides[key] = parsed
    # Apply the platform choice BEFORE any yaml-constructed module touches
    # jax (e.g. STFT precomputing DFT matrices): on this platform the
    # JAX_PLATFORMS env var is ignored, only jax.config works, and the
    # first backend touch locks the platform for the process.
    if run_opts.get("device") == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    return known.param_file, run_opts, overrides


def _parse_scalar(value):
    import yaml as _yaml

    try:
        return _yaml.safe_load(value)
    except Exception:
        return value


def create_experiment_directory(
    experiment_directory,
    hyperparams_to_save=None,
    overrides={},
    log_config=DEFAULT_LOG_CONFIG,
    save_env_desc=True,
):
    """Create the output dir, freeze the resolved yaml, start file logging.

    Mirrors reference core.py:62: rank-0 creates and writes; others wait.
    """
    from speechbrain_tpu.utils.logger import get_environment_description, setup_logging

    if jax.process_index() == 0:
        os.makedirs(experiment_directory, exist_ok=True)
        if hyperparams_to_save is not None:
            from speechbrain_tpu.utils.hyperyaml import resolve_yaml

            hparams_filename = os.path.join(experiment_directory, "hyperparams.yaml")
            with open(hyperparams_to_save, encoding="utf-8") as f:
                resolved = resolve_yaml(f.read(), overrides)
            with open(hparams_filename, "w", encoding="utf-8") as w:
                w.write(resolved)
        # copy the calling script for reproducibility
        module = inspect.getmodule(inspect.currentframe().f_back)
        if module is not None and hasattr(module, "__file__"):
            callingfile = os.path.realpath(module.__file__)
            if os.path.isfile(callingfile):
                shutil.copy(
                    callingfile,
                    os.path.join(
                        experiment_directory, os.path.basename(callingfile)
                    ),
                )
        setup_logging()
        log_file = os.path.join(experiment_directory, "log.txt")
        handler = logging.FileHandler(log_file, encoding="utf-8")
        handler.setFormatter(
            logging.Formatter("%(asctime)s - %(name)s - %(levelname)s - %(message)s")
        )
        logging.getLogger().addHandler(handler)
        sys.excepthook = _logging_excepthook
        if save_env_desc:
            with open(
                os.path.join(experiment_directory, "env.log"), "w", encoding="utf-8"
            ) as f:
                f.write(get_environment_description())
    _barrier()


def _logging_excepthook(exc_type, exc_value, exc_traceback):
    logging.getLogger("exception").error(
        "Exception", exc_info=(exc_type, exc_value, exc_traceback)
    )
    sys.__excepthook__(exc_type, exc_value, exc_traceback)


def _barrier():
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("sb_barrier")


@register_checkpoint_hooks
class Brain:
    """Generic training engine: override compute_forward/compute_objectives.

    Arguments
    ---------
    modules : dict[str, flax.linen.Module]
        The model parts. Exposed as ``self.modules.<name>``.
    opt_class : callable, optional
        ``lr -> optax transform`` or a zero-arg factory returning one; by
        convention recipes pass e.g. ``lambda: optax.adam(1e-3)``.
    hparams : dict, optional
        Exposed as ``self.hparams.<key>``.
    run_opts : dict | RunOptions, optional
    checkpointer : Checkpointer, optional
        Registered recoverables are extended with params/opt state/counters.

    Subclass contract (all pure, traced by jit):

    * ``compute_forward(self, params, model_state, batch, stage, rng)``
      → (predictions, new_model_state)
    * ``compute_objectives(self, predictions, batch, stage)``
      → scalar loss  (or (loss, metrics-dict) — extra values are averaged
      and logged)

    Host-side hooks (not traced): ``on_fit_start``, ``on_stage_start``,
    ``on_stage_end``, ``on_evaluate_start``; metric accumulation happens in
    ``on_stage_end`` / via ``evaluate_batch_end`` callbacks on host.
    """

    def __init__(
        self,
        modules=None,
        opt_class=None,
        hparams=None,
        run_opts=None,
        checkpointer=None,
    ):
        if isinstance(run_opts, RunOptions):
            self.run_opts = run_opts
        else:
            self.run_opts = RunOptions.from_dict(run_opts or {})
        if hparams is not None and isinstance(hparams, dict):
            for opt in RunOptions.__dataclass_fields__:
                if opt in hparams and run_opts is not None and opt not in (run_opts or {}):
                    setattr(self.run_opts, opt, hparams[opt])
        self.opt_class = opt_class
        self.checkpointer = checkpointer
        self.modules = SimpleNamespace(**(modules or {}))
        self.hparams = SimpleNamespace(**(hparams or {})) if hparams else SimpleNamespace()

        # functional state
        self.params = None  # {module_name: params pytree} or user-defined
        self.model_state = {}  # mutable collections (batch_stats etc.)
        self.opt_state = None
        self.optimizer = None
        self.step = 0  # step within current epoch
        self.optimizer_step = 0  # global optimizer updates
        self._micro_step = 0  # micro-batches seen (for grad accumulation)
        self._pending_loss = None  # one-step-delayed loss sync
        self._loss_accum = None  # device-side (sum, n, nonfinite) window
        self.avg_train_loss = 0.0
        self._compiled_train_step = None
        self._compiled_eval_step = None
        self.rng = jax.random.PRNGKey(self.run_opts.seed)

        # device / mesh setup
        self._setup_mesh()

        # nonfinite-loss tracking (reference core.py:855)
        self.nonfinite_count = 0

        # intra-epoch checkpointing cadence
        self.last_ckpt_time = time.time()

        if self.checkpointer is not None:
            self.checkpointer.add_recoverable("brain", self)
            self._params_ref = PytreeRef()
            self._opt_state_ref = PytreeRef()
            self._model_state_ref = PytreeRef()
            self.checkpointer.add_recoverable("params", self._params_ref)
            self.checkpointer.add_recoverable("opt_state", self._opt_state_ref)
            self.checkpointer.add_recoverable("model_state", self._model_state_ref)

        if self.run_opts.profile_training:
            logger.info("Profiler active: traces under 'profiler_logs/'")

    # ------------------------------------------------------------------
    # Mesh / sharding
    # ------------------------------------------------------------------
    def _setup_mesh(self):
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        if self.run_opts.device == "cpu":
            # must be set before the backend initializes; some plugin
            # platforms (axon) ignore JAX_PLATFORMS env, so use the config
            try:
                jax.config.update("jax_platforms", "cpu")
            except Exception:
                pass
            try:
                devices = jax.devices("cpu")
            except RuntimeError:
                devices = jax.devices()
        else:
            devices = jax.devices()
        count = self.run_opts.data_parallel_count
        tp = max(int(self.run_opts.tensor_parallel_count or 1), 1)
        if count is None or count <= 0:
            count = len(devices) // tp
        devices = devices[: count * tp]
        if len(devices) < count * tp:
            raise ValueError(
                f"need {count * tp} devices for data={count} x model={tp}, "
                f"have {len(devices)}"
            )
        self.mesh = Mesh(
            np.array(devices).reshape(count, tp),
            axis_names=("data", "model"),
        )
        self.batch_sharding = NamedSharding(self.mesh, P("data"))
        self.replicated_sharding = NamedSharding(self.mesh, P())
        logger.info(
            "Mesh: data=%d x model=%d device(s) (%s)",
            count, tp, devices[0].platform,
        )

    def shard_params(self, params):
        """Place params on the mesh: tensor-parallel rules when the
        "model" axis is >1, replicated otherwise."""
        if self.mesh.shape.get("model", 1) > 1:
            from speechbrain_tpu.parallel.mesh import (
                shard_params_tensor_parallel,
            )

            return shard_params_tensor_parallel(params, self.mesh)
        return jax.device_put(params, self.replicated_sharding)

    @property
    def n_devices(self):
        return self.mesh.devices.size

    # ------------------------------------------------------------------
    # User override points
    # ------------------------------------------------------------------
    def compute_forward(self, params, model_state, batch, stage, rng):
        """Pure forward: return (predictions, new_model_state)."""
        raise NotImplementedError

    def compute_objectives(self, predictions, batch, stage):
        """Pure loss: return scalar loss or (loss, metrics dict)."""
        raise NotImplementedError

    def on_stage_start(self, stage, epoch=None):
        pass

    def on_stage_end(self, stage, stage_loss, epoch=None):
        pass

    def on_fit_start(self):
        """Initialize params/optimizer; recover checkpoint if available."""
        if self.params is None:
            self.init_params()
        self.init_optimizers()
        if self.checkpointer is not None:
            self._sync_refs_out()
            self.checkpointer.recover_if_possible()
            self._sync_refs_in()

    def on_fit_batch_start(self, batch):
        pass

    def on_fit_batch_end(self, batch, outputs, loss, should_step):
        pass

    def on_evaluate_start(self, max_key=None, min_key=None):
        if self.checkpointer is not None:
            self._sync_refs_out()
            self.checkpointer.recover_if_possible(max_key=max_key, min_key=min_key)
            self._sync_refs_in()

    def load_averaged_checkpoints(self, n, max_key=None, min_key=None):
        """Average the params of the n best checkpoints for evaluation
        (the reference's avg_checkpoints eval trick, checkpoints.py:1271)."""
        from speechbrain_tpu.utils.checkpoints import average_checkpoints

        ckpts = self.checkpointer.find_checkpoints(
            max_key=max_key, min_key=min_key, max_num_checkpoints=n
        )
        if not ckpts:
            raise RuntimeError("No checkpoints found to average")
        self.params = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, jnp.float32)
            if np.issubdtype(np.asarray(x).dtype, np.floating)
            else jnp.asarray(x),
            average_checkpoints(ckpts, "params", target=self.params),
        )
        self._sync_refs_out()
        return len(ckpts)

    # ------------------------------------------------------------------
    # flax module plumbing helpers
    # ------------------------------------------------------------------
    def module_apply(
        self, name, params, model_state, *args, mutable_state=None, rngs=None, **kwargs
    ):
        """Apply ``self.modules.<name>`` with its params + state collections.

        Returns (output, state_updates) where state_updates is a dict of
        {collection: tree} for this module (empty when nothing mutable).
        Pass ``mutable_state=["batch_stats"]`` during training forward.
        """
        module = getattr(self.modules, name)
        variables = {"params": params[name]}
        for coll, trees in (model_state or {}).items():
            if isinstance(trees, dict) and name in trees and trees[name]:
                variables[coll] = trees[name]
        mutable = [c for c in (mutable_state or []) if c in variables]
        if mutable:
            out, updates = module.apply(
                variables, *args, mutable=mutable, rngs=rngs, **kwargs
            )
            return out, dict(updates)
        return module.apply(variables, *args, rngs=rngs, **kwargs), {}

    @staticmethod
    def merge_state(model_state, name, updates):
        """Merge one module's collection updates into the global state
        (pure: returns a new dict)."""
        new_state = {k: dict(v) for k, v in (model_state or {}).items()}
        for coll, tree in updates.items():
            new_state.setdefault(coll, {})[name] = tree
        return new_state

    def init_module(self, rng, name, *args, **kwargs):
        """Initialize one module; returns (params_tree, collections_dict)."""
        module = getattr(self.modules, name)
        variables = dict(module.init(rng, *args, **kwargs))
        params = variables.pop("params", {})
        return params, variables

    # ------------------------------------------------------------------
    # Parameter init
    # ------------------------------------------------------------------
    def init_params(self, example_batch=None):
        """Initialize every module's params by tracing an example batch.

        If the subclass defines ``init_forward(rngs, example_batch)`` that is
        used; otherwise modules must be initialized by the subclass before
        fit (or params set directly)."""
        if example_batch is None:
            example_batch = getattr(self, "_example_batch", None)
        if hasattr(self, "init_forward"):
            self.rng, init_rng = jax.random.split(self.rng)
            variables = self.init_forward(init_rng, example_batch)
            self.params = variables.pop("params") if "params" in variables else variables
            self.model_state = dict(variables)
        if self.params is None:
            raise RuntimeError(
                "No params: define init_forward(rng, example_batch) or set "
                "self.params before fit()."
            )
        count = sum(
            int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(self.params)
        )
        from speechbrain_tpu.utils.logger import format_order_of_magnitude

        num, mag = format_order_of_magnitude(count)
        logger.info("%s%s trainable parameters", num, mag)
        self.params = self.shard_params(self.params)

    def init_optimizers(self):
        """Build the optax optimizer(s).

        ``opt_class`` may be:
        * a zero-arg factory or optax transform — one optimizer for all
          params (the common case);
        * a dict {param_group: factory} matching top-level keys of
          ``self.params`` — per-group optimizers combined with
          optax.multi_transform (the reference's ``optimizers_dict``
          pattern for GANs / differently-scheduled modules,
          core.py:749-777).
        """
        import optax

        if self.opt_class is None:
            return
        if isinstance(self.opt_class, dict):
            transforms = {}
            for name, factory in self.opt_class.items():
                tx = factory
                if callable(tx) and not isinstance(tx, optax.GradientTransformation):
                    tx = tx()
                transforms[name] = tx
            self.optimizers_dict = transforms

            def label_fn(params):
                return {k: k for k in params}

            tx = optax.multi_transform(transforms, label_fn)
        else:
            tx = self.opt_class
            if callable(tx) and not isinstance(tx, optax.GradientTransformation):
                tx = tx()
        if self.run_opts.grad_accumulation_factor > 1:
            tx = optax.MultiSteps(
                tx, every_k_schedule=self.run_opts.grad_accumulation_factor
            )
        self.optimizer = tx
        if self.opt_state is None:
            self.opt_state = self.optimizer.init(self.params)

    def make_gan_steps(self, d_loss_fn, g_loss_fn, d_key, g_key):
        """Build two jitted alternating update steps for GAN training
        (the functional analogue of the reference's two-optimizer
        fit_batch overrides, e.g. MetricGAN).

        d_loss_fn/g_loss_fn: pure (params, model_state, batch, rng) ->
        (loss, new_model_state). d_key/g_key: top-level param-group names
        whose params each step updates (others get zero updates via
        stop-gradient masking).
        """
        import optax

        def make_step(loss_fn, group):
            def step(params, model_state, opt_state, batch, rng):
                def wrapped(p_group):
                    full = {**params, group: p_group}
                    loss, new_state = loss_fn(full, model_state, batch, rng)
                    return loss, new_state

                (loss, new_state), grads_group = jax.value_and_grad(
                    wrapped, has_aux=True
                )(params[group])
                grads = {
                    k: grads_group if k == group
                    else jax.tree_util.tree_map(jnp.zeros_like, v)
                    for k, v in params.items()
                }
                updates, new_opt_state = self.optimizer.update(
                    grads, opt_state, params
                )
                new_params = optax.apply_updates(params, updates)
                return new_params, new_state, new_opt_state, loss

            return jax.jit(step, donate_argnums=(0, 2)) if self.run_opts.jit else step

        return make_step(d_loss_fn, d_key), make_step(g_loss_fn, g_key)

    # ------------------------------------------------------------------
    # Checkpoint state sync (pytrees are held by reference wrappers)
    # ------------------------------------------------------------------
    def _sync_refs_out(self):
        self._params_ref.tree = self.params
        self._opt_state_ref.tree = self.opt_state
        self._model_state_ref.tree = self.model_state

    def _sync_refs_in(self):
        self.params = self._params_ref.tree
        self.opt_state = self._opt_state_ref.tree
        self.model_state = self._model_state_ref.tree

    @mark_as_saver
    def _save(self, path):
        import json

        save_dict = {
            "step": self.step,
            "optimizer_step": self.optimizer_step,
            "micro_step": self._micro_step,
            "avg_train_loss": self.avg_train_loss,
        }
        with open(path, "w") as w:
            json.dump(save_dict, w)

    @mark_as_loader
    def _recover(self, path, end_of_epoch):
        import json

        with open(path) as f:
            save_dict = json.load(f)
        self.step = save_dict["step"]
        self.optimizer_step = save_dict["optimizer_step"]
        self._micro_step = save_dict.get("micro_step", 0)
        self.avg_train_loss = save_dict["avg_train_loss"]
        if end_of_epoch:
            self.step = 0

    # ------------------------------------------------------------------
    # The jitted step functions
    # ------------------------------------------------------------------
    def _loss_and_aux(self, params, model_state, batch, stage, rng):
        predictions, new_model_state = self.compute_forward(
            params, model_state, batch, stage, rng
        )
        objectives = self.compute_objectives(predictions, batch, stage)
        if isinstance(objectives, tuple):
            loss, metrics = objectives
        else:
            loss, metrics = objectives, {}
        return loss, (metrics, new_model_state)

    def _make_train_step(self):
        def train_step(params, model_state, opt_state, batch, rng):
            grad_fn = jax.value_and_grad(self._loss_and_aux, has_aux=True)
            (loss, (metrics, new_model_state)), grads = grad_fn(
                params, model_state, batch, Stage.TRAIN, rng
            )
            # nonfinite protection: skip the update if loss/grads blew up
            finite = jnp.isfinite(loss)
            if self.run_opts.skip_nonfinite_grads:
                finite = jnp.logical_and(
                    finite, jnp.isfinite(optax_global_norm(grads))
                )
            grads = jax.tree_util.tree_map(
                lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads
            )
            if self.run_opts.max_grad_norm and self.run_opts.max_grad_norm > 0:
                gnorm = optax_global_norm(grads)
                scale = jnp.minimum(1.0, self.run_opts.max_grad_norm / (gnorm + 1e-6))
                grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
            updates, new_opt_state = self.optimizer.update(grads, opt_state, params)
            new_params = apply_updates(params, updates)
            # if nonfinite: keep old params/opt state
            new_params = jax.tree_util.tree_map(
                lambda n, o: jnp.where(finite, n, o), new_params, params
            )
            new_opt_state = jax.tree_util.tree_map(
                lambda n, o: jnp.where(finite, n, o) if _same_shape(n, o) else n,
                new_opt_state,
                opt_state,
            )
            return new_params, new_model_state, new_opt_state, loss, metrics, finite

        if self.run_opts.jit:
            donate = (0, 2) if self.run_opts.donate_state else ()
            train_step = jax.jit(train_step, donate_argnums=donate)
        return train_step

    def _make_eval_step(self, stage):
        def eval_step(params, model_state, batch, rng):
            loss, (metrics, _) = self._loss_and_aux(
                params, model_state, batch, stage, rng
            )
            return loss, metrics

        if self.run_opts.jit:
            eval_step = jax.jit(eval_step)
        return eval_step

    # ------------------------------------------------------------------
    # Batch-level API
    # ------------------------------------------------------------------
    def _prepare_batch(self, batch, precision=None):
        """Move a PaddedBatch (or dict pytree) to device, sharded on the
        data axis. Non-array entries (ids, raw strings) are stripped from
        the jit input and kept on ``self.host_batch`` for hooks/metrics."""
        if hasattr(batch, "to_device"):
            batch = batch.to_device()
        if isinstance(batch, dict):
            device_batch, host_batch = {}, {}
            for key, value in batch.items():
                if _is_device_value(value):
                    device_batch[key] = value
                else:
                    host_batch[key] = value
            self.host_batch = host_batch
            batch = device_batch
        precision = precision or self.run_opts.precision
        if precision == "bf16":
            # bf16 autocast at the batch boundary: float inputs compute in
            # bf16 on the MXU; params stay fp32 (the reference's AMP ctx,
            # utils/autocast.py, as a cast policy instead of a context).
            # Relative lengths are EXCLUDED: bf16's 8 mantissa bits would
            # corrupt round(lengths*T) masks for long sequences (the
            # reference's autocast never downcasts lengths either).
            def _cast_leaf(x):
                if hasattr(x, "dtype") and x.dtype == jnp.float32:
                    return x.astype(jnp.bfloat16)
                return x

            def _cast(value):
                if isinstance(value, PaddedData):
                    return PaddedData(_cast_leaf(value.data), value.lengths)
                return jax.tree_util.tree_map(_cast_leaf, value)

            if isinstance(batch, dict):
                batch = {k: _cast(v) for k, v in batch.items()}
            else:
                batch = _cast(batch)
        return batch

    def fit_batch(self, batch):
        """One training micro-step.

        Returns the PREVIOUS step's loss as a host float (or None on the
        very first call): syncing the just-dispatched loss would serialize
        host dispatch with device compute, so the device runs one step
        ahead and the host reads results with one step of lag
        (``_flush_pending_loss`` drains the tail at epoch end).
        """
        if self._compiled_train_step is None:
            self._compiled_train_step = self._make_train_step()
        self.rng, step_rng = jax.random.split(self.rng)
        batch = self._prepare_batch(batch)
        (
            self.params,
            self.model_state,
            self.opt_state,
            loss,
            metrics,
            finite,
        ) = self._compiled_train_step(
            self.params, self.model_state, self.opt_state, batch, step_rng
        )
        # with grad accumulation, optax.MultiSteps applies an update every
        # k-th call; mirror the reference's optimizer_step semantics
        # (core.py:852) by counting only applied updates
        gaf = max(1, self.run_opts.grad_accumulation_factor)
        self._micro_step += 1
        should_step = self._micro_step % gaf == 0
        if should_step:
            self.optimizer_step += 1
        self.on_fit_batch_end(batch, metrics, loss, should_step)
        k = max(1, getattr(self.run_opts, "loss_sync_interval", 1))
        if k > 1:
            # device-side loss/nonfinite accumulation: NO host round-trip
            # until every k-th step (beyond-reference; the torch reference
            # syncs every step, core.py:855-884)
            if self._loss_accum is None:
                z = jnp.zeros(())
                self._loss_accum = (z, z, z)
            self._loss_accum = self._accum_loss(
                self._loss_accum, loss, finite
            )
            if self._micro_step % k == 0:
                return self._drain_loss_accum()
            return None
        pending, self._pending_loss = self._pending_loss, loss
        if pending is None:
            return None
        return self._host_loss(pending)

    @staticmethod
    @jax.jit
    def _accum_loss(acc, loss, finite):
        s, n, bad = acc
        ok = jnp.asarray(finite, jnp.float32)
        lf = jnp.asarray(loss, jnp.float32)
        return (
            s + jnp.where(ok > 0, lf, 0.0),
            n + ok,
            bad + (1.0 - ok),
        )

    def _drain_loss_accum(self):
        """ONE host sync for the accumulated (sum, count, nonfinite)
        triple; applies the nonfinite-patience policy in bulk. Returns
        (mean_loss, n) or None."""
        if self._loss_accum is None:
            return None
        s, n, bad = (float(x) for x in jax.device_get(self._loss_accum))
        self._loss_accum = None
        if bad:
            self.nonfinite_count += int(bad)
            logger.warning(
                "%d nonfinite loss step(s) in the last window; updates "
                "skipped (patience %d/%d).",
                int(bad), self.nonfinite_count,
                self.run_opts.nonfinite_patience,
            )
            if self.nonfinite_count > self.run_opts.nonfinite_patience:
                raise ValueError(
                    "Loss is not finite and patience is exhausted."
                )
        if n < 1:
            return None
        return (s / n, int(n))

    def _host_loss(self, loss):
        """Device->host loss sync + nonfinite patience (reference
        core.py:855-884)."""
        loss = float(loss)
        if not np.isfinite(loss):
            self.nonfinite_count += 1
            logger.warning(
                "Loss is %s. Update skipped (patience %d/%d).",
                loss,
                self.nonfinite_count,
                self.run_opts.nonfinite_patience,
            )
            if self.nonfinite_count > self.run_opts.nonfinite_patience:
                raise ValueError("Loss is not finite and patience is exhausted.")
            return self.avg_train_loss
        return loss

    def _flush_pending_loss(self):
        pending, self._pending_loss = self._pending_loss, None
        if pending is None:
            return None
        return self._host_loss(pending)

    def evaluate_batch(self, batch, stage):
        """One forward-only step; returns the loss (host float)."""
        if self._compiled_eval_step is None:
            self._compiled_eval_step = self._make_eval_step(stage)
        self.rng, step_rng = jax.random.split(self.rng)
        batch = self._prepare_batch(
            batch, precision=self.run_opts.eval_precision
        )
        loss, metrics = self._compiled_eval_step(
            self.params, self.model_state, batch, step_rng
        )
        return float(loss)

    # ------------------------------------------------------------------
    # fit / evaluate loops
    # ------------------------------------------------------------------
    def make_dataloader(self, dataset, stage, ckpt_prefix="dataloader-", **loader_kwargs):
        """Build a loader; on TRAIN also registers it for mid-epoch resume
        and shards the sampler across hosts (multi-host DP)."""
        if isinstance(dataset, (SaveableDataLoader, LoopedLoader)):
            return dataset
        if stage == Stage.TRAIN and jax.process_count() > 1:
            sampler = loader_kwargs.get("sampler")
            if sampler is None and loader_kwargs.get("batch_sampler") is None:
                from speechbrain_tpu.dataio.sampler import (
                    ReproducibleRandomSampler,
                    SequentialSampler,
                )

                base = (
                    ReproducibleRandomSampler(dataset)
                    if loader_kwargs.pop("shuffle", False)
                    else SequentialSampler(dataset)
                )
                loader_kwargs["sampler"] = DistributedSamplerWrapper(base)
        dataloader = make_dataloader(dataset, **loader_kwargs)
        if (
            self.checkpointer is not None
            and ckpt_prefix is not None
            and stage == Stage.TRAIN
        ):
            self.checkpointer.add_recoverable(ckpt_prefix + stage.name, dataloader)
        return dataloader

    def fit(
        self,
        epoch_counter,
        train_set,
        valid_set=None,
        progressbar=None,
        train_loader_kwargs={},
        valid_loader_kwargs={},
    ):
        """The main training loop (reference core.py:1130)."""
        if not isinstance(train_set, (SaveableDataLoader, LoopedLoader)):
            train_set = self.make_dataloader(
                train_set, stage=Stage.TRAIN, **train_loader_kwargs
            )
        if valid_set is not None and not isinstance(
            valid_set, (SaveableDataLoader, LoopedLoader)
        ):
            valid_set = self.make_dataloader(
                valid_set, stage=Stage.VALID, ckpt_prefix=None, **valid_loader_kwargs
            )
        if self.params is None:
            # lazy init: trace the first batch for shape inference
            first = next(iter(train_set))
            self._example_batch = self._prepare_batch(first)
        self.on_fit_start()

        progressbar = (
            not self.run_opts.noprogressbar if progressbar is None else progressbar
        )

        if self.run_opts.test_only:
            logger.info("test_only set: skipping training")
            return

        for epoch in epoch_counter:
            self._fit_train(train_set, epoch, progressbar)
            self._fit_valid(valid_set, epoch, progressbar)
            if (
                self.run_opts.debug
                and epoch == self.run_opts.debug_epochs
            ):
                break
            if (
                self.run_opts.optimizer_step_limit is not None
                and self.optimizer_step >= self.run_opts.optimizer_step_limit
            ):
                logger.info(
                    "Reached optimizer_step_limit (%d); stopping.",
                    self.run_opts.optimizer_step_limit,
                )
                break

    def _fit_train(self, train_set, epoch, enable):
        self.on_stage_start(Stage.TRAIN, epoch)
        if hasattr(train_set, "set_epoch"):
            train_set.set_epoch(epoch)
        self.avg_train_loss = 0.0
        self.nonfinite_count = 0
        self._loss_count = 0
        self._pending_loss = None
        self._loss_accum = None
        last_log_time = time.time()
        profiler_on = False
        t = _progress(train_set, enable, f"Epoch {epoch} TRAIN")
        for self.step, batch in enumerate(t, start=1):
            if self.run_opts.profile_training:
                if self.step == self.run_opts.profile_warmup + 1:
                    out_dir = getattr(self.hparams, "output_folder", None)
                    jax.profiler.start_trace(
                        os.path.join(out_dir or ".", "profiler_logs")
                    )
                    profiler_on = True
                elif profiler_on and self.step == (
                    self.run_opts.profile_warmup + self.run_opts.profile_steps + 1
                ):
                    jax.profiler.stop_trace()
                    profiler_on = False
            self.on_fit_batch_start(batch)
            loss = self.fit_batch(batch)
            if loss is not None:
                mean, n = loss if isinstance(loss, tuple) else (loss, 1)
                self._loss_count += n
                self.avg_train_loss += (
                    n * (mean - self.avg_train_loss) / self._loss_count
                )
            if hasattr(t, "set_postfix"):
                t.set_postfix(train_loss=self.avg_train_loss)
            if self.run_opts.debug and self.step == self.run_opts.debug_batches:
                break
            if (
                self.run_opts.optimizer_step_limit is not None
                and self.optimizer_step >= self.run_opts.optimizer_step_limit
            ):
                break
            if self._should_save_intra_epoch_ckpt():
                self._save_intra_epoch_ckpt()
            del batch
        loss = self._flush_pending_loss()
        if loss is None:
            loss = self._drain_loss_accum()
        if loss is not None:
            mean, n = loss if isinstance(loss, tuple) else (loss, 1)
            self._loss_count += n
            self.avg_train_loss += (
                n * (mean - self.avg_train_loss) / self._loss_count
            )
        if profiler_on:
            jax.profiler.stop_trace()
        self.on_stage_end(Stage.TRAIN, self.avg_train_loss, epoch)
        # keep the epoch's train loss readable from later stage hooks
        # (the reference exposes it via stage stats)
        self.train_loss = self.avg_train_loss
        self.avg_train_loss = 0.0
        self.step = 0

    def _fit_valid(self, valid_set, epoch, enable):
        if valid_set is None:
            return
        self.on_stage_start(Stage.VALID, epoch)
        avg_valid_loss = 0.0
        self._compiled_eval_step = None  # stage may change loss path
        t = _progress(valid_set, enable, f"Epoch {epoch} VALID")
        for self.step, batch in enumerate(t, start=1):
            loss = self.evaluate_batch(batch, stage=Stage.VALID)
            avg_valid_loss = self.update_average(loss, avg_valid_loss)
            if self.run_opts.debug and self.step == self.run_opts.debug_batches:
                break
        self.on_stage_end(Stage.VALID, avg_valid_loss, epoch)
        self.step = 0

    def evaluate(
        self,
        test_set,
        max_key=None,
        min_key=None,
        progressbar=None,
        test_loader_kwargs={},
    ):
        """Evaluation loop over a test set (reference core.py:1337)."""
        progressbar = (
            not self.run_opts.noprogressbar if progressbar is None else progressbar
        )
        if not isinstance(test_set, (SaveableDataLoader, LoopedLoader)):
            test_loader_kwargs["ckpt_prefix"] = None
            test_set = self.make_dataloader(
                test_set, Stage.TEST, **test_loader_kwargs
            )
        self.on_evaluate_start(max_key=max_key, min_key=min_key)
        self.on_stage_start(Stage.TEST, epoch=None)
        avg_test_loss = 0.0
        self._compiled_eval_step = None
        t = _progress(test_set, progressbar, "TEST")
        for self.step, batch in enumerate(t, start=1):
            loss = self.evaluate_batch(batch, stage=Stage.TEST)
            avg_test_loss = self.update_average(loss, avg_test_loss)
            if self.run_opts.debug and self.step == self.run_opts.debug_batches:
                break
        self.on_stage_end(Stage.TEST, avg_test_loss, None)
        self.step = 0
        return avg_test_loss

    # ------------------------------------------------------------------
    # Intra-epoch checkpointing (reference core.py:1075)
    # ------------------------------------------------------------------
    def _should_save_intra_epoch_ckpt(self):
        if self.checkpointer is None:
            return False
        decision = False
        if self.run_opts.ckpt_interval_minutes > 0:
            elapsed = (time.time() - self.last_ckpt_time) / 60.0
            decision = elapsed >= self.run_opts.ckpt_interval_minutes
        if not decision and self.run_opts.ckpt_interval_steps > 0:
            decision = self.optimizer_step % self.run_opts.ckpt_interval_steps == 0
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            decision = bool(
                multihost_utils.broadcast_one_to_all(np.array(decision))
            )
        return decision

    def _save_intra_epoch_ckpt(self):
        self._sync_refs_out()
        self.checkpointer.save_and_keep_only(
            end_of_epoch=False,
            num_to_keep=1,
            ckpt_predicate=lambda c: INTRA_EPOCH_CKPT_FLAG in c.meta,
            meta={INTRA_EPOCH_CKPT_FLAG: True},
            verbosity=False,
        )
        self.last_ckpt_time = time.time()

    def save_checkpoint(self, meta={}, end_of_epoch=True, **kwargs):
        """Convenience: sync pytree refs then save via the checkpointer."""
        self._sync_refs_out()
        return self.checkpointer.save_and_keep_only(
            meta=meta, end_of_epoch=end_of_epoch, **kwargs
        )

    def update_average(self, loss, avg_loss):
        """Running average over the current stage (reference semantics)."""
        return self._update_average_n(loss, avg_loss, self.step)

    def _update_average_n(self, loss, avg_loss, n):
        if np.isfinite(loss) and n > 0:
            avg_loss -= avg_loss / n
            avg_loss += loss / n
        return avg_loss


def _progress(iterable, enable, desc):
    if enable:
        try:
            from tqdm import tqdm

            return tqdm(iterable, desc=desc, dynamic_ncols=True)
        except ImportError:
            pass
    return iterable


def _is_device_value(value):
    """True for values that can be jit arguments (arrays / PaddedData of
    arrays / numeric scalars), False for strings and other host objects."""
    from speechbrain_tpu.dataio.batch import PaddedData

    if isinstance(value, PaddedData):
        return True
    if isinstance(value, (int, float, bool)):
        return True
    if hasattr(value, "dtype") and hasattr(value, "shape"):
        return np.issubdtype(np.asarray(value).dtype, np.number) or np.issubdtype(
            np.asarray(value).dtype, np.bool_
        )
    return False


def _same_shape(a, b):
    try:
        return getattr(a, "shape", None) == getattr(b, "shape", None)
    except Exception:
        return False


def optax_global_norm(tree):
    """Global L2 norm of a pytree (optax.global_norm equivalent)."""
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x)) for x in leaves))


def apply_updates(params, updates):
    """Apply optax updates to params (thin alias used by tests/recipes)."""
    import optax

    return optax.apply_updates(params, updates)
