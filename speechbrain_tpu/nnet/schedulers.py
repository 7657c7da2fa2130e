"""Learning-rate schedulers.

Capability parity with the reference's ``speechbrain/nnet/schedulers.py``
(NewBobScheduler :153, NoamScheduler :489, LinearScheduler, StepScheduler,
LinearWarmupScheduler :300, CyclicCosineScheduler :811, ReduceLROnPlateau
:909, CyclicLRScheduler :1031, InverseSquareRootScheduler :1310,
WarmAndExpDecayLRSchedule :63, WarmCoolDecayLRSchedule :1360,
TriStageLRSchedule :1576, ScheduledLoss :1481, update_learning_rate :24).

Two usage styles, both supported:

* **metric-driven** (NewBob, ReduceLROnPlateau): call ``sch(metric)`` in
  ``on_stage_end``; returns (old_lr, new_lr). Plug the new value into an
  optax optimizer built with ``optax.inject_hyperparams`` via
  ``update_learning_rate``.
* **step-driven** (Noam, inverse-sqrt, tri-stage, ...): the object is a
  valid optax schedule — ``sch(step) -> lr`` — so it can be passed
  directly as the learning_rate of any optax optimizer and lives inside
  the jitted update (no host sync per step). The stateful ``__call__``
  style of the reference is kept for recipes that step manually.

All are checkpointable.
"""

import math

from speechbrain_tpu.utils.checkpoints import (
    mark_as_loader,
    mark_as_saver,
    register_checkpoint_hooks,
)
from speechbrain_tpu.utils.logger import get_logger

logger = get_logger(__name__)


def _find_injected(state):
    """Depth-first search for an inject_hyperparams state with a
    'learning_rate' entry, through wrappers (MultiSteps, chains, ...)."""
    hp = getattr(state, "hyperparams", None)
    if isinstance(hp, dict) and "learning_rate" in hp:
        return state
    children = ()
    if isinstance(state, (tuple, list)):
        children = state
    elif hasattr(state, "_fields"):  # NamedTuple states
        children = tuple(getattr(state, f) for f in state._fields)
    elif isinstance(state, dict):
        children = tuple(state.values())
    for child in children:
        found = _find_injected(child)
        if found is not None:
            return found
    return None


def _find_group(state, group):
    """DFS for a multi_transform ``inner_states`` dict carrying
    ``group``, returning that group's sub-state."""
    inner = getattr(state, "inner_states", None)
    if isinstance(inner, dict) and group in inner:
        return inner[group]
    children = ()
    if isinstance(state, (tuple, list)):
        children = state
    elif hasattr(state, "_fields"):
        children = tuple(getattr(state, f) for f in state._fields)
    elif isinstance(state, dict):
        children = tuple(state.values())
    for child in children:
        found = _find_group(child, group)
        if found is not None:
            return found
    return None


def update_learning_rate(optimizer_state, new_lr, group=None):
    """Set the learning rate inside an optax.inject_hyperparams state,
    however deeply it is wrapped (MultiSteps, multi_transform, chains) —
    the jax analogue of reference update_learning_rate :24. Mutates the
    hyperparams dict in place and returns the state.

    With ``group``, only the named ``optax.multi_transform`` branch is
    updated — the two-optimizer fine-tuning pattern (a frozen-ish SSL
    encoder at ``lr_wav2vec`` + the head at ``lr``, reference
    train_with_wav2vec.py's model_optimizer/wav2vec_optimizer split)."""
    scope = optimizer_state
    if group is not None:
        scope = _find_group(optimizer_state, group)
        if scope is None:
            raise ValueError(
                f"No multi_transform group {group!r} in optimizer state"
            )
    target = _find_injected(scope)
    if target is None:
        raise ValueError(
            "Optimizer state has no injected 'learning_rate'; build the "
            "optimizer with optax.inject_hyperparams(optax.adam)"
            "(learning_rate=...)"
        )
    target.hyperparams["learning_rate"] = new_lr
    return optimizer_state


def _save_attrs(obj, path, attrs):
    import json

    with open(path, "w") as f:
        json.dump({a: getattr(obj, a) for a in attrs}, f)


def _load_attrs(obj, path, attrs):
    import json

    with open(path) as f:
        data = json.load(f)
    for a in attrs:
        if a in data:
            setattr(obj, a, data[a])


@register_checkpoint_hooks
class NewBobScheduler:
    """Anneal LR when the (relative) metric improvement falls below a
    threshold, with optional patience (reference nnet/schedulers.py:153).

    Example
    -------
    >>> sch = NewBobScheduler(initial_value=1.0, annealing_factor=0.5)
    >>> sch(1.0)
    (1.0, 1.0)
    >>> sch(1.1)  # got worse -> anneal
    (1.0, 0.5)
    """

    def __init__(self, initial_value, annealing_factor=0.5,
                 improvement_threshold=0.0025, patient=0):
        self.hyperparam_value = initial_value
        self.annealing_factor = annealing_factor
        self.improvement_threshold = improvement_threshold
        self.patient = patient
        self.metric_values = []
        self.current_patient = self.patient

    def __call__(self, metric_value):
        old_value = new_value = self.hyperparam_value
        if len(self.metric_values) > 0:
            prev_metric = self.metric_values[-1]
            if prev_metric == 0:
                improvement = 0
            else:
                improvement = (prev_metric - metric_value) / prev_metric
            if improvement < self.improvement_threshold:
                if self.current_patient == 0:
                    new_value = old_value * self.annealing_factor
                    self.current_patient = self.patient
                else:
                    self.current_patient -= 1
        self.metric_values.append(float(metric_value))
        self.hyperparam_value = new_value
        return old_value, new_value

    @mark_as_saver
    def _save(self, path):
        _save_attrs(self, path, ["hyperparam_value", "metric_values", "current_patient"])

    @mark_as_loader
    def _load(self, path, end_of_epoch=False):
        _load_attrs(self, path, ["hyperparam_value", "metric_values", "current_patient"])


@register_checkpoint_hooks
class LinearScheduler:
    """Linear interpolation over epochs (reference :252 area)."""

    def __init__(self, initial_value, final_value, epoch_count):
        import numpy as np

        self.value_at_epoch = np.linspace(
            initial_value, final_value, num=epoch_count
        ).tolist()

    def __call__(self, current_epoch):
        old_index = max(0, current_epoch - 1)
        index = min(current_epoch, len(self.value_at_epoch) - 1)
        return self.value_at_epoch[old_index], self.value_at_epoch[index]

    @mark_as_saver
    def _save(self, path):
        _save_attrs(self, path, ["value_at_epoch"])

    @mark_as_loader
    def _load(self, path, end_of_epoch=False):
        _load_attrs(self, path, ["value_at_epoch"])


@register_checkpoint_hooks
class LinearWarmupScheduler:
    """Linear warmup then linear decay by steps (reference :300)."""

    def __init__(self, initial_value, num_warmup_steps, num_training_steps):
        self.lr = initial_value
        self.initial_value = initial_value
        self.num_warmup_steps = num_warmup_steps
        self.num_training_steps = num_training_steps
        self.current_step = 0

    def calculate_lr(self, current_step):
        if current_step < self.num_warmup_steps:
            return self.initial_value * current_step / max(1, self.num_warmup_steps)
        return self.initial_value * max(
            0.0,
            (self.num_training_steps - current_step)
            / max(1, self.num_training_steps - self.num_warmup_steps),
        )

    def __call__(self, *args):
        if len(args) == 1 and isinstance(args[0], int):
            # optax-schedule style
            return self.calculate_lr(args[0])
        old = self.lr
        self.current_step += 1
        self.lr = self.calculate_lr(self.current_step)
        return old, self.lr

    @mark_as_saver
    def _save(self, path):
        _save_attrs(self, path, ["lr", "current_step"])

    @mark_as_loader
    def _load(self, path, end_of_epoch=False):
        _load_attrs(self, path, ["lr", "current_step"])


@register_checkpoint_hooks
class NoamScheduler:
    """Transformer warmup-then-inverse-sqrt schedule (reference :489).

    Example
    -------
    >>> sch = NoamScheduler(lr_initial=1.0, n_warmup_steps=2)
    >>> _ = sch(None); _ = sch(None); old, new = sch(None)
    >>> round(new, 3) <= 1.0
    True
    """

    def __init__(self, lr_initial, n_warmup_steps, model_size=None):
        self.lr_initial = lr_initial
        self.n_warmup_steps = n_warmup_steps
        self.current_lr = lr_initial
        self.n_steps = 0
        self.normalize = n_warmup_steps**0.5
        if model_size is not None:
            self.normalize = model_size ** (-0.5)

    def _get_lr_scale(self, step):
        step = max(1, step)
        return self.normalize * min(
            step ** (-0.5), step * self.n_warmup_steps ** (-1.5)
        )

    def __call__(self, opt_or_step=None):
        if isinstance(opt_or_step, int):
            return self.lr_initial * self._get_lr_scale(opt_or_step)
        self.n_steps += 1
        old = self.current_lr
        self.current_lr = self.lr_initial * self._get_lr_scale(self.n_steps)
        return old, self.current_lr

    @mark_as_saver
    def _save(self, path):
        _save_attrs(self, path, ["current_lr", "n_steps"])

    @mark_as_loader
    def _load(self, path, end_of_epoch=False):
        _load_attrs(self, path, ["current_lr", "n_steps"])


@register_checkpoint_hooks
class InverseSquareRootScheduler:
    """Warmup then 1/sqrt(step) decay (reference :1310)."""

    def __init__(self, warmup_steps, lr_initial=1.0):
        self.warmup_steps = warmup_steps
        self.lr_initial = lr_initial
        self.n_steps = 0
        self.current_lr = 0.0

    def calculate_lr(self, step):
        step = max(1, step)
        if step < self.warmup_steps:
            return self.lr_initial * step / self.warmup_steps
        return self.lr_initial * (self.warmup_steps**0.5) * step ** (-0.5)

    def __call__(self, opt_or_step=None):
        if isinstance(opt_or_step, int):
            return self.calculate_lr(opt_or_step)
        self.n_steps += 1
        old = self.current_lr
        self.current_lr = self.calculate_lr(self.n_steps)
        return old, self.current_lr

    @mark_as_saver
    def _save(self, path):
        _save_attrs(self, path, ["n_steps", "current_lr"])

    @mark_as_loader
    def _load(self, path, end_of_epoch=False):
        _load_attrs(self, path, ["n_steps", "current_lr"])


@register_checkpoint_hooks
class CyclicCosineScheduler:
    """Cosine annealing with warm restarts by steps (reference :811)."""

    def __init__(self, n_warmup_steps, lr_initial=None, total_steps=100000):
        self.n_warmup_steps = n_warmup_steps
        self.lr_initial = lr_initial if lr_initial is not None else 1.0
        self.total = total_steps
        self.n_steps = 0
        self.current_lr = self.lr_initial

    def _lr(self, step):
        return self.lr_initial * 0.5 * (
            1.0 + math.cos((step - self.n_warmup_steps) / self.total * math.pi)
        )

    def __call__(self, opt_or_step=None):
        if isinstance(opt_or_step, int):
            return self._lr(opt_or_step)
        self.n_steps += 1
        old = self.current_lr
        self.current_lr = self._lr(self.n_steps)
        return old, self.current_lr

    @mark_as_saver
    def _save(self, path):
        _save_attrs(self, path, ["n_steps", "current_lr"])

    @mark_as_loader
    def _load(self, path, end_of_epoch=False):
        _load_attrs(self, path, ["n_steps", "current_lr"])


@register_checkpoint_hooks
class ReduceLROnPlateau:
    """Reduce LR when a metric plateaus for `patience` epochs
    (reference :909)."""

    def __init__(self, lr_min=1e-8, factor=0.5, patience=2, dont_halve_until_epoch=65):
        self.lr_min = lr_min
        self.factor = factor
        self.patience = patience
        self.patience_counter = 0
        self.losses = []
        self.dont_halve_until_epoch = dont_halve_until_epoch
        self.anchor = 99999.0

    def __call__(self, current_lr, epoch, current_loss):
        if epoch <= self.dont_halve_until_epoch:
            next_lr = current_lr
            self.anchor = current_loss
        else:
            if current_loss <= self.anchor:
                self.patience_counter = 0
                next_lr = current_lr
                self.anchor = current_loss
            elif self.patience_counter < self.patience:
                self.patience_counter += 1
                next_lr = current_lr
            else:
                next_lr = current_lr * self.factor
                self.patience_counter = 0
        next_lr = max(self.lr_min, next_lr)
        self.losses.append(float(current_loss))
        return current_lr, next_lr

    @mark_as_saver
    def _save(self, path):
        _save_attrs(self, path, ["losses", "anchor", "patience_counter"])

    @mark_as_loader
    def _load(self, path, end_of_epoch=False):
        _load_attrs(self, path, ["losses", "anchor", "patience_counter"])


@register_checkpoint_hooks
class CyclicLRScheduler:
    """Triangular cyclic LR by steps (reference :1031)."""

    def __init__(self, base_lr=0.001, max_lr=0.006, step_size=2000, mode="triangular",
                 gamma=1.0):
        self.base_lr = base_lr
        self.max_lr = max_lr
        self.step_size = step_size
        self.mode = mode
        self.gamma = gamma
        self.clr_iterations = 0
        self.current_lr = base_lr

    def _clr(self, it):
        cycle = math.floor(1 + it / (2 * self.step_size))
        x = abs(it / self.step_size - 2 * cycle + 1)
        scale = 1.0
        if self.mode == "triangular2":
            scale = 1 / (2.0 ** (cycle - 1))
        elif self.mode == "exp_range":
            scale = self.gamma**it
        return self.base_lr + (self.max_lr - self.base_lr) * max(0, 1 - x) * scale

    def __call__(self, opt_or_step=None):
        if isinstance(opt_or_step, int):
            return self._clr(opt_or_step)
        self.clr_iterations += 1
        old = self.current_lr
        self.current_lr = self._clr(self.clr_iterations)
        return old, self.current_lr

    @mark_as_saver
    def _save(self, path):
        _save_attrs(self, path, ["clr_iterations", "current_lr"])

    @mark_as_loader
    def _load(self, path, end_of_epoch=False):
        _load_attrs(self, path, ["clr_iterations", "current_lr"])


@register_checkpoint_hooks
class WarmAndExpDecayLRSchedule:
    """Warmup then exponential decay to lr_final over total_steps
    (reference :63)."""

    def __init__(self, lr, n_warmup_steps, total_steps, decay_factor=0.1):
        self.lr = lr
        self.n_warmup_steps = n_warmup_steps
        self.decay_factor = decay_factor
        self.total_steps = total_steps
        self.current_lr = 0.0
        self.n_steps = 0

    def calculate_lr(self, step):
        if step < self.n_warmup_steps:
            return self.lr * step / max(1, self.n_warmup_steps)
        decay = self.decay_factor ** (
            (step - self.n_warmup_steps) / max(1, self.total_steps - self.n_warmup_steps)
        )
        return self.lr * decay

    def __call__(self, opt_or_step=None):
        if isinstance(opt_or_step, int):
            return self.calculate_lr(opt_or_step)
        self.n_steps += 1
        old = self.current_lr
        self.current_lr = self.calculate_lr(self.n_steps)
        return old, self.current_lr

    @mark_as_saver
    def _save(self, path):
        _save_attrs(self, path, ["n_steps", "current_lr"])

    @mark_as_loader
    def _load(self, path, end_of_epoch=False):
        _load_attrs(self, path, ["n_steps", "current_lr"])


@register_checkpoint_hooks
class WarmCoolDecayLRSchedule:
    """Warmup - hold - cooldown three-phase schedule (reference :1360)."""

    def __init__(self, lr, warmup, cooldown, total_steps, decay_factor=0.75,
                 decay_every=100000):
        self.base_lr = lr
        self.warmup = warmup
        self.cooldown = cooldown
        self.total_steps = total_steps
        self.decay_factor = decay_factor
        self.decay_every = decay_every
        self.current_lr = 0.0
        self.n_steps = 0

    def calculate_lr(self, step):
        if step <= self.warmup:
            return self.base_lr * step / max(1, self.warmup)
        if step < self.total_steps - self.cooldown:
            decays = (step - self.warmup) // self.decay_every
            return self.base_lr * (self.decay_factor**decays)
        # linear cooldown to zero
        decays = (self.total_steps - self.cooldown - self.warmup) // self.decay_every
        plateau_lr = self.base_lr * (self.decay_factor**max(0, decays))
        frac = (self.total_steps - step) / max(1, self.cooldown)
        return plateau_lr * max(0.0, frac)

    def __call__(self, opt_or_step=None):
        if isinstance(opt_or_step, int):
            return self.calculate_lr(opt_or_step)
        self.n_steps += 1
        old = self.current_lr
        self.current_lr = self.calculate_lr(self.n_steps)
        return old, self.current_lr

    @mark_as_saver
    def _save(self, path):
        _save_attrs(self, path, ["n_steps", "current_lr"])

    @mark_as_loader
    def _load(self, path, end_of_epoch=False):
        _load_attrs(self, path, ["n_steps", "current_lr"])


@register_checkpoint_hooks
class TriStageLRSchedule:
    """fairseq-style tri-stage: warmup / hold / exponential decay
    (reference :1576)."""

    def __init__(self, lr, phase_ratio=(0.1, 0.4, 0.5), init_lr_scale=0.01,
                 final_lr_scale=0.01, total_steps=100000):
        self.peak_lr = lr
        self.init_lr = init_lr_scale * lr
        self.final_lr = final_lr_scale * lr
        self.warmup_steps = int(total_steps * phase_ratio[0])
        self.hold_steps = int(total_steps * phase_ratio[1])
        self.decay_steps = int(total_steps * phase_ratio[2])
        self.n_steps = 0
        self.current_lr = self.init_lr

    def calculate_lr(self, step):
        if step < self.warmup_steps:
            return self.init_lr + (self.peak_lr - self.init_lr) * step / max(
                1, self.warmup_steps
            )
        offset = step - self.warmup_steps
        if offset < self.hold_steps:
            return self.peak_lr
        offset -= self.hold_steps
        if offset <= self.decay_steps:
            factor = -math.log(max(1e-12, self.final_lr / self.peak_lr)) / max(
                1, self.decay_steps
            )
            return self.peak_lr * math.exp(-factor * offset)
        return self.final_lr

    def __call__(self, opt_or_step=None):
        if isinstance(opt_or_step, int):
            return self.calculate_lr(opt_or_step)
        self.n_steps += 1
        old = self.current_lr
        self.current_lr = self.calculate_lr(self.n_steps)
        return old, self.current_lr

    @mark_as_saver
    def _save(self, path):
        _save_attrs(self, path, ["n_steps", "current_lr"])

    @mark_as_loader
    def _load(self, path, end_of_epoch=False):
        _load_attrs(self, path, ["n_steps", "current_lr"])


@register_checkpoint_hooks
class IntervalScheduler:
    """Explicit (step, lr) breakpoints with linear interpolation
    (reference :700 area)."""

    def __init__(self, intervals):
        # intervals: list of {"steps": int, "lr": float}, ascending steps
        self.intervals = sorted(intervals, key=lambda d: d["steps"])
        self.n_steps = 0
        self.current_lr = self.intervals[0]["lr"] if self.intervals else 0.0

    def calculate_lr(self, step):
        lr = self.intervals[0]["lr"]
        for iv in self.intervals:
            if step >= iv["steps"]:
                lr = iv["lr"]
        return lr

    def __call__(self, opt_or_step=None):
        if isinstance(opt_or_step, int):
            return self.calculate_lr(opt_or_step)
        self.n_steps += 1
        old = self.current_lr
        self.current_lr = self.calculate_lr(self.n_steps)
        return old, self.current_lr

    @mark_as_saver
    def _save(self, path):
        _save_attrs(self, path, ["n_steps", "current_lr"])

    @mark_as_loader
    def _load(self, path, end_of_epoch=False):
        _load_attrs(self, path, ["n_steps", "current_lr"])


@register_checkpoint_hooks
class ScheduledLoss:
    """Switch between loss functions on a step schedule (reference :1481)."""

    def __init__(self, schedule):
        # schedule: list of {"steps": int, "loss_fn": callable}; last runs forever
        self.schedule = schedule
        self.n_steps = 0

    def __call__(self, *args, **kwargs):
        self.n_steps += 1
        acc = 0
        for entry in self.schedule:
            acc += entry.get("steps", float("inf"))
            if self.n_steps <= acc:
                return entry["loss_fn"](*args, **kwargs)
        return self.schedule[-1]["loss_fn"](*args, **kwargs)

    @mark_as_saver
    def _save(self, path):
        _save_attrs(self, path, ["n_steps"])

    @mark_as_loader
    def _load(self, path, end_of_epoch=False):
        _load_attrs(self, path, ["n_steps"])


@register_checkpoint_hooks
class StepScheduler:
    """lr = initial * decay^floor((1+epoch)/decay_epochs) (reference area)."""

    def __init__(self, initial_value, decay_factor=0.5, decay_drop=2, half_life=None):
        self.initial_value = initial_value
        if half_life is not None:
            self.decay_factor = math.exp(math.log(0.5) / half_life)
            self.decay_drop = 1
        else:
            self.decay_factor = decay_factor
            self.decay_drop = decay_drop

    def __call__(self, current_epoch):
        current = self.initial_value * math.pow(
            self.decay_factor, math.floor(current_epoch / self.decay_drop)
        )
        next_value = self.initial_value * math.pow(
            self.decay_factor, math.floor((1 + current_epoch) / self.decay_drop)
        )
        return current, next_value

    @mark_as_saver
    def _save(self, path):
        _save_attrs(self, path, ["initial_value"])

    @mark_as_loader
    def _load(self, path, end_of_epoch=False):
        _load_attrs(self, path, ["initial_value"])
