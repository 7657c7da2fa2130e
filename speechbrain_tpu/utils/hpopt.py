"""Hyperparameter-optimization reporting.

Capability parity with the reference's ``speechbrain/utils/hpopt.py``
(hpopt_mode registry :43, GenericHyperparameterOptimizationReporter :124,
OrionReporter :192, hyperparameter_optimization context :310/:425,
report_result :453): a context manager wiring per-trial overrides and a
pluggable result reporter (stdout JSON by default, Orion when installed).
"""

import contextlib
import json
import os
import sys

from speechbrain_tpu.utils.logger import get_logger

logger = get_logger(__name__)

_hpopt_modes = {}
_current_context = None

KEY_HPOPT = "hpopt"
KEY_HPOPT_MODE = "hpopt_mode"
DEFAULT_TRIAL_ID = "hpopt"


def hpopt_mode(mode):
    """Decorator registering a reporter class for a mode (reference :43).

    Example
    -------
    >>> @hpopt_mode("null")
    ... class NullReporter(GenericHyperparameterOptimizationReporter):
    ...     pass
    """

    def decorator(cls):
        _hpopt_modes[mode] = cls
        return cls

    return decorator


class GenericHyperparameterOptimizationReporter:
    """Base reporter: print the objective as JSON (reference :124)."""

    def __init__(self, objective_key=None, output=None, reference_date=None,
                 *args, **kwargs):
        self.objective_key = objective_key
        self.output = output or sys.stdout

    def report_objective(self, result):
        json.dump(result, self.output)
        self.output.write("\n")

    @property
    def trial_id(self):
        return DEFAULT_TRIAL_ID


@hpopt_mode("generic")
class GenericReporter(GenericHyperparameterOptimizationReporter):
    """Default reporter: logs the objective to the output file."""
    pass


@hpopt_mode("orion")
class OrionReporter(GenericHyperparameterOptimizationReporter):
    """Report to Orion when available (reference :192)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        try:
            import orion.client

            self.orion_client = orion.client
        except ImportError as e:  # pragma: no cover
            raise ImportError("pip install orion to use hpopt_mode='orion'") from e

    def report_objective(self, result):
        value = result[self.objective_key]
        self.orion_client.report_objective(value)

    @property
    def trial_id(self):
        return os.environ.get("ORION_TRIAL_ID", DEFAULT_TRIAL_ID)


class HyperparameterOptimizationContext:
    """Parses --hpopt args and holds the reporter (reference :310)."""

    def __init__(self, reporter_args=None, reporter_kwargs=None):
        self.reporter_args = reporter_args or []
        self.reporter_kwargs = reporter_kwargs or {}
        self.reporter = None
        self.result = {"objective": 0.0}
        self.enabled = False

    def parse_arguments(self, arg_list):
        """Strip --hpopt/--hpopt_mode args; overlay hpopt.yaml overrides."""
        from speechbrain_tpu.core import parse_arguments as base_parse

        hparams_file, run_opts, overrides = base_parse(arg_list)
        hpopt = overrides.pop(KEY_HPOPT, False)
        mode = overrides.pop(KEY_HPOPT_MODE, "generic")
        if hpopt:
            self.enabled = True
            cls = _hpopt_modes[mode]
            self.reporter = cls(*self.reporter_args, **self.reporter_kwargs)
            if isinstance(hpopt, str) and os.path.exists(hpopt):
                import yaml

                with open(hpopt, encoding="utf-8") as f:
                    trial_overrides = yaml.safe_load(f) or {}
                overrides.update(trial_overrides)
        return hparams_file, run_opts, overrides

    def __enter__(self):
        global _current_context
        _current_context = self
        return self

    def __exit__(self, exc_type, exc_value, traceback):
        global _current_context
        if exc_type is None and self.enabled and self.reporter:
            self.reporter.report_objective(self.result)
        _current_context = None
        return False


@contextlib.contextmanager
def hyperparameter_optimization(*args, **kwargs):
    """Context manager for an hpopt-capable training script
    (reference :425)."""
    ctx = HyperparameterOptimizationContext(args, kwargs)
    with ctx:
        yield ctx


def report_result(result):
    """Record the final trial result (reference :453)."""
    if _current_context is not None:
        _current_context.result = dict(result)


def get_trial_id():
    """Current hyperparameter-search trial id (or a default)."""
    if _current_context is not None and _current_context.reporter:
        return _current_context.reporter.trial_id
    return DEFAULT_TRIAL_ID
