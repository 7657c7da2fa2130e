"""Run options (re-export).

Capability parity with the reference's ``speechbrain/utils/run_opts.py``
(RunOptions :58, parse_arguments :245) — the implementation lives in
``speechbrain_tpu.core``; this module mirrors the reference's import path.
"""

from speechbrain_tpu.core import RunOptions, parse_arguments  # noqa: F401


def from_command_line_args(arg_list=None):
    """Build (hparams_file, RunOptions, overrides) from argv."""
    hparams_file, run_opts, overrides = parse_arguments(arg_list)
    return hparams_file, RunOptions.from_dict(run_opts), overrides
