"""Shell helpers.

Capability parity with the reference's ``speechbrain/utils/superpowers.py``
(run_shell, import_from_path).
"""

import importlib.util
import subprocess

from speechbrain_tpu.utils.logger import get_logger

logger = get_logger(__name__)


def run_shell(cmd):
    """Run a shell command; returns (stdout, stderr, returncode).

    Example
    -------
    >>> out, err, code = run_shell("echo hi")
    >>> code
    0
    """
    p = subprocess.Popen(
        cmd, stdout=subprocess.PIPE, stderr=subprocess.PIPE, shell=True
    )
    output, err = p.communicate()
    if p.returncode != 0:
        logger.error("Shell command failed: %s\n%s", cmd, err.decode(errors="replace"))
    return output, err, p.returncode


def import_from_path(path, module_name="custom_module"):
    """Import a python file as a module."""
    spec = importlib.util.spec_from_file_location(module_name, path)
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module
