"""Package doctests as an enforced tier of the default suite (the
analogue of the reference CI's doctest job,
ref .github/workflows/pythonapp.yml:30-58). Runs pytest's doctest
collector over the whole package in a subprocess; the package-level
``speechbrain_tpu/conftest.py`` forces the CPU backend and skips
modules gated on unbundled optional deps."""

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]


def test_package_doctests_pass():
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    env["TF_CPP_MIN_LOG_LEVEL"] = "3"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    proc = subprocess.run(
        # explicit path arg overrides testpaths; pyproject still supplies
        # the doctest optionflags (ELLIPSIS NORMALIZE_WHITESPACE)
        [
            sys.executable, "-m", "pytest", "--doctest-modules",
            "speechbrain_tpu", "-q", "-p", "no:cacheprovider",
        ],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=3000,
    )
    assert proc.returncode == 0, (
        f"package doctests failed:\n{proc.stdout[-6000:]}\n"
        f"{proc.stderr[-2000:]}"
    )
