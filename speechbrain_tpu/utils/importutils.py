"""Lazy module export + deprecation redirects.

Capability parity with the reference's ``speechbrain/utils/importutils.py``
(lazy_export_all :17, deprecated_redirect :115).
"""

import importlib
import sys
import warnings


class LazyModule:
    """Defer a submodule import until first attribute access.

    Example
    -------
    >>> mod = LazyModule("json")
    >>> mod.dumps({"a": 1})
    '{"a": 1}'
    """

    def __init__(self, target):
        self.target = target
        self._module = None

    def _load(self):
        if self._module is None:
            self._module = importlib.import_module(self.target)
        return self._module

    def __getattr__(self, name):
        if name in ("target", "_module", "_load"):
            raise AttributeError(name)
        return getattr(self._load(), name)


def lazy_export_all(package_name, submodules):
    """Install LazyModule attributes on a package for each submodule."""
    pkg = sys.modules[package_name]
    for sub in submodules:
        setattr(pkg, sub, LazyModule(f"{package_name}.{sub}"))


def deprecated_redirect(old_name, new_name, extra_reason=""):
    """Make importing old_name resolve to new_name with a warning."""

    class _Redirect(LazyModule):
        def _load(self):
            if self._module is None:
                warnings.warn(
                    f"{old_name} is deprecated; use {new_name}. {extra_reason}",
                    DeprecationWarning,
                    stacklevel=3,
                )
                self._module = importlib.import_module(new_name)
            return self._module

    sys.modules[old_name] = _Redirect(new_name)


def deprecated(reason=""):
    """Decorator emitting a DeprecationWarning on call."""

    def decorator(fn):
        import functools

        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            warnings.warn(
                f"{fn.__qualname__} is deprecated. {reason}",
                DeprecationWarning,
                stacklevel=2,
            )
            return fn(*args, **kwargs)

        return wrapper

    return decorator
