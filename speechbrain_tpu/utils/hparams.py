"""Hyperparameter helpers.

Capability parity with the reference's ``speechbrain/utils/hparams.py``
(choice :8): a YAML-friendly switch statement, usable via !apply: in
hyperyaml configs.
"""


def choice(value, choices, default=None, apply=False):
    """Select from a mapping by value (reference hparams.py:8).

    Example
    -------
    >>> choice("b", {"a": 1, "b": 2})
    2
    >>> choice("z", {"a": 1}, default=0)
    0
    """
    result = choices.get(value, default)
    if apply and callable(result):
        return result()
    return result
