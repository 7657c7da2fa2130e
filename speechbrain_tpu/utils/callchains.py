"""Call-chain helpers (reference ``speechbrain/utils/callchains.py``)."""

import inspect


def lengths_arg_exists(func):
    """True if ``func`` accepts a ``lengths`` argument
    (reference callchains.py:6)."""
    try:
        spec = inspect.signature(func)
    except (TypeError, ValueError):
        return False
    return "lengths" in spec.parameters


class LengthsCapableChain:
    """Chain of callables that forwards ``lengths`` to those that take it
    (reference callchains.py:22).

    Example
    -------
    >>> chain = LengthsCapableChain(lambda x: x + 1,
    ...                             lambda x, lengths: x * lengths)
    >>> chain(3, lengths=2)
    8
    """

    def __init__(self, *funcs):
        self.funcs = []
        self.takes_lengths = []
        for f in funcs:
            self.append(f)

    def append(self, func):
        """Add a callable to the end of the chain."""
        self.funcs.append(func)
        self.takes_lengths.append(lengths_arg_exists(func))

    def __call__(self, x, lengths=None):
        if not self.funcs:
            return None
        for func, takes in zip(self.funcs, self.takes_lengths):
            if takes and lengths is not None:
                x = func(x, lengths=lengths)
            else:
                x = func(x)
            if isinstance(x, tuple):
                x = x[0]
        return x
