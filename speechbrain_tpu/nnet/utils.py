"""Small nnet helpers.

Capability parity with the reference's ``speechbrain/nnet/utils.py``
(DoneDetector at utils.py:13): wraps a frame-classifier so masking is
applied BEFORE the output nonlinearity — the model cannot emit
probability mass in padded frames.
"""

import jax.numpy as jnp


class DoneDetector:
    """Masked end-of-speech detector head (reference nnet/utils.py:13).

    ``model`` and ``out`` are callables (bound flax applies or plain
    fns); ``__call__(preds, length)`` masks model outputs past the
    relative ``length`` before applying ``out``.

    Example
    -------
    >>> import jax.numpy as jnp
    >>> det = DoneDetector(model=lambda x: x[..., :1],
    ...                    out=lambda x: jnp.where(x > 0, 1.0, 0.0))
    >>> preds = jnp.ones((2, 4, 3))
    >>> out = det(preds, jnp.asarray([1.0, 0.5]))
    >>> out[1, :, 0].tolist()  # second half masked for the 0.5-len item
    [1.0, 1.0, 0.0, 0.0]
    """

    def __init__(self, model, out):
        self.model = model
        self.out = out

    def __call__(self, preds, length=None):
        y = self.model(preds)
        if length is not None:
            T = y.shape[1]
            mask = (
                jnp.arange(T)[None, :] < jnp.round(length * T)[:, None]
            ).astype(y.dtype)
            y = y * mask[:, :, None] if y.ndim == 3 else y * mask
        return self.out(y)
