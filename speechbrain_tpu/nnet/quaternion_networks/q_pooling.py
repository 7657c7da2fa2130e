"""Quaternion-valued pooling.

Capability parity with the reference's
``speechbrain/nnet/quaternion_networks/q_pooling.py:1-125`` (QPooling2d):
average pooling pools each quaternion component independently; max
pooling selects, within each window, the FULL quaternion whose magnitude
|q|^2 = r^2 + i^2 + j^2 + k^2 is largest ("Geometric methods of
perceptual organisation for computer vision", Altamirano G.).

TPU-native design: instead of the reference's pool-with-indices +
flat-gather round trip, windows are extracted once as static-shape
patches (``lax.conv_general_dilated_patches``) and the winning
quaternion is picked with an argmax + ``take_along_axis`` over the
window axis — one fused XLA program, no dynamic shapes.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp


def _pair(v):
    if isinstance(v, (tuple, list)):
        return tuple(int(x) for x in v)
    return (int(v), int(v))


class QPooling2d(nn.Module):
    """2-D pooling over (time, feat/4) of a quaternion tensor whose last
    axis holds the four components in chunks [r | i | j | k]
    (reference q_pooling.py:12).

    Arguments
    ---------
    pool_type : str
        'avg' or 'max' (max = by quaternion magnitude).
    kernel_size : int or tuple
    stride : int or tuple
        Defaults to kernel_size (like torch pooling).
    padding : int
    dilation : int

    Example
    -------
    >>> import jax.numpy as jnp
    >>> pool = QPooling2d("max", (5, 3))
    >>> x = jnp.ones((10, 15, 12))
    >>> pool.apply({}, x).shape
    (10, 3, 4)
    """

    pool_type: str = "max"
    kernel_size: tuple = (1, 1)
    stride: tuple = None
    padding: int = 0
    dilation: int = 1

    def _patches(self, c, kT, kF, sT, sF):
        """(B, T, F) -> (B, To, Fo, kT*kF) sliding windows."""
        d = self.dilation
        p = self.padding
        out = jax.lax.conv_general_dilated_patches(
            c[:, None],  # (B, 1, T, F)
            filter_shape=(kT, kF),
            window_strides=(sT, sF),
            padding=((p, p), (p, p)),
            rhs_dilation=(d, d),
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )  # (B, kT*kF, To, Fo)
        return jnp.moveaxis(out, 1, -1)

    @nn.compact
    def __call__(self, x):
        kT, kF = _pair(self.kernel_size)
        sT, sF = _pair(self.stride) if self.stride is not None else (kT, kF)
        comps = jnp.split(x, 4, axis=-1)  # r, i, j, k: each (B, T, F/4)
        if self.pool_type == "avg":
            pooled = []
            for c in comps:
                pat = self._patches(c, kT, kF, sT, sF)
                pooled.append(jnp.mean(pat, axis=-1))
            return jnp.concatenate(pooled, axis=-1)
        if self.pool_type != "max":
            raise ValueError(f"pool_type must be 'avg' or 'max', got {self.pool_type!r}")
        pats = [self._patches(c, kT, kF, sT, sF) for c in comps]
        mag = sum(p * p for p in pats)  # (B, To, Fo, kT*kF)
        idx = jnp.argmax(mag, axis=-1, keepdims=True)
        picked = [
            jnp.take_along_axis(p, idx, axis=-1)[..., 0] for p in pats
        ]
        return jnp.concatenate(picked, axis=-1)
