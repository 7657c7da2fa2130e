"""Augmentation orchestrator.

Capability parity with the reference's ``speechbrain/augment/augmenter.py``
(Augmenter :18): pick N of K augmentations per batch, apply in parallel or
sequence, optionally concatenate the originals (growing the batch), and
replicate labels to match.

RNG is explicit and split per augmentation; selection randomness is
host-side (per batch), the augmentations themselves are jit-safe.
"""

import inspect

import jax
import jax.numpy as jnp
import numpy as np

from speechbrain_tpu.utils.logger import get_logger

logger = get_logger(__name__)


class Augmenter:
    """Apply a configurable subset of augmentations to a batch.

    Arguments (mirror reference augmenter.py:18)
    ---------
    parallel_augment : bool
        Apply each chosen augmentation to the ORIGINAL input and concat
        results (batch grows) instead of chaining.
    concat_original : bool
        Prepend the clean batch to the output.
    min_augmentations / max_augmentations : int
        How many of the available augmentations to pick each call.
    shuffle_augmentations : bool
    repeat_augment : int
        Apply the whole pipeline this many times, concatenating.
    augment_prob : float
        Probability the batch is augmented at all.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> from speechbrain_tpu.augment.time_domain import RandAmp
    >>> aug = Augmenter(concat_original=True, augmentations=[RandAmp()])
    >>> wavs, lens = aug(jnp.ones((2, 100)), jnp.ones(2), rng=jax.random.PRNGKey(0))
    >>> wavs.shape[0]
    4
    """

    def __init__(
        self,
        parallel_augment=False,
        parallel_augment_fixed_bs=False,
        concat_original=False,
        min_augmentations=None,
        max_augmentations=None,
        shuffle_augmentations=False,
        repeat_augment=1,
        augment_prob=1.0,
        augmentations=(),
        enable_augmentations=None,
    ):
        self.parallel_augment = parallel_augment
        self.concat_original = concat_original
        self.augmentations = list(augmentations)
        if enable_augmentations is not None:
            self.augmentations = [
                a for a, ok in zip(self.augmentations, enable_augmentations) if ok
            ]
        n = len(self.augmentations)
        self.min_augmentations = min_augmentations if min_augmentations is not None else n
        self.max_augmentations = max_augmentations if max_augmentations is not None else n
        self.shuffle_augmentations = shuffle_augmentations
        self.repeat_augment = repeat_augment
        self.augment_prob = augment_prob
        self._host_rng = np.random.default_rng(0)

    def _call_aug(self, aug, x, lengths, rng):
        sig = inspect.signature(aug.__call__)
        kwargs = {}
        if "rng" in sig.parameters:
            kwargs["rng"] = rng
        if "lengths" in sig.parameters and lengths is not None:
            kwargs["lengths"] = lengths
        return aug(x, **kwargs)

    def __call__(self, x, lengths=None, rng=None):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        if self._host_rng.random() > self.augment_prob or not self.augmentations:
            return x, lengths
        outputs = []
        out_lens = []
        if self.concat_original:
            outputs.append(x)
            out_lens.append(lengths)
        for rep in range(self.repeat_augment):
            n_aug = int(
                self._host_rng.integers(
                    self.min_augmentations, self.max_augmentations + 1
                )
            )
            order = list(range(len(self.augmentations)))
            if self.shuffle_augmentations:
                self._host_rng.shuffle(order)
            chosen = order[:n_aug]
            if self.parallel_augment:
                for j, i in enumerate(chosen):
                    k = jax.random.fold_in(rng, rep * 100 + j)
                    outputs.append(
                        self._call_aug(self.augmentations[i], x, lengths, k)
                    )
                    out_lens.append(lengths)
            else:
                y = x
                for j, i in enumerate(chosen):
                    k = jax.random.fold_in(rng, rep * 100 + j)
                    y = self._call_aug(self.augmentations[i], y, lengths, k)
                outputs.append(y)
                out_lens.append(lengths)
        out = jnp.concatenate(outputs, axis=0) if len(outputs) > 1 else outputs[0]
        if lengths is not None:
            lens = (
                jnp.concatenate(out_lens, axis=0)
                if len(out_lens) > 1
                else out_lens[0]
            )
        else:
            lens = None
        return out, lens

    def replicate_labels(self, *label_arrays):
        """Tile labels to match the augmented batch growth
        (reference augmenter.py: replicate_labels)."""
        n_copies = (1 if self.concat_original else 0) + (
            self.repeat_augment
            * (self.max_augmentations if self.parallel_augment else 1)
        )
        out = []
        for arr in label_arrays:
            reps = (n_copies,) + (1,) * (arr.ndim - 1)
            out.append(jnp.tile(arr, reps))
        return out if len(out) > 1 else out[0]
