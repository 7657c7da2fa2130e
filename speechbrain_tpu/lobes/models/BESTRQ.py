"""BEST-RQ self-supervised pretraining head.

Capability parity with the reference's
``speechbrain/lobes/models/BESTRQ.py`` (brq_mask + linear classification
over random-projection-quantized targets).
"""

import jax
import jax.numpy as jnp


def brq_mask(shape, mask_prob, mask_length, rng):
    """Span masks for BEST-RQ (same sampler as wav2vec)."""
    from speechbrain_tpu.lobes.models.wav2vec import w2v_mask

    return w2v_mask(shape, mask_prob, mask_length, rng)


def compute_brq_loss(logits, targets, mask):
    """Cross-entropy between predictions at masked positions and the
    random-projection codeword ids (reference BESTRQ.py)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    mask = mask.astype(ll.dtype)
    return -jnp.sum(ll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def brq_accuracy(logits, targets, mask):
    """Masked top-1 accuracy of codeword prediction."""
    pred = jnp.argmax(logits, axis=-1)
    correct = (pred == targets).astype(jnp.float32) * mask
    return jnp.sum(correct) / jnp.maximum(jnp.sum(mask), 1.0)


def compute_mask(shape, sample_lens, mask_prob, mask_length, rng=None):
    """Batch-level BEST-RQ mask indices (reference BESTRQ.py:15): out of
    the SHORTEST utterance's frames, spawn ``mask_prob * min_len`` masks
    of ``mask_length`` contiguous frames, one shared index set for the
    whole batch. Returns a 1-D int array of masked frame indices.

    Example
    -------
    >>> import jax
    >>> idx = compute_mask((2, 50, 60), [40, 50], 0.15, 2,
    ...                    jax.random.PRNGKey(0))
    >>> idx.shape[0] % 2 == 0
    True
    """
    import numpy as np

    min_len = int(min(sample_lens))
    if rng is None:
        rng = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(rng)
    # probabilistic rounding of the mask count (reference adds a uniform)
    frac = mask_prob * min_len
    num_mask = int(frac) + int(
        jax.random.uniform(k1) < (frac - int(frac))
    )
    num_mask = max(1, num_mask)
    n_slots = max(1, min_len // mask_length)
    perm = jax.random.permutation(k2, n_slots)[:num_mask]
    starts = np.sort(np.asarray(perm)) * mask_length
    idx = np.concatenate(
        [np.arange(s, s + mask_length) for s in starts]
    )
    return jnp.asarray(idx, jnp.int32)


def brq_mask_collate_fn(samples_lst, get_out_len_fn, mask_prob, mask_length,
                        n_mels, rng=None):
    """Collate a list of {'id', 'sig'} samples into (wavs, wav_lens,
    mask) with the shared BEST-RQ frame mask (reference BESTRQ.py:75)."""
    import numpy as np

    from speechbrain_tpu.utils.data_utils import batch_pad_right

    wav_lst, latent_lens = [], []
    for sample in samples_lst:
        sig = np.asarray(sample["sig"])
        wav_lst.append(sig)
        latent_lens.append(int(get_out_len_fn(sig.shape[-1])))
    wavs_padded, wav_lens = batch_pad_right(wav_lst)
    mask = compute_mask(
        (len(wav_lst), max(latent_lens), n_mels), latent_lens, mask_prob,
        mask_length, rng,
    )
    return jnp.asarray(wavs_padded), jnp.asarray(wav_lens), mask
