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
