"""Word-embedding utilities (reference
``speechbrain/integrations/huggingface/wordemb/util.py``)."""

import jax.numpy as jnp


def expand_to_chars(emb, seq, seq_len, word_separator):
    """Expand word embeddings to character positions: each character
    gets its word's embedding; separators and positions beyond the
    relative length are zero (reference util.py:11). Vectorized over
    the batch (the reference loops host-side).

    Arguments
    ---------
    emb : (B, W, E) word embeddings.
    seq : (B, T) character ids.
    seq_len : (B,) relative lengths.
    word_separator : int

    Example
    -------
    >>> import jax.numpy as jnp
    >>> emb = jnp.asarray([[[1.0, 2.0], [3.0, 1.0]]])
    >>> seq = jnp.asarray([[1, 0, 2, 9]])
    >>> expand_to_chars(emb, seq, jnp.asarray([0.75]), 0)[0].tolist()
    [[1.0, 2.0], [0.0, 0.0], [3.0, 1.0], [0.0, 0.0]]
    """
    emb = jnp.asarray(emb)
    seq = jnp.asarray(seq)
    boundaries = seq == word_separator
    words = jnp.cumsum(boundaries, axis=-1)
    out = jnp.take_along_axis(emb, words[..., None], axis=1)
    T = seq.shape[-1]
    valid = (
        jnp.arange(T)[None, :]
        < (jnp.asarray(seq_len) * T).astype(jnp.int32)[:, None]
    )
    keep = valid & ~boundaries
    return jnp.where(keep[..., None], out, 0.0)
