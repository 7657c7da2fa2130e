"""Distance utilities.

Capability parity with the reference's ``speechbrain/utils/distances.py``
(cosine_similarity_matrix).
"""

import jax.numpy as jnp


def cosine_similarity_matrix(a, b, eps=1e-8):
    """Pairwise cosine similarity (N, D) x (M, D) -> (N, M).

    Example
    -------
    >>> import jax.numpy as jnp
    >>> m = cosine_similarity_matrix(jnp.eye(2), jnp.eye(2))
    >>> m.shape
    (2, 2)
    >>> float(m[0, 0])
    1.0
    """
    a_n = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), eps)
    b_n = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), eps)
    return a_n @ b_n.T
