"""Post-processing tokenizer for DiscreteSSL semantic tokens.

Capability parity with the reference's
``speechbrain/tokenizers/discrete_SSL_tokenizer.py``
(DiscreteSSLTokenizer at discrete_SSL_tokenizer.py:11): per-layer token
offsets (layer_idx * num_clusters), optional per-layer deduplication and
sentencepiece subwording, zero-padding; a +1 shift protects pad id 0
when no BPE is applied.
"""

import numpy as np


class DiscreteSSLTokenizer:
    """Post-process (B, T, n_layers) discrete-SSL token grids.

    Example
    -------
    >>> import numpy as np
    >>> toks = np.random.default_rng(0).integers(0, 1000, (3, 6, 2))
    >>> tok = DiscreteSSLTokenizer(num_clusters=[1000, 2000])
    >>> out = tok.encode(toks, SSL_layers=[7, 23],
    ...                  deduplicates=[False, True],
    ...                  bpe_tokenizers=[None, None])
    >>> out.shape
    (3, 6, 2)
    """

    def __init__(self, num_clusters):
        self.num_clusters = (
            list(num_clusters)
            if isinstance(num_clusters, (list, tuple))
            else [num_clusters]
        )

    def textify(self, tokens):
        """Token ids -> char strings for sentencepiece training
        (reference :textify)."""
        return [
            " ".join(chr(int(t) + 97) for t in row) for row in np.asarray(tokens)
        ]

    def encode(self, input, SSL_layers=None, deduplicates=None,
               bpe_tokenizers=None):
        """Offset + dedup + (optional) BPE each layer; zero-padded
        (B, T, n_layers) output."""
        arr = np.asarray(input)
        B, T, L = arr.shape
        if SSL_layers is None:
            SSL_layers = list(range(L))
        if deduplicates is None:
            deduplicates = [False] * L
        if bpe_tokenizers is None:
            bpe_tokenizers = [None] * L
        out_layers = []
        for li in range(L):
            ncl = self.num_clusters[li % len(self.num_clusters)]
            offset = sum(
                self.num_clusters[i % len(self.num_clusters)]
                for i in range(li)
            )
            rows = []
            for b in range(B):
                ids = arr[b, :, li].tolist()
                if deduplicates[li]:
                    ids = [t for i, t in enumerate(ids)
                           if i == 0 or t != ids[i - 1]]
                bpe = bpe_tokenizers[li]
                if bpe is not None:
                    text = " ".join(chr(int(t) + 97) for t in ids)
                    ids = bpe.encode_as_ids(text)
                else:
                    # +1 shields pad id 0; add the layer offset
                    ids = [t + 1 + offset for t in ids]
                rows.append(ids)
            width = max(len(r) for r in rows)
            padded = np.zeros((B, width), np.int64)
            for b, r in enumerate(rows):
                padded[b, : len(r)] = r
            out_layers.append(padded)
        width = max(o.shape[1] for o in out_layers)
        out = np.zeros((B, width, L), np.int64)
        for li, o in enumerate(out_layers):
            out[:, : o.shape[1], li] = o
        return out
