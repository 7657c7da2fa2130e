"""Discrete SSL tokenization: quantize SSL hidden states into audio tokens.

Capability parity with the reference's
``speechbrain/integrations/audio_tokenizers/discrete_ssl.py``
(DiscreteSSL at discrete_ssl.py:26), re-designed for TPU:

- Token assignment for every requested layer runs as one batched,
  jittable matmul against the stacked codebooks (the reference calls
  sklearn ``predict`` per layer on CPU).
- Codebooks (k-means cluster centers) are passed in directly as arrays
  or ``MiniBatchKMeans`` objects — this offline environment cannot
  download the reference's HF-hosted k-means checkpoints; fetch+convert
  them via ``utils.fetching`` / ``np.load`` instead.
- Deduplication and BPE are host-side post-processing (variable-length
  by nature), matching the reference's behavior.
"""

import jax
import jax.numpy as jnp
import numpy as np

from speechbrain_tpu.utils.kmeans import kmeans_predict


class DiscreteSSL:
    """SSL features -> discrete tokens (+ optional vocoder decode).

    Arguments
    ---------
    ssl_model : callable
        ``ssl_model(wav, wav_lens)`` returning all hidden states stacked
        as ``(num_layers, B, T, D)`` (e.g. ``WeightedSSLModel`` with
        ``output_all_hiddens=True``).
    codebooks : dict[int, array or MiniBatchKMeans]
        Per-SSL-layer cluster centers ``(K, D)``.
    vocoder : callable, optional
        ``vocoder(tokens_with_offset)`` -> waveform, for ``decode``.
    sample_rate : int

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> D, K = 8, 5
    >>> cb = jax.random.normal(jax.random.PRNGKey(0), (K, D))
    >>> def ssl(wav, lens=None):
    ...     f = jnp.stack([wav[..., None] * jnp.ones((D,))] * 3)
    ...     return f  # (L=3, B, T, D)
    >>> model = DiscreteSSL(ssl, {1: cb, 2: cb})
    >>> toks, emb, proc = model.encode(jnp.ones((2, 10)))
    >>> toks.shape
    (2, 10, 2)
    """

    def __init__(self, ssl_model, codebooks, vocoder=None, sample_rate=16000):
        self.ssl_model = ssl_model
        self.vocoder = vocoder
        self.sample_rate = sample_rate
        self.ssl_layer_ids = sorted(codebooks)
        self.vocabularies = []
        for lid in self.ssl_layer_ids:
            cb = codebooks[lid]
            centers = getattr(cb, "centers", cb)
            self.vocabularies.append(jnp.asarray(centers, jnp.float32))
        self.num_clusters = [v.shape[0] for v in self.vocabularies]

    def _extract(self, wav, wav_lens):
        if hasattr(self.ssl_model, "extract_features"):
            return self.ssl_model.extract_features(wav, wav_lens)
        return self.ssl_model(wav, wav_lens)

    def encode(self, wav, wav_lens=None, SSL_layers=None, deduplicates=None,
               bpe_tokenizers=None):
        """Returns ``(tokens, emb, processed_tokens)``: tokens
        ``(B, T, n_layers)``, per-token center embeddings
        ``(B, T, n_layers, D)``, and host-side processed token lists
        (dedup/BPE applied per layer)."""
        if SSL_layers is None:
            SSL_layers = self.ssl_layer_ids
        if deduplicates is None:
            deduplicates = [False] * len(SSL_layers)
        if bpe_tokenizers is None:
            bpe_tokenizers = [None] * len(SSL_layers)
        if not (len(deduplicates) == len(SSL_layers) == len(bpe_tokenizers)):
            raise ValueError(
                "SSL_layers, deduplicates and bpe_tokenizers must have the "
                "same length"
            )
        for layer in SSL_layers:
            if layer not in self.ssl_layer_ids:
                raise ValueError(
                    f"Layer {layer} has no codebook; available: "
                    f"{self.ssl_layer_ids}."
                )

        feats = self._extract(wav, wav_lens)
        token_ids, embeddings = [], []
        for lid, vocab in zip(self.ssl_layer_ids, self.vocabularies):
            if lid not in SSL_layers:
                continue
            f = feats[lid]  # (B, T, D)
            toks = kmeans_predict(f.reshape(-1, f.shape[-1]), vocab)
            toks = toks.reshape(f.shape[0], f.shape[1])
            token_ids.append(toks)
            embeddings.append(vocab[toks])
        tokens = jnp.stack(token_ids, axis=2)
        emb = jnp.stack(embeddings, axis=2)
        processed = self._postprocess(
            np.asarray(tokens), SSL_layers, deduplicates, bpe_tokenizers
        )
        return tokens, emb, processed

    def _postprocess(self, tokens, SSL_layers, deduplicates, bpe_tokenizers):
        """Dedup + BPE per layer on host; returns list (per layer) of
        list (per utterance) of token id lists."""
        out = []
        for li, (dedup, bpe) in enumerate(zip(deduplicates, bpe_tokenizers)):
            layer_out = []
            for row in tokens[:, :, li]:
                ids = row.tolist()
                if dedup:
                    ids = [t for i, t in enumerate(ids)
                           if i == 0 or t != ids[i - 1]]
                if bpe is not None:
                    text = " ".join(str(t) for t in ids)
                    ids = bpe.encode_as_ids(text)
                layer_out.append(ids)
            out.append(layer_out)
        return out

    def decode(self, tokens, SSL_layers=None):
        """Vocode tokens ``(B, T, n_layers)`` back to waveforms; layer
        offsets (``layer_idx * num_clusters``) are added so a multi-layer
        vocoder embedding table can be indexed directly
        (reference discrete_ssl.py:358)."""
        if self.vocoder is None:
            raise RuntimeError(
                "No vocoder was provided to DiscreteSSL; pass vocoder= at "
                "construction."
            )
        if SSL_layers is None:
            SSL_layers = self.ssl_layer_ids
        offsets = []
        for layer in SSL_layers:
            pos = self.ssl_layer_ids.index(layer)
            offsets.append(sum(self.num_clusters[:pos]))
        offset = jnp.asarray(offsets)[None, None, :]
        return self.vocoder(tokens + offset)

    def __call__(self, wav, wav_lens=None, SSL_layers=None, deduplicates=None,
                 bpe_tokenizers=None):
        tokens = self.encode(
            wav, wav_lens, SSL_layers, deduplicates, bpe_tokenizers
        )[0]
        sig = self.decode(tokens, SSL_layers=SSL_layers)
        return tokens, sig
