"""Composed feature extractors: Fbank, MFCC, streaming wrapper.

Capability parity with the reference's ``speechbrain/lobes/features.py``
(Fbank :38, MFCC :176, StreamingFeatureWrapper :508). These compose the
processing-layer transforms; on TPU the whole chain optionally runs as one
fused Pallas kernel (``speechbrain_tpu.ops.mel_frontend``) — set
``fused=True`` — with jnp fallback for CPU tests.
"""

import flax.linen as nn
import jax.numpy as jnp

from speechbrain_tpu.processing.features import (
    STFT,
    ContextWindow,
    DCT,
    Deltas,
    Filterbank,
    spectral_magnitude,
)


class Fbank:
    """Log-mel filterbank features from raw waveforms.

    Matches the reference pipeline STFT -> |.|^2 -> mel -> dB
    (lobes/features.py:38).

    Example
    -------
    >>> import jax.numpy as jnp
    >>> fbank = Fbank()
    >>> fbank(jnp.zeros((10, 16000))).shape
    (10, 101, 40)
    """

    def __init__(
        self,
        deltas=False,
        context=False,
        requires_grad=False,
        sample_rate=16000,
        f_min=0,
        f_max=None,
        n_fft=400,
        n_mels=40,
        filter_shape="triangular",
        param_change_factor=1.0,
        param_rand_factor=0.0,
        left_frames=5,
        right_frames=5,
        win_length=25,
        hop_length=10,
        fused=False,
    ):
        self.deltas = deltas
        self.context = context
        if f_max is None:
            f_max = sample_rate // 2
        self.fused = fused
        self.compute_STFT = STFT(
            sample_rate=sample_rate,
            n_fft=n_fft,
            win_length=win_length,
            hop_length=hop_length,
        )
        self.compute_fbanks = Filterbank(
            sample_rate=sample_rate,
            n_fft=n_fft,
            n_mels=n_mels,
            f_min=f_min,
            f_max=f_max,
            filter_shape=filter_shape,
            freeze=not requires_grad,
        )
        self.compute_deltas = Deltas(input_size=n_mels)
        self.context_window = ContextWindow(
            left_frames=left_frames, right_frames=right_frames
        )

    def __call__(self, wav):
        if self.fused:
            from speechbrain_tpu.ops.mel_frontend import fused_fbank

            fbanks = fused_fbank(
                wav,
                window=self.compute_STFT.window,
                fbank_matrix=self.compute_fbanks.fbank_matrix,
                n_fft=self.compute_STFT.n_fft,
                hop_length=self.compute_STFT.hop_length,
                top_db=self.compute_fbanks.top_db,
            )
        else:
            # power() avoids complex dtypes: on TPU it lowers to two real
            # matmuls with the window folded in (MXU path)
            mag = self.compute_STFT.power(wav)
            fbanks = self.compute_fbanks(mag)
        if self.deltas:
            delta1 = self.compute_deltas(fbanks)
            delta2 = self.compute_deltas(delta1)
            fbanks = jnp.concatenate([fbanks, delta1, delta2], axis=2)
        if self.context:
            fbanks = self.context_window(fbanks)
        return fbanks

    def get_filter_properties(self):
        return self.compute_STFT.get_filter_properties()


class MFCC:
    """Mel-frequency cepstral coefficients (reference lobes/features.py:176).

    Example
    -------
    >>> import jax.numpy as jnp
    >>> mfcc = MFCC()
    >>> mfcc(jnp.zeros((10, 16000))).shape
    (10, 101, 660)
    """

    def __init__(
        self,
        deltas=True,
        context=True,
        requires_grad=False,
        sample_rate=16000,
        f_min=0,
        f_max=None,
        n_fft=400,
        n_mels=23,
        n_mfcc=20,
        filter_shape="triangular",
        param_change_factor=1.0,
        param_rand_factor=0.0,
        left_frames=5,
        right_frames=5,
        win_length=25,
        hop_length=10,
    ):
        self.deltas = deltas
        self.context = context
        if f_max is None:
            f_max = sample_rate // 2
        self.compute_STFT = STFT(
            sample_rate=sample_rate,
            n_fft=n_fft,
            win_length=win_length,
            hop_length=hop_length,
        )
        self.compute_fbanks = Filterbank(
            sample_rate=sample_rate,
            n_fft=n_fft,
            n_mels=n_mels,
            f_min=f_min,
            f_max=f_max,
            filter_shape=filter_shape,
            freeze=not requires_grad,
        )
        self.compute_dct = DCT(input_size=n_mels, n_out=n_mfcc)
        self.compute_deltas = Deltas(input_size=n_mfcc)
        self.context_window = ContextWindow(
            left_frames=left_frames, right_frames=right_frames
        )

    def __call__(self, wav):
        mag = self.compute_STFT.power(wav)
        fbanks = self.compute_fbanks(mag)
        mfccs = self.compute_dct(fbanks)
        if self.deltas:
            delta1 = self.compute_deltas(mfccs)
            delta2 = self.compute_deltas(delta1)
            mfccs = jnp.concatenate([mfccs, delta1, delta2], axis=2)
        if self.context:
            mfccs = self.context_window(mfccs)
        return mfccs


def upalign_value(x, to):
    """Round x up to a multiple of ``to`` (reference lobes/features.py:484)."""
    if x % to == 0:
        return x
    return x + to - (x % to)


class Leaf(nn.Module):
    """LEAF learnable audio frontend (Zeghidour et al., ICLR 2021;
    reference lobes/features.py:316): learnable Gabor filterbank ->
    squared modulus -> learnable Gaussian lowpass pooling -> PCEN.

    Input (B, T) or (B, T, 1); output (B, T', out_channels).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> leaf = Leaf(out_channels=8, window_len=25.0, window_stride=10.0)
    >>> x = jnp.ones((2, 8000))
    >>> v = leaf.init(jax.random.PRNGKey(0), x)
    >>> leaf.apply(v, x).shape
    (2, 50, 8)
    """

    out_channels: int = 40
    window_len: float = 25.0
    window_stride: float = 10.0
    sample_rate: int = 16000
    min_freq: float = 60.0
    max_freq: float = None
    use_pcen: bool = True

    @nn.compact
    def __call__(self, x, train=False):
        from speechbrain_tpu.nnet.CNN import GaborConv1d
        from speechbrain_tpu.nnet.normalization import PCEN
        from speechbrain_tpu.nnet.pooling import GaussianLowpassPooling

        if x.ndim == 2:
            x = x[..., None]
        window_size = int(self.sample_rate * self.window_len / 1000) + 1
        window_stride = int(self.sample_rate * self.window_stride / 1000)
        out = GaborConv1d(
            out_channels=2 * self.out_channels,
            kernel_size=window_size,
            stride=1,
            sample_rate=self.sample_rate,
            min_freq=self.min_freq,
            max_freq=self.max_freq,
            name="complex_conv",
        )(x)
        # squared modulus: sum of squared real/imag pairs
        B, T, _ = out.shape
        out = out.reshape(B, T, self.out_channels, 2)
        out = jnp.sum(out**2, axis=-1)
        out = GaussianLowpassPooling(
            kernel_size=window_size, stride=window_stride, name="pooling"
        )(out)
        out = jnp.maximum(out, 1e-5)
        if self.use_pcen:
            out = PCEN(name="compression")(out)
        return out


class StreamingFeatureWrapper:
    """Chunk-wise feature extraction with left-context carry, so streamed
    features exactly match the offline ones (reference lobes/features.py:508).

    The wrapped module must expose ``get_filter_properties()``; the wrapper
    keeps ``window_size - stride`` samples of left context between chunks
    as explicit functional state (a pytree), jit-friendly.
    """

    def __init__(self, module):
        self.module = module
        self.properties = module.get_filter_properties()
        if self.properties.causal:
            raise ValueError("Causal filters need no streaming wrapper")

    def get_required_padding(self):
        return upalign_value(
            (self.properties.window_size - 1) // 2, self.properties.stride
        )

    def get_output_count_per_pad_frame(self):
        return self.get_required_padding() // self.properties.stride

    def get_recommended_final_chunk_count(self, frames_per_chunk):
        return upalign_value(self.get_required_padding(), frames_per_chunk)

    def make_streaming_context(self, batch_size=1):
        return {"left_context": None}

    def __call__(self, chunk, context):
        """Process one chunk; returns (features, new_context)."""
        pad = self.get_required_padding()
        left = context.get("left_context")
        if left is None:
            chunk_in = jnp.pad(chunk, ((0, 0), (2 * pad, 0)))
        else:
            chunk_in = jnp.concatenate([left, chunk], axis=-1)
        new_context = {"left_context": chunk_in[:, -2 * pad :]}
        feats = self.module(chunk_in)
        # strip the frames produced by the padding on both sides
        strip = self.get_output_count_per_pad_frame()
        feats = feats[:, strip:-strip, ...] if strip else feats
        return feats, new_context

    def get_filter_properties(self):
        return self.properties
