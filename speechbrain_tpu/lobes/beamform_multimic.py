"""Multi-mic beamforming lobe.

Capability parity with the reference's
``speechbrain/lobes/beamform_multimic.py`` (DelaySum_Beamformer): wraps
STFT -> covariance -> GCC-PHAT -> delay-and-sum -> ISTFT as a frontend.
"""

import jax.numpy as jnp

from speechbrain_tpu.processing.features import ISTFT, STFT
from speechbrain_tpu.processing.multi_mic import Covariance, DelaySum, GccPhat


class DelaySum_Beamformer:
    """(B, T, C) multichannel wav -> (B, T) beamformed mono.

    Example
    -------
    >>> import jax.numpy as jnp, numpy as np
    >>> bf = DelaySum_Beamformer(sampling_rate=16000)
    >>> x = jnp.asarray(np.random.randn(1, 4000, 4).astype("float32"))
    >>> bf(x).shape
    (1, 4000)
    """

    def __init__(self, sampling_rate=16000, n_fft=400):
        self.stft = STFT(sample_rate=sampling_rate, n_fft=n_fft, backend="rfft")
        self.istft = ISTFT(sample_rate=sampling_rate, n_fft=n_fft)
        self.cov = Covariance()
        self.gcc = GccPhat()
        self.delaysum = DelaySum()
        self.n_fft = n_fft

    def __call__(self, wavs):
        T = wavs.shape[1]
        Xs = self.stft(wavs)
        XXs = self.cov(Xs)
        tdoas_pairs = self.gcc(XXs)  # (B, T', C, C)
        # GCC-PHAT's xcorr argmax for a mic delayed by +d lands at -d;
        # DelaySum steering wants the mic's actual delay -> negate.
        tdoas = -tdoas_pairs[:, :, 0, :]
        Ys = self.delaysum(Xs, tdoas, n_fft=self.n_fft)
        return self.istft(Ys, sig_length=T)
