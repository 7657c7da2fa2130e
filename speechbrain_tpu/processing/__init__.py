"""Signal processing: features (STFT/mel/MFCC), signal ops, beamforming."""

from speechbrain_tpu.processing import features  # noqa: F401
from speechbrain_tpu.processing import signal_processing  # noqa: F401
