"""Audio tokenizers: k-means quantization of SSL features, discrete SSL.

Mirrors the reference's ``speechbrain/integrations/audio_tokenizers``.
"""

from speechbrain_tpu.integrations.audio_tokenizers.kmeans import (  # noqa: F401
    MiniBatchKMeans,
)
from speechbrain_tpu.integrations.audio_tokenizers.discrete_ssl import (  # noqa: F401
    DiscreteSSL,
)
