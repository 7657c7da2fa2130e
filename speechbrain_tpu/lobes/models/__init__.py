"""Model architectures (lobes): speaker, ASR, separation, TTS families."""
