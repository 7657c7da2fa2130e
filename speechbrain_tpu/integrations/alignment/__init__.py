"""Alignment integrations: spectral-clustering diarization + CTC
segmentation (reference speechbrain/integrations/alignment/)."""
