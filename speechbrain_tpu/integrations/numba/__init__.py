"""Transducer loss (reference keeps a Numba CUDA kernel here)."""
