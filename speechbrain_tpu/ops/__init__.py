"""Pallas TPU kernels for the hot ops: fused mel frontend, flash
attention, transducer loss. Every kernel has a jnp reference path and an
``interpret`` mode for CPU testing."""
