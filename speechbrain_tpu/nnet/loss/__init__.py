"""Standalone loss modules mirroring the reference's ``nnet/loss``
subpackage layout (stoi_loss, with the rest living in nnet.losses)."""
