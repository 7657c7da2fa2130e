"""Neural network primitives: layers, losses, schedulers.

All layers are flax.linen modules operating on (batch, time, [channel,]
feat) layouts, with shape inference at first call (linen lazy init) —
the functional analogue of the reference's ``input_shape`` inference.
"""
