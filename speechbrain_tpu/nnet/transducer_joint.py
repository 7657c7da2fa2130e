"""Transducer joint network.

Capability parity with the reference's
``speechbrain/nnet/transducer/transducer_joint.py`` (Transducer_joint :102):
combine encoder (B, T, H) and prediction-network (B, U, H) states into
(B, T, U, H) by sum or concat + nonlinearity.
"""

import flax.linen as nn
import jax.numpy as jnp

from speechbrain_tpu.nnet.linear import Linear


class TransducerJoint(nn.Module):
    """Joint network: broadcast-add (or concat) encoder/decoder states.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> joint = TransducerJoint(joint_dim=8, joint="sum")
    >>> enc = jnp.ones((2, 10, 8)); dec = jnp.ones((2, 4, 8))
    >>> p = joint.init(jax.random.PRNGKey(0), enc, dec)
    >>> joint.apply(p, enc, dec).shape
    (2, 10, 4, 8)
    """

    joint_dim: int = 512
    joint: str = "sum"  # "sum" | "concat"
    nonlinearity: str = "leaky_relu"

    @nn.compact
    def __call__(self, input_TN, input_PN):
        from speechbrain_tpu.nnet.activations import get_activation

        act = get_activation(self.nonlinearity)
        # accept (B,T,H)/(B,U,H) or already-expanded 4D inputs
        if input_TN.ndim == 3:
            input_TN = input_TN[:, :, None, :]
        if input_PN.ndim == 3:
            input_PN = input_PN[:, None, :, :]
        if self.joint == "sum":
            tn = Linear(self.joint_dim, name="enc_proj")(input_TN)
            pn = Linear(self.joint_dim, name="dec_proj")(input_PN)
            joint = tn + pn
        elif self.joint == "concat":
            T = input_TN.shape[1]
            U = input_PN.shape[2]
            tn = jnp.broadcast_to(
                input_TN, input_TN.shape[:1] + (T, U, input_TN.shape[-1])
            )
            pn = jnp.broadcast_to(
                input_PN, input_PN.shape[:1] + (T, U, input_PN.shape[-1])
            )
            joint = Linear(self.joint_dim, name="proj")(
                jnp.concatenate([tn, pn], axis=-1)
            )
        else:
            raise ValueError("joint must be 'sum' or 'concat'")
        return act(joint)
