"""Integration: RNN LM trained to overfit a toy corpus; perplexity drops
and incremental decoding matches full forward (mirrors reference
tests/integration/LM_RNN)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

import speechbrain_tpu as sb
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.lobes.models.RNNLM import RNNLM
from speechbrain_tpu.nnet.losses import nll_loss
from speechbrain_tpu.utils.epoch_loop import EpochCounter

VOCAB = 6
# each sentence starts with a unique token, so the only irreducible
# entropy is the first-token choice: floor = ln(5)/5 ~= 0.32 mean NLL
SENTS = [
    [1, 2, 3, 4],
    [2, 3, 4, 5],
    [3, 4, 5, 1],
    [4, 5, 1, 2],
    [5, 1, 2, 3],
]


def make_dataset():
    data = {}
    for i, s in enumerate(SENTS):
        data[f"s{i}"] = {
            "tok_bos": np.asarray([0] + s, np.int32),
            "tok_eos": np.asarray(s + [0], np.int32),
        }
    ds = DynamicItemDataset(data)
    ds.set_output_keys(["id", "tok_bos", "tok_eos"])
    return ds


class LMBrain(sb.Brain):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.train_losses = []

    def compute_forward(self, params, state, batch, stage, rng):
        tok_bos, _ = batch["tok_bos"]
        out, _ = self.module_apply("lm", params, state, tok_bos,
                                   mutable_state=[])
        logits = out[0] if isinstance(out, tuple) else out
        return jax.nn.log_softmax(logits, -1), state

    def compute_objectives(self, predictions, batch, stage):
        tok_eos, lens = batch["tok_eos"]
        return nll_loss(predictions, tok_eos, length=lens)

    def init_forward(self, rng, eb):
        tok_bos, _ = eb["tok_bos"]
        p, _ = self.init_module(rng, "lm", tok_bos)
        return {"params": {"lm": p}}

    def on_stage_end(self, stage, loss, epoch=None):
        if stage == sb.Stage.TRAIN:
            self.train_losses.append(loss)


def test_rnnlm_overfits():
    ds = make_dataset()
    brain = LMBrain(
        modules={"lm": RNNLM(output_neurons=VOCAB, embedding_dim=12,
                             rnn_neurons=24, rnn_layers=1, dnn_neurons=24)},
        opt_class=lambda: optax.adam(5e-3),
        run_opts={"device": "cpu", "noprogressbar": True},
    )
    brain.fit(EpochCounter(40), train_set=ds,
              train_loader_kwargs={"batch_size": 5})
    first, last = brain.train_losses[0], brain.train_losses[-1]
    assert last < 0.45 and last < first / 3, brain.train_losses

    # incremental decoding == full forward
    params = brain.params
    seq = jnp.asarray([[0, 1, 2, 3]], jnp.int32)
    full, _ = brain.module_apply("lm", params, {}, seq)
    full = full[0] if isinstance(full, tuple) else full
    hx = None
    steps = []
    lm = brain.modules.lm
    for t in range(seq.shape[1]):
        out = lm.apply({"params": params["lm"]}, seq[:, t : t + 1], hx)
        logits, hx = out if isinstance(out, tuple) else (out, None)
        steps.append(logits[:, 0])
    inc = jnp.stack(steps, axis=1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(inc),
                               rtol=1e-4, atol=1e-4)


def test_evaluate_loop_returns_loss():
    ds = make_dataset()
    brain = LMBrain(
        modules={"lm": RNNLM(output_neurons=VOCAB, embedding_dim=8,
                             rnn_neurons=12, rnn_layers=1, dnn_neurons=12)},
        opt_class=lambda: optax.adam(5e-3),
        run_opts={"device": "cpu", "noprogressbar": True},
    )
    brain.fit(EpochCounter(3), train_set=ds,
              train_loader_kwargs={"batch_size": 5})
    test_loss = brain.evaluate(ds, test_loader_kwargs={"batch_size": 5})
    assert np.isfinite(test_loss)
    # evaluation must not disturb training state
    assert brain.step == 0
