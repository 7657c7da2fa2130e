"""Integration: attention G2P trained to overfit a tiny lexicon, greedy
decode recovers pronunciations (mirrors reference tests/integration/G2P)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

import speechbrain_tpu as sb
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.lobes.models.g2p.model import AttentionSeq2Seq
from speechbrain_tpu.nnet.losses import nll_loss
from speechbrain_tpu.utils.epoch_loop import EpochCounter

# tiny lexicon: graphemes 1..4, phonemes 1..4 (0 = bos/eos/pad)
LEXICON = {
    (1, 2): (2, 1),
    (2, 3): (3, 2),
    (3, 4): (4, 3),
    (1, 4): (4, 1),
    (2, 4): (4, 2),
    (3, 1): (1, 3),
}
NG, NP = 5, 5


def make_dataset():
    data = {}
    for i, (g, p) in enumerate(LEXICON.items()):
        data[f"w{i}"] = {
            "graphemes": np.asarray(g, np.int32),
            "phn_bos": np.asarray((0,) + p, np.int32),
            "phn_eos": np.asarray(p + (0,), np.int32),
        }
    ds = DynamicItemDataset(data)
    ds.set_output_keys(["id", "graphemes", "phn_bos", "phn_eos"])
    return ds


class G2PBrain(sb.Brain):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.train_losses = []

    def compute_forward(self, params, state, batch, stage, rng):
        g, g_lens = batch["graphemes"]
        p_bos, _ = batch["phn_bos"]
        logp, _ = self.module_apply(
            "model", params, state, g, g_lens, p_bos, mutable_state=[]
        )
        return logp, state

    def compute_objectives(self, predictions, batch, stage):
        p_eos, p_lens = batch["phn_eos"]
        return nll_loss(predictions, p_eos, length=p_lens)

    def init_forward(self, rng, eb):
        g, g_lens = eb["graphemes"]
        p_bos, _ = eb["phn_bos"]
        p, _ = self.init_module(rng, "model", g, g_lens, p_bos)
        return {"params": {"model": p}}

    def on_stage_end(self, stage, loss, epoch=None):
        if stage == sb.Stage.TRAIN:
            self.train_losses.append(loss)


def test_g2p_overfits_and_decodes():
    ds = make_dataset()
    brain = G2PBrain(
        modules={
            "model": AttentionSeq2Seq(
                num_graphemes=NG, num_phonemes=NP, emb_dim=16,
                enc_neurons=16, dec_neurons=24, enc_layers=1,
            )
        },
        opt_class=lambda: optax.adam(5e-3),
        run_opts={"device": "cpu", "noprogressbar": True},
    )
    brain.fit(EpochCounter(60), train_set=ds,
              train_loader_kwargs={"batch_size": 6})
    assert brain.train_losses[-1] < 0.15, brain.train_losses

    # greedy decode each word: feed growing prefix
    params = brain.params
    correct = 0
    for g, p in LEXICON.items():
        g_arr = jnp.asarray([g], jnp.int32)
        prefix = jnp.asarray([[0]], jnp.int32)
        hyp = []
        for _ in range(len(p)):
            logp, _ = brain.module_apply(
                "model", params, {}, g_arr, jnp.ones(1), prefix
            )
            nxt = int(jnp.argmax(logp[0, -1]))
            hyp.append(nxt)
            prefix = jnp.concatenate(
                [prefix, jnp.asarray([[nxt]], jnp.int32)], axis=1
            )
        correct += tuple(hyp) == p
    assert correct >= 5, f"G2P decoded {correct}/6 words"
