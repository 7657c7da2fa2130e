"""End-to-end integration: train a small x-vector speaker-ID model to
overfit synthetic tones (the reference's integration-test strategy,
tests/integration/ — tiny data, assert the loss drops), then verify
checkpoint save/recover restores params exactly."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

import speechbrain_tpu as sb
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.lobes.features import Fbank
from speechbrain_tpu.lobes.models.Xvector import Classifier, Xvector
from speechbrain_tpu.nnet.losses import classification_error, nll_loss
from speechbrain_tpu.utils.checkpoints import Checkpointer
from speechbrain_tpu.utils.epoch_loop import EpochCounter


N_SPK = 4


def make_dataset(n=24, seed=0):
    rng = np.random.default_rng(seed)
    data = {}
    for i in range(n):
        spk = i % N_SPK
        freq = 200 + 300 * spk
        t = np.arange(4000) / 16000.0
        sig = np.sin(2 * np.pi * freq * t) + 0.05 * rng.standard_normal(4000)
        data[f"u{i}"] = {"sig": sig.astype(np.float32), "spk": spk}
    ds = DynamicItemDataset(data)
    ds.set_output_keys(["id", "sig", "spk"])
    return ds


class SpeakerBrain(sb.Brain):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.fbank = Fbank(n_mels=24)
        self.train_losses = []

    def compute_forward(self, params, model_state, batch, stage, rng):
        wavs, lens = batch["sig"]
        feats = self.fbank(wavs)
        train = stage == sb.Stage.TRAIN
        mutable = ["batch_stats"] if train else []
        emb, upd_e = self.module_apply(
            "embedding_model", params, model_state, feats,
            lengths=lens, train=train, mutable_state=mutable,
        )
        logp, upd_c = self.module_apply(
            "classifier", params, model_state, emb,
            train=train, mutable_state=mutable,
        )
        new_state = self.merge_state(model_state, "embedding_model", upd_e)
        new_state = self.merge_state(new_state, "classifier", upd_c)
        return logp, new_state

    def compute_objectives(self, predictions, batch, stage):
        targets = jnp.asarray(batch["spk"].data).reshape(-1, 1)
        loss = nll_loss(predictions, targets)
        err = classification_error(predictions, targets)
        return loss, {"error": err}

    def init_forward(self, rng, example_batch):
        wavs, lens = example_batch["sig"]
        feats = self.fbank(wavs)
        p_e, s_e = self.init_module(rng, "embedding_model", feats, lengths=lens, train=False)
        state = {}
        emb, _ = self.module_apply(
            "embedding_model", {"embedding_model": p_e},
            {k: {"embedding_model": v} for k, v in s_e.items()},
            feats, lengths=lens, train=False,
        )
        p_c, s_c = self.init_module(rng, "classifier", emb, train=False)
        params = {"embedding_model": p_e, "classifier": p_c}
        collections = {}
        for coll, tree in s_e.items():
            collections.setdefault(coll, {})["embedding_model"] = tree
        for coll, tree in s_c.items():
            collections.setdefault(coll, {})["classifier"] = tree
        return {"params": params, **collections}

    def on_stage_end(self, stage, stage_loss, epoch=None):
        if stage == sb.Stage.TRAIN:
            self.train_losses.append(stage_loss)


def test_speaker_id_overfits(tmp_path):
    ds = make_dataset()
    modules = {
        "embedding_model": Xvector(
            in_channels=24,
            tdnn_channels=(64, 64, 64, 64, 128),
            lin_neurons=32,
        ),
        "classifier": Classifier(out_neurons=N_SPK, lin_neurons=32),
    }
    ckpt = Checkpointer(tmp_path / "save")
    brain = SpeakerBrain(
        modules=modules,
        opt_class=lambda: optax.adam(3e-3),
        run_opts={"device": "cpu", "jit": True, "noprogressbar": True},
        checkpointer=ckpt,
    )
    brain.fit(
        EpochCounter(8),
        train_set=ds,
        train_loader_kwargs={"batch_size": 8, "shuffle": True},
    )
    losses = brain.train_losses
    assert losses[-1] < losses[0] * 0.5, losses
    assert losses[-1] < 0.5, losses

    # checkpoint save + recovery restores params exactly
    brain.save_checkpoint(meta={"loss": losses[-1]})
    w_before = np.asarray(jax.tree_util.tree_leaves(brain.params)[0]).copy()
    brain.params = jax.tree_util.tree_map(jnp.zeros_like, brain.params)
    brain._sync_refs_out()
    brain.checkpointer.recover_if_possible()
    brain._sync_refs_in()
    w_after = np.asarray(jax.tree_util.tree_leaves(brain.params)[0])
    assert np.allclose(w_before, w_after)


def test_resume_continues_training(tmp_path):
    """Interrupt after 2 epochs, recover, continue — epoch counter resumes."""
    ds = make_dataset(n=8)
    def build():
        modules = {
            "embedding_model": Xvector(
                in_channels=24, tdnn_channels=(32, 32, 32, 32, 64), lin_neurons=16
            ),
            "classifier": Classifier(out_neurons=N_SPK, lin_neurons=16),
        }
        ckpt = Checkpointer(tmp_path / "save2")
        brain = SpeakerBrain(
            modules=modules,
            opt_class=lambda: optax.adam(1e-3),
            run_opts={"device": "cpu", "noprogressbar": True},
            checkpointer=ckpt,
        )
        counter = EpochCounter(4)
        ckpt.add_recoverable("epoch", counter)
        return brain, counter

    brain, counter = build()
    brain.fit(EpochCounter(2) if False else _limited(counter, 2), train_set=ds,
              train_loader_kwargs={"batch_size": 4})
    brain.save_checkpoint(meta={"stage": "mid"})
    assert counter.current == 2

    brain2, counter2 = build()
    brain2.fit(counter2, train_set=ds, train_loader_kwargs={"batch_size": 4})
    # recovery restored epoch 2, so only epochs 3 and 4 ran
    assert counter2.current == 4
    assert len(brain2.train_losses) == 2


def _limited(counter, n):
    """Yield at most n epochs from the counter (simulating interruption)."""
    def gen():
        for e in counter:
            yield e
            if e >= n:
                return
    return gen()
