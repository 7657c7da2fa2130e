"""Integration: PLDA speaker backend (mirrors reference
tests/integration/PLDA) and augmentation inside a training loop (mirrors
tests/integration/augmentation)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from speechbrain_tpu.processing.PLDA_LDA import PLDA, StatObject
from speechbrain_tpu.utils.metric_stats import EER


def test_plda_eer_on_synthetic_speakers():
    rng = np.random.default_rng(0)
    n_spk, per_spk, D = 10, 30, 16
    spk_means = rng.standard_normal((n_spk, D)) * 3.0
    X, y = [], []
    for s in range(n_spk):
        for _ in range(per_spk):
            X.append(spk_means[s] + rng.standard_normal(D))
            y.append(s)
    stats = StatObject(
        np.asarray(y), np.arange(len(y)), stat1=np.asarray(X)
    )
    plda = PLDA(rank_f=8, nb_iter=8).plda(stats)

    # trials: enrol on a fresh sample per speaker, test on fresh samples
    pos, neg = [], []
    for s in range(n_spk):
        enrol = spk_means[s] + rng.standard_normal(D)
        for s2 in range(n_spk):
            test = spk_means[s2] + rng.standard_normal(D)
            score = plda.score_pair(enrol, test)
            (pos if s == s2 else neg).append(score)
    eer, thr = EER(np.asarray(pos), np.asarray(neg))
    assert eer < 0.1, f"PLDA EER too high: {eer}"


def test_augmentation_inside_training():
    """Augmentations applied inside the jitted train step must be
    trace-safe and not break convergence (reference
    tests/integration/augmentation)."""
    import speechbrain_tpu as sb
    from speechbrain_tpu.augment.augmenter import Augmenter
    from speechbrain_tpu.augment.time_domain import DropChunk, DropFreq
    from speechbrain_tpu.dataio.dataset import DynamicItemDataset
    from speechbrain_tpu.lobes.features import Fbank
    from speechbrain_tpu.nnet.linear import Linear
    from speechbrain_tpu.nnet.losses import nll_loss
    from speechbrain_tpu.utils.epoch_loop import EpochCounter

    rng = np.random.default_rng(0)
    data = {}
    for i in range(8):
        cls = i % 2
        freq = 300 if cls == 0 else 900
        sig = 0.5 * np.sin(
            2 * np.pi * freq * np.arange(3200) / 16000.0
        ).astype(np.float32)
        data[f"u{i}"] = {"sig": sig, "label": cls}
    ds = DynamicItemDataset(data)
    ds.set_output_keys(["id", "sig", "label"])

    augmenter = Augmenter(
        parallel_augment=False,
        concat_original=True,
        min_augmentations=1,
        max_augmentations=2,
        augment_prob=1.0,
        augmentations=[
            DropFreq(drop_freq_count_low=1, drop_freq_count_high=2),
            DropChunk(drop_length_low=100, drop_length_high=500,
                      drop_count_low=1, drop_count_high=2),
        ],
    )

    class AugBrain(sb.Brain):
        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            self.fbank = Fbank(n_mels=20)
            self.losses = []

        def compute_forward(self, params, state, batch, stage, rng):
            wavs, lens = batch["sig"]
            if stage == sb.Stage.TRAIN:
                wavs, lens = augmenter(wavs, lens, rng=rng)
            feats = self.fbank(wavs).mean(axis=1)
            logits, _ = self.module_apply(
                "clf", params, state, feats, mutable_state=[]
            )
            return jax.nn.log_softmax(logits, -1), state

        def compute_objectives(self, predictions, batch, stage):
            labels, _ = batch["label"]
            labels = jnp.asarray(labels).reshape(-1)
            if predictions.shape[0] != labels.shape[0]:
                # replicate labels for concat_original batch growth
                k = predictions.shape[0] // labels.shape[0]
                labels = jnp.tile(labels, k)
            return nll_loss(predictions[:, None, :], labels[:, None])

        def init_forward(self, rng, eb):
            wavs, _ = eb["sig"]
            feats = self.fbank(wavs).mean(axis=1)
            p, _ = self.init_module(rng, "clf", feats)
            return {"params": {"clf": p}}

        def on_stage_end(self, stage, loss, epoch=None):
            if stage == sb.Stage.TRAIN:
                self.losses.append(loss)

    brain = AugBrain(
        modules={"clf": Linear(n_neurons=2)},
        opt_class=lambda: optax.adam(5e-2),
        run_opts={"device": "cpu", "noprogressbar": True},
    )
    brain.fit(EpochCounter(10), train_set=ds,
              train_loader_kwargs={"batch_size": 8})
    assert brain.losses[-1] < 0.25, brain.losses
