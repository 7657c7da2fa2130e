"""Integration: CTC ASR trained to overfit synthetic data
(mirrors reference tests/integration/ASR_CTC)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

import speechbrain_tpu as sb
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.decoders.ctc import ctc_greedy_decode
from speechbrain_tpu.lobes.features import Fbank
from speechbrain_tpu.lobes.models.CRDNN import CRDNN
from speechbrain_tpu.nnet.linear import Linear
from speechbrain_tpu.nnet.losses import ctc_loss
from speechbrain_tpu.utils.epoch_loop import EpochCounter
from speechbrain_tpu.utils.metric_stats import ErrorRateStats

BLANK = 0
VOCAB = 5  # blank + 4 phones


def make_dataset(n=10):
    """Tone sequences: each 'phone' is a distinct frequency segment."""
    rng = np.random.default_rng(0)
    data = {}
    for i in range(n):
        phones = rng.integers(1, VOCAB, size=3).tolist()
        sig = np.concatenate(
            [
                np.sin(2 * np.pi * (300 * p) * np.arange(1600) / 16000.0)
                for p in phones
            ]
        ).astype(np.float32)
        sig += 0.02 * rng.standard_normal(sig.shape).astype(np.float32)
        data[f"u{i}"] = {"sig": sig, "phones": np.asarray(phones, np.int32)}
    ds = DynamicItemDataset(data)
    ds.set_output_keys(["id", "sig", "phones"])
    return ds


class CTCBrain(sb.Brain):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.fbank = Fbank(n_mels=24)
        self.train_losses = []
        self.wer_stats = None

    def compute_forward(self, params, state, batch, stage, rng):
        wavs, lens = batch["sig"]
        feats = self.fbank(wavs)
        train = stage == sb.Stage.TRAIN
        mut = ["batch_stats"] if train else []
        enc, u1 = self.module_apply(
            "enc", params, state, feats, train=train, mutable_state=mut
        )
        logits, u2 = self.module_apply("lin", params, state, enc, mutable_state=[])
        logp = jax.nn.log_softmax(logits, axis=-1)
        ns = self.merge_state(self.merge_state(state, "enc", u1), "lin", u2)
        return logp, ns

    def compute_objectives(self, logp, batch, stage):
        tokens, token_lens = batch["phones"]
        _, wav_lens = batch["sig"]
        return ctc_loss(logp, tokens, wav_lens, token_lens, blank_index=BLANK)

    def init_forward(self, rng, eb):
        wavs, lens = eb["sig"]
        feats = self.fbank(wavs)
        p1, s1 = self.init_module(rng, "enc", feats, train=False)
        enc, _ = self.module_apply(
            "enc", {"enc": p1}, {k: {"enc": v} for k, v in s1.items()},
            feats, train=False,
        )
        p2, s2 = self.init_module(rng, "lin", enc)
        out = {"params": {"enc": p1, "lin": p2}}
        for coll in set(s1) | set(s2):
            out[coll] = {"enc": s1.get(coll, {}), "lin": s2.get(coll, {})}
        return out

    def on_stage_end(self, stage, loss, epoch=None):
        if stage == sb.Stage.TRAIN:
            self.train_losses.append(loss)


def test_ctc_asr_overfits(tmp_path):
    ds = make_dataset()
    brain = CTCBrain(
        modules={
            "enc": CRDNN(
                cnn_blocks=1, cnn_channels=(8,), inter_layer_pooling_size=(2,),
                rnn_layers=1, rnn_neurons=32, dnn_blocks=1, dnn_neurons=32,
                dropout=0.0,
            ),
            "lin": Linear(n_neurons=VOCAB),
        },
        opt_class=lambda: optax.adam(3e-3),
        run_opts={"device": "cpu", "noprogressbar": True},
    )
    brain.fit(
        EpochCounter(12),
        train_set=ds,
        train_loader_kwargs={"batch_size": 5},
    )
    assert brain.train_losses[-1] < brain.train_losses[0] * 0.5

    # decode and measure WER on the training data (should be low)
    batch = next(iter(brain.make_dataloader(ds, sb.Stage.TEST, ckpt_prefix=None, batch_size=10)))
    device_batch = brain._prepare_batch(batch)
    logp, _ = brain.compute_forward(
        brain.params, brain.model_state, device_batch, sb.Stage.TEST, brain.rng
    )
    hyps = ctc_greedy_decode(logp, device_batch["sig"].lengths, blank_id=BLANK)
    from speechbrain_tpu.utils.data_utils import undo_padding

    refs = undo_padding(
        np.asarray(device_batch["phones"].data), np.asarray(device_batch["phones"].lengths)
    )
    stats = ErrorRateStats()
    stats.append(batch.id, hyps, refs)
    wer = stats.summarize("WER")
    assert wer < 50.0, f"WER {wer}, hyps {hyps[:3]}, refs {refs[:3]}"
