"""Integration: RNN-T trained to overfit synthetic tone data, then decoded
greedy + beam (mirrors reference tests/integration/ASR_Transducer)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

import speechbrain_tpu as sb
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.decoders.transducer import TransducerBeamSearcher
from speechbrain_tpu.lobes.features import Fbank
from speechbrain_tpu.nnet.embedding import Embedding
from speechbrain_tpu.nnet.linear import Linear
from speechbrain_tpu.nnet.RNN import GRU, LSTM
from speechbrain_tpu.nnet.transducer_joint import TransducerJoint
from speechbrain_tpu.nnet.transducer_loss import transducer_loss
from speechbrain_tpu.utils.epoch_loop import EpochCounter

BLANK = 0
VOCAB = 5  # blank + phones 1..4


def make_dataset(n=8):
    rng = np.random.default_rng(7)
    data = {}
    for i in range(n):
        phones = rng.integers(1, VOCAB, size=2).tolist()
        sig = np.concatenate(
            [
                np.sin(2 * np.pi * (300 * p) * np.arange(1200) / 16000.0)
                for p in phones
            ]
        ).astype(np.float32)
        data[f"u{i}"] = {
            "sig": sig,
            "phn": np.asarray(phones, np.int32),
        }
    ds = DynamicItemDataset(data)
    ds.set_output_keys(["id", "sig", "phn"])
    return ds


class TransducerBrain(sb.Brain):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.fbank = Fbank(n_mels=20)
        self.train_losses = []

    def compute_forward(self, params, state, batch, stage, rng):
        wavs, wav_lens = batch["sig"]
        phn, _ = batch["phn"]
        feats = self.fbank(wavs)
        enc, _ = self.module_apply("enc", params, state, feats, mutable_state=[])
        enc = enc[0] if isinstance(enc, tuple) else enc
        enc, _ = self.module_apply("enc_lin", params, state, enc, mutable_state=[])
        # prediction net over blank-prefixed targets
        pn_in = jnp.concatenate(
            [jnp.full((phn.shape[0], 1), BLANK, phn.dtype), phn], axis=1
        )
        emb, _ = self.module_apply("emb", params, state, pn_in, mutable_state=[])
        pn, _ = self.module_apply("dec", params, state, emb, mutable_state=[])
        pn = pn[0] if isinstance(pn, tuple) else pn
        pn, _ = self.module_apply("dec_lin", params, state, pn, mutable_state=[])
        joint, _ = self.module_apply(
            "joint", params, state, enc[:, :, None, :], pn[:, None, :, :],
            mutable_state=[],
        )
        logits, _ = self.module_apply("out", params, state, joint, mutable_state=[])
        return jax.nn.log_softmax(logits, -1), state

    def compute_objectives(self, predictions, batch, stage):
        logp = predictions
        phn, phn_lens = batch["phn"]
        wavs, wav_lens = batch["sig"]
        return transducer_loss(logp, phn, wav_lens, phn_lens, BLANK)

    def init_forward(self, rng, eb):
        wavs, _ = eb["sig"]
        phn, _ = eb["phn"]
        feats = self.fbank(wavs)
        p = {}
        p["enc"], _ = self.init_module(rng, "enc", feats)
        enc, _ = self.module_apply("enc", {"enc": p["enc"]}, {}, feats)
        enc = enc[0] if isinstance(enc, tuple) else enc
        p["enc_lin"], _ = self.init_module(rng, "enc_lin", enc)
        enc, _ = self.module_apply("enc_lin", {"enc_lin": p["enc_lin"]}, {}, enc)
        pn_in = jnp.concatenate(
            [jnp.full((phn.shape[0], 1), BLANK, phn.dtype), phn], axis=1
        )
        p["emb"], _ = self.init_module(rng, "emb", pn_in)
        emb, _ = self.module_apply("emb", {"emb": p["emb"]}, {}, pn_in)
        p["dec"], _ = self.init_module(rng, "dec", emb)
        pn, _ = self.module_apply("dec", {"dec": p["dec"]}, {}, emb)
        pn = pn[0] if isinstance(pn, tuple) else pn
        p["dec_lin"], _ = self.init_module(rng, "dec_lin", pn)
        pn, _ = self.module_apply("dec_lin", {"dec_lin": p["dec_lin"]}, {}, pn)
        p["joint"], _ = self.init_module(
            rng, "joint", enc[:, :, None, :], pn[:, None, :, :]
        )
        joint, _ = self.module_apply(
            "joint", {"joint": p["joint"]}, {}, enc[:, :, None, :],
            pn[:, None, :, :],
        )
        p["out"], _ = self.init_module(rng, "out", joint)
        return {"params": p}

    def on_stage_end(self, stage, loss, epoch=None):
        if stage == sb.Stage.TRAIN:
            self.train_losses.append(loss)


def test_transducer_overfits_and_decodes():
    ds = make_dataset()
    H = 24
    modules = {
        "enc": LSTM(hidden_size=H, num_layers=1),
        "enc_lin": Linear(n_neurons=H),
        "emb": Embedding(num_embeddings=VOCAB, embedding_dim=12),
        "dec": GRU(hidden_size=H, num_layers=1),
        "dec_lin": Linear(n_neurons=H),
        "joint": TransducerJoint(joint="sum"),
        "out": Linear(n_neurons=VOCAB),
    }
    brain = TransducerBrain(
        modules=modules,
        opt_class=lambda: optax.adam(5e-3),
        run_opts={"device": "cpu", "noprogressbar": True},
    )
    brain.fit(EpochCounter(25), train_set=ds,
              train_loader_kwargs={"batch_size": 4})
    assert brain.train_losses[-1] < 1.0, brain.train_losses

    # decode: greedy + beam through TransducerBeamSearcher
    batch = next(iter(brain.make_dataloader(ds, sb.Stage.TEST,
                                            ckpt_prefix=None, batch_size=8)))
    db = brain._prepare_batch(batch)
    wavs, wav_lens = db["sig"]
    feats = brain.fbank(wavs)
    params = brain.params
    enc, _ = brain.module_apply("enc", params, {}, feats)
    enc = enc[0] if isinstance(enc, tuple) else enc
    enc, _ = brain.module_apply("enc_lin", params, {}, enc)

    def pred_step(tokens, hidden):
        emb, _ = brain.module_apply("emb", params, {}, tokens)
        out, hn = brain.modules.dec.apply({"params": params["dec"]}, emb,
                                          hidden)
        out, _ = brain.module_apply("dec_lin", params, {}, out)
        return out, hn

    def tjoint(enc_t, pn_t):
        out, _ = brain.module_apply("joint", params, {}, enc_t, pn_t)
        return out

    def classifier(x):
        out, _ = brain.module_apply("out", params, {}, x)
        return out

    searcher = TransducerBeamSearcher(
        decode_network_lst=pred_step, tjoint=tjoint,
        classifier_network=classifier, blank_id=BLANK, beam_size=1,
    )
    hyps, _, _, _ = searcher(enc)
    refs = [r.tolist() for r in np.asarray(db["phn"].data)]
    correct = sum(1 for h, r in zip(hyps, refs) if h == r)
    assert correct >= 6, (hyps, refs)

    beam = TransducerBeamSearcher(
        decode_network_lst=pred_step, tjoint=tjoint,
        classifier_network=classifier, blank_id=BLANK, beam_size=3,
    )
    bhyps, _, _, _ = beam(enc)
    bcorrect = sum(1 for h, r in zip(bhyps, refs) if h == r)
    assert bcorrect >= correct - 1, (bhyps, refs)
