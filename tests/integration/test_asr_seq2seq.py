"""Integration: attention-based seq2seq ASR trained to overfit synthetic
data, then decoded with greedy + beam search (mirrors reference
tests/integration/ASR_seq2seq)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

import speechbrain_tpu as sb
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.decoders.seq2seq import (
    S2SRNNBeamSearcher,
    S2SRNNGreedySearcher,
)
from speechbrain_tpu.lobes.features import Fbank
from speechbrain_tpu.lobes.models.CRDNN import CRDNN
from speechbrain_tpu.nnet.embedding import Embedding
from speechbrain_tpu.nnet.linear import Linear
from speechbrain_tpu.nnet.losses import nll_loss
from speechbrain_tpu.nnet.RNN import AttentionalRNNDecoder
from speechbrain_tpu.utils.epoch_loop import EpochCounter

BOS, EOS = 0, 0
VOCAB = 6  # 0 bos/eos + phones 1..5


def make_dataset(n=10):
    rng = np.random.default_rng(3)
    data = {}
    for i in range(n):
        phones = rng.integers(1, VOCAB, size=2).tolist()
        sig = np.concatenate(
            [
                np.sin(2 * np.pi * (250 * p) * np.arange(1200) / 16000.0)
                for p in phones
            ]
        ).astype(np.float32)
        data[f"u{i}"] = {
            "sig": sig,
            "phn_bos": np.asarray([BOS] + phones, np.int32),
            "phn_eos": np.asarray(phones + [EOS], np.int32),
            "phn": np.asarray(phones, np.int32),
        }
    ds = DynamicItemDataset(data)
    ds.set_output_keys(["id", "sig", "phn_bos", "phn_eos", "phn"])
    return ds


class Seq2SeqBrain(sb.Brain):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.fbank = Fbank(n_mels=20)
        self.train_losses = []

    def compute_forward(self, params, state, batch, stage, rng):
        wavs, wav_lens = batch["sig"]
        tgt_bos, _ = batch["phn_bos"]
        feats = self.fbank(wavs)
        train = stage == sb.Stage.TRAIN
        mut = ["batch_stats"] if train else []
        enc, u1 = self.module_apply(
            "enc", params, state, feats, train=train, mutable_state=mut
        )
        emb, _ = self.module_apply("emb", params, state, tgt_bos, mutable_state=[])
        dec_out, u2 = self.module_apply(
            "dec", params, state, emb, enc, wav_lens, mutable_state=[]
        )
        dec_out = dec_out[0] if isinstance(dec_out, tuple) else dec_out
        logits, _ = self.module_apply("lin", params, state, dec_out, mutable_state=[])
        logp = jax.nn.log_softmax(logits, axis=-1)
        ns = self.merge_state(state, "enc", u1)
        return (logp, enc), ns

    def compute_objectives(self, predictions, batch, stage):
        logp, _ = predictions
        tgt_eos, tgt_lens = batch["phn_eos"]
        return nll_loss(logp, tgt_eos, length=tgt_lens)

    def init_forward(self, rng, eb):
        wavs, wav_lens = eb["sig"]
        tgt_bos, _ = eb["phn_bos"]
        feats = self.fbank(wavs)
        p_enc, s_enc = self.init_module(rng, "enc", feats, train=False)
        enc, _ = self.module_apply(
            "enc", {"enc": p_enc}, {k: {"enc": v} for k, v in s_enc.items()},
            feats, train=False,
        )
        p_emb, _ = self.init_module(rng, "emb", tgt_bos)
        emb, _ = self.module_apply("emb", {"emb": p_emb}, {}, tgt_bos)
        p_dec, _ = self.init_module(rng, "dec", emb, enc, wav_lens)
        dec_out, _ = self.module_apply(
            "dec", {"dec": p_dec}, {}, emb, enc, wav_lens
        )
        dec_out = dec_out[0] if isinstance(dec_out, tuple) else dec_out
        p_lin, _ = self.init_module(rng, "lin", dec_out)
        out = {"params": {"enc": p_enc, "emb": p_emb, "dec": p_dec, "lin": p_lin}}
        for coll, tree in s_enc.items():
            out[coll] = {"enc": tree}
        return out

    def on_stage_end(self, stage, loss, epoch=None):
        if stage == sb.Stage.TRAIN:
            self.train_losses.append(loss)


def test_seq2seq_asr_overfits_and_decodes(tmp_path):
    ds = make_dataset()
    modules = {
        "enc": CRDNN(cnn_blocks=1, cnn_channels=(4,), inter_layer_pooling_size=(2,),
                     rnn_layers=1, rnn_neurons=24, dnn_blocks=1, dnn_neurons=24,
                     dropout=0.0),
        "emb": Embedding(num_embeddings=VOCAB, embedding_dim=12),
        "dec": AttentionalRNNDecoder(hidden_size=24, attn_dim=24,
                                     attn_type="content"),
        "lin": Linear(n_neurons=VOCAB),
    }
    brain = Seq2SeqBrain(
        modules=modules,
        opt_class=lambda: optax.adam(3e-3),
        run_opts={"device": "cpu", "noprogressbar": True},
    )
    brain.fit(EpochCounter(20), train_set=ds,
              train_loader_kwargs={"batch_size": 5})
    assert brain.train_losses[-1] < 0.3, brain.train_losses

    # decode with greedy + beam through the searcher APIs
    batch = next(iter(brain.make_dataloader(ds, sb.Stage.TEST, ckpt_prefix=None,
                                            batch_size=10)))
    device_batch = brain._prepare_batch(batch)
    (logp, enc), _ = brain.compute_forward(
        brain.params, brain.model_state, device_batch, sb.Stage.TEST, brain.rng
    )
    wav_lens = device_batch["sig"].lengths

    params = brain.params

    def step_fn(inp_tokens, memory, enc_states, enc_lens):
        emb, _ = brain.module_apply("emb", params, {}, inp_tokens[:, None])
        dec = brain.modules.dec
        out, new_state, attn = dec.apply(
            {"params": params["dec"]}, emb[:, 0], memory, enc_states, enc_lens,
            method="forward_step",
        )
        logits, _ = brain.module_apply("lin", params, {}, out)
        return jax.nn.log_softmax(logits, axis=-1), new_state, attn

    def init_fn(batch_size, enc_states, enc_lens):
        dec = brain.modules.dec
        state = dec.apply(
            {"params": params["dec"]}, batch_size, enc_states.shape[1],
            method="init_state",
        )
        T = enc_states.shape[1]
        mask0 = (
            jnp.arange(T)[None, :] < jnp.round(enc_lens * T)[:, None]
        ).astype(jnp.float32)
        state["prev_attn"] = mask0 / jnp.maximum(
            mask0.sum(-1, keepdims=True), 1.0
        )
        return state

    greedy = S2SRNNGreedySearcher(
        step_fn=step_fn, init_fn=init_fn, bos_index=BOS, eos_index=EOS,
        min_decode_ratio=0.0, max_decode_ratio=0.6,
    )
    hyps, _, _, _ = greedy(enc, wav_lens)
    refs = [row.tolist() for row in np.asarray(device_batch["phn"].data)]
    correct = sum(1 for h, r in zip(hyps, refs) if h == r)
    assert correct >= 7, (hyps[:5], refs[:5])

    beam = S2SRNNBeamSearcher(
        step_fn=step_fn, init_fn=init_fn, bos_index=BOS, eos_index=EOS,
        min_decode_ratio=0.0, max_decode_ratio=0.6, beam_size=3,
    )
    bhyps, _, _, _ = beam(enc, wav_lens)
    bcorrect = sum(1 for h, r in zip(bhyps, refs) if h == r)
    assert bcorrect >= correct - 1, (bhyps[:5], refs[:5])
