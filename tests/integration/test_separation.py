"""Integration: SepFormer separation trained with PIT-SI-SNR to improve on
a tiny 2-speaker mixture set (mirrors reference tests/integration/
separation), plus model shape tests for ConvTasNet/MetricGAN."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

import speechbrain_tpu as sb
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.lobes.models.conv_tasnet import MaskNet
from speechbrain_tpu.lobes.models.dual_path import SepformerWrapper
from speechbrain_tpu.lobes.models.MetricGAN import (
    EnhancementGenerator,
    MetricDiscriminator,
)
from speechbrain_tpu.nnet.losses import cal_si_snr, get_si_snr_with_pitwrapper
from speechbrain_tpu.utils.epoch_loop import EpochCounter

KEY = jax.random.PRNGKey(0)


def make_mixtures(n=6, T=2000):
    rng = np.random.default_rng(0)
    data = {}
    for i in range(n):
        t = np.arange(T) / 8000.0
        s1 = np.sin(2 * np.pi * 400 * t).astype(np.float32)
        s2 = np.sign(np.sin(2 * np.pi * 97 * t)).astype(np.float32) * 0.5
        mix = s1 + s2
        data[f"m{i}"] = {
            "mix": mix,
            "sources": np.stack([s1, s2], axis=-1),
        }
    ds = DynamicItemDataset(data)
    ds.set_output_keys(["id", "mix", "sources"])
    return ds


class SepBrain(sb.Brain):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.train_losses = []

    def compute_forward(self, params, state, batch, stage, rng):
        mix, lens = batch["mix"]
        est, _ = self.module_apply("model", params, state, mix, train=False)
        return est, state

    def compute_objectives(self, est, batch, stage):
        sources, _ = batch["sources"]
        return jnp.mean(get_si_snr_with_pitwrapper(sources, est))

    def init_forward(self, rng, eb):
        mix, lens = eb["mix"]
        p, s = self.init_module(rng, "model", mix, train=False)
        out = {"params": {"model": p}}
        for coll, tree in s.items():
            out[coll] = {"model": tree}
        return out

    def on_stage_end(self, stage, loss, epoch=None):
        if stage == sb.Stage.TRAIN:
            self.train_losses.append(loss)


def test_sepformer_improves_sisnr():
    ds = make_mixtures()
    model = SepformerWrapper(
        encoder_kernel_size=16,
        encoder_out_nchannels=32,
        masknet_chunksize=20,
        masknet_numlayers=1,
        masknet_numspks=2,
        intra_numlayers=1,
        inter_numlayers=1,
        intra_nhead=4,
        inter_nhead=4,
        intra_dffn=32,
        inter_dffn=32,
    )
    brain = SepBrain(
        modules={"model": model},
        opt_class=lambda: optax.adam(1e-3),
        run_opts={"device": "cpu", "noprogressbar": True},
    )
    brain.fit(EpochCounter(6), train_set=ds, train_loader_kwargs={"batch_size": 3})
    # PIT-SI-SNR loss (negative SI-SNR) must drop substantially
    assert brain.train_losses[-1] < brain.train_losses[0] - 1.0, brain.train_losses


def test_masknet_shapes():
    net = MaskNet(N=8, B=4, H=8, P=3, X=2, R=1, C=2)
    x = jnp.ones((2, 50, 8))
    v = net.init(KEY, x)
    out = net.apply(v, x)
    assert out.shape == (2, 2, 50, 8)
    assert float(out.min()) >= 0.0


def test_metricgan_models():
    g = EnhancementGenerator(lstm_neurons=16, dnn_neurons=16)
    x = jnp.abs(jax.random.normal(KEY, (2, 30, 65)))
    v = g.init(KEY, x)
    mask = g.apply(v, x)
    assert mask.shape == x.shape
    assert 0.0 <= float(mask.min()) and float(mask.max()) <= 1.2

    d = MetricDiscriminator(base_channels=4)
    pair = jnp.stack([x, x * mask], axis=-1)
    vd = d.init(KEY, pair, train=False)
    score = d.apply(vd, pair, train=False)
    assert score.shape == (2, 1)


def test_resepformer_improves_sisnr():
    """RE-SepFormer (segment transformer + 'av' memory) overfit run
    (reference lobes/models/resepformer.py:664)."""
    from speechbrain_tpu.lobes.models.resepformer import RESepformerWrapper

    ds = make_mixtures()
    model = RESepformerWrapper(
        encoder_kernel_size=16,
        encoder_out_nchannels=32,
        masknet_chunksize=20,
        masknet_numspks=2,
        n_layers=2,
        nhead=4,
        d_ffn=32,
    )
    brain = SepBrain(
        modules={"model": model},
        opt_class=lambda: optax.adam(1e-3),
        run_opts={"device": "cpu", "noprogressbar": True},
    )
    brain.fit(EpochCounter(6), train_set=ds, train_loader_kwargs={"batch_size": 3})
    assert brain.train_losses[-1] < brain.train_losses[0] - 1.0, brain.train_losses


def test_convtasnet_end_to_end_improves_sisnr():
    """Full ConvTasNet: Encoder -> MaskNet -> Decoder trained with
    PIT-SI-SNR (reference conv_tasnet.py:13,62,175)."""
    import flax.linen as nn

    from speechbrain_tpu.lobes.models import conv_tasnet as ctn

    class ConvTasNet(nn.Module):
        @nn.compact
        def __call__(self, mix, train=False):
            w = ctn.Encoder(L=16, N=32, name="enc")(mix)
            masks = ctn.MaskNet(
                N=32, B=16, H=32, P=3, X=3, R=1, C=2, name="masknet"
            )(w)
            est = ctn.Decoder(L=16, N=32, name="dec")(w, masks)
            T = mix.shape[1]
            if est.shape[1] < T:
                est = jnp.pad(est, ((0, 0), (0, T - est.shape[1]), (0, 0)))
            return est[:, :T]

    ds = make_mixtures()
    brain = SepBrain(
        modules={"model": ConvTasNet()},
        opt_class=lambda: optax.adam(1e-3),
        run_opts={"device": "cpu", "noprogressbar": True},
    )
    brain.fit(EpochCounter(6), train_set=ds, train_loader_kwargs={"batch_size": 3})
    assert brain.train_losses[-1] < brain.train_losses[0] - 1.0, brain.train_losses
