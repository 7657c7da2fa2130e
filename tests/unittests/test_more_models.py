"""Shape tests for the wider model zoo."""

import jax
import jax.numpy as jnp
import numpy as np

KEY = jax.random.PRNGKey(0)


def test_resnet():
    from speechbrain_tpu.lobes.models.ResNet import ResNet

    net = ResNet(channels=(8, 8, 16, 16), layers=(1, 1, 1, 1), lin_neurons=16)
    x = jnp.ones((2, 40, 24))
    v = net.init(KEY, x, train=False)
    assert net.apply(v, x, train=False).shape == (2, 1, 16)


def test_contextnet():
    from speechbrain_tpu.lobes.models.ContextNet import ContextNet

    net = ContextNet(blocks=3, channels=(16, 16, 16), strides=(1, 2, 1),
                     n_layers_per_block=2)
    x = jnp.ones((2, 32, 24))
    v = net.init(KEY, x, train=False)
    assert net.apply(v, x, train=False).shape == (2, 16, 16)


def test_espnet_vgg():
    from speechbrain_tpu.lobes.models.ESPnetVGG import ESPnetVGG

    net = ESPnetVGG(channels=(4, 8), rnn_layers=1, rnn_neurons=16)
    x = jnp.ones((2, 32, 20))
    v = net.init(KEY, x)
    assert net.apply(v, x).shape == (2, 8, 32)


def test_cnn14():
    from speechbrain_tpu.lobes.models.Cnn14 import Cnn14

    net = Cnn14(mel_bins=24, emb_dim=32, base_channels=4)
    x = jnp.ones((2, 64, 24))
    v = net.init(KEY, x, train=False)
    assert net.apply(v, x, train=False).shape == (2, 2, 32)


def test_branchformer():
    from speechbrain_tpu.lobes.models.Branchformer import BranchformerEncoder
    from speechbrain_tpu.nnet.attention import RelPosEncXL

    enc = BranchformerEncoder(num_layers=2, d_model=32, nhead=4,
                              csgu_linear_units=64, kernel_size=7)
    x = jax.random.normal(KEY, (2, 16, 32))
    pe = RelPosEncXL(emb_dim=32)(x)
    v = enc.init(KEY, x, pos_embs=pe)
    out, _ = enc.apply(v, x, pos_embs=pe)
    assert out.shape == (2, 16, 32)


def test_wav2vec_components():
    from speechbrain_tpu.lobes.models.wav2vec import (
        W2VLatentExtractor,
        W2VTargetQuantiser,
        sample_negatives,
        w2v_contrastive_loss,
        w2v_mask,
    )

    ext = W2VLatentExtractor(out_channels=(8, 8), kernel_sizes=(11, 3), strides=(5, 2))
    x = jnp.ones((2, 2000))
    v = ext.init(KEY, x)
    latents = ext.apply(v, x)
    assert latents.shape[0] == 2 and latents.shape[2] == 8

    q = W2VTargetQuantiser(in_dim=8, out_dim=8, quantiser_vars=16)
    vq = q.init({"params": KEY, "gumbel": KEY}, latents, train=True)
    targets, meta = q.apply(vq, latents, train=False)
    assert targets.shape == latents.shape[:2] + (8,)

    mask = w2v_mask(latents.shape[:2], 0.5, 4, KEY)
    assert mask.shape == latents.shape[:2]
    negs = sample_negatives(targets, 3, KEY)
    assert negs.shape == (3,) + targets.shape
    loss = w2v_contrastive_loss(targets, targets, negs, mask)
    assert np.isfinite(float(loss))


def test_bestrq():
    from speechbrain_tpu.lobes.models.BESTRQ import brq_mask, compute_brq_loss
    from speechbrain_tpu.nnet.quantisers import RandomProjectionQuantizer

    feats = jax.random.normal(KEY, (2, 20, 16))
    q = RandomProjectionQuantizer(input_dim=16, cb_dim=8, cb_vocab=32)
    v = q.init(KEY, feats)
    targets = q.apply(v, feats)
    logits = jax.random.normal(KEY, (2, 20, 32))
    mask = brq_mask((2, 20), 0.5, 4, KEY)
    loss = compute_brq_loss(logits, targets, mask)
    assert np.isfinite(float(loss))


def test_downsamplers():
    from speechbrain_tpu.lobes.models.downsampling import (
        Conv1DDownsampler,
        PoolingDownsampler,
        SignalDownsampler,
    )

    x = jnp.ones((2, 1600))
    sd = SignalDownsampler(2)
    assert sd(x).shape == (2, 800)
    cd = Conv1DDownsampler(downsampling_factor=2, kernel_size=21)
    v = cd.init(KEY, x)
    assert cd.apply(v, x).shape[1] == 800
    pd = PoolingDownsampler(downsampling_factor=2)
    v = pd.init(KEY, x)
    assert pd.apply(v, x).shape == (2, 800)
