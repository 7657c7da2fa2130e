"""Integration: VAE trained on synthetic spectra; reconstruction improves
and latent sampling works (mirrors reference tests/integration/autoencoder)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from speechbrain_tpu.nnet.autoencoders import VariationalAutoencoder


def test_vae_overfits_reconstruction():
    rng = np.random.default_rng(0)
    # two prototype "spectra" + noise
    protos = np.stack([np.sin(np.linspace(0, 6, 16)),
                       np.cos(np.linspace(0, 6, 16))]).astype("float32")
    x = np.concatenate(
        [protos[i % 2][None] + rng.normal(0, 0.05, (1, 16)).astype("float32")
         for i in range(32)]
    )
    x = jnp.asarray(x)

    from speechbrain_tpu.nnet.linear import Linear

    vae = VariationalAutoencoder(
        encoder=Linear(n_neurons=32), decoder=Linear(n_neurons=16),
        latent_dim=4,
    )
    rngs = {"params": jax.random.PRNGKey(0),
            "latent": jax.random.PRNGKey(1)}
    v = vae.init(rngs, x)
    opt = optax.adam(1e-2)
    opt_state = opt.init(v)

    @jax.jit
    def step(v, opt_state, key):
        def loss_fn(p):
            out = vae.apply(p, x, rngs={"latent": key})
            rec = jnp.mean((out.rec - x) ** 2)
            kl = -0.5 * jnp.mean(
                1 + out.log_var - out.mean**2
                - jnp.exp(out.log_var)
            )
            return rec + 0.01 * kl, rec

        (loss, rec), g = jax.value_and_grad(loss_fn, has_aux=True)(v)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(v, updates), opt_state, rec

    key = jax.random.PRNGKey(2)
    recs = []
    for i in range(150):
        key, sub = jax.random.split(key)
        v, opt_state, rec = step(v, opt_state, sub)
        recs.append(float(rec))
    assert recs[-1] < 0.02 and recs[-1] < recs[0] / 5, (recs[0], recs[-1])

    # deterministic (mean) path reconstructs too
    out = vae.apply(v, x, sample=False, rngs={"latent": key})
    assert float(jnp.mean((out.rec - x) ** 2)) < 0.03
    assert out.latent.shape == (32, 4)
