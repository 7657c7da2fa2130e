"""Integration: adversarial enhancement with alternating G/D updates via
Brain.make_gan_steps (mirrors reference tests/integration/enhance_GAN)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

import speechbrain_tpu as sb
from speechbrain_tpu.nnet.linear import Linear


class TinyG(Linear):
    pass


def test_gan_enhancement_training():
    rng = np.random.default_rng(0)
    clean = np.sin(np.linspace(0, 20, 64))[None].repeat(8, 0)
    clean = jnp.asarray(clean.astype("float32"))
    noisy = clean + jnp.asarray(
        rng.normal(0, 0.3, clean.shape).astype("float32")
    )

    modules = {
        "generator": Linear(n_neurons=64),
        "discriminator": Linear(n_neurons=1),
    }
    brain = sb.Brain(
        modules=modules,
        opt_class=lambda: optax.adam(2e-3),
        run_opts={"device": "cpu", "noprogressbar": True},
    )
    # manual init (no fit loop here)
    k = jax.random.PRNGKey(0)
    p_g, _ = brain.init_module(k, "generator", noisy)
    p_d, _ = brain.init_module(k, "discriminator", clean)
    brain.params = {"generator": p_g, "discriminator": p_d}
    brain.model_state = {}
    brain.init_optimizers()

    def d_loss_fn(params, state, batch, rng):
        noisy_b, clean_b = batch
        fake, _ = brain.module_apply("generator", params, state, noisy_b,
                                     mutable_state=[])
        d_real, _ = brain.module_apply("discriminator", params, state,
                                       clean_b, mutable_state=[])
        d_fake, _ = brain.module_apply(
            "discriminator", params, state,
            jax.lax.stop_gradient(fake), mutable_state=[],
        )
        # LSGAN: real -> 1, fake -> 0
        loss = jnp.mean((d_real - 1.0) ** 2) + jnp.mean(d_fake**2)
        return loss, state

    def g_loss_fn(params, state, batch, rng):
        noisy_b, clean_b = batch
        fake, _ = brain.module_apply("generator", params, state, noisy_b,
                                     mutable_state=[])
        d_fake, _ = brain.module_apply("discriminator", params, state, fake,
                                       mutable_state=[])
        adv = jnp.mean((d_fake - 1.0) ** 2)
        rec = jnp.mean((fake - clean_b) ** 2)
        return adv + 10.0 * rec, state

    d_step, g_step = brain.make_gan_steps(
        d_loss_fn, g_loss_fn, "discriminator", "generator"
    )

    batch = (noisy, clean)
    params, opt_state, state = brain.params, brain.opt_state, {}
    g0 = None
    for i in range(150):
        params, state, opt_state, d_loss = d_step(
            params, state, opt_state, batch, jax.random.PRNGKey(i)
        )
        params, state, opt_state, g_loss = g_step(
            params, state, opt_state, batch, jax.random.PRNGKey(1000 + i)
        )
        if g0 is None:
            g0 = float(g_loss)

    # generator denoises: output closer to clean than input was
    fake, _ = brain.module_apply("generator", params, {}, noisy)
    err_out = float(jnp.mean((fake - clean) ** 2))
    err_in = float(jnp.mean((noisy - clean) ** 2))
    assert err_out < err_in / 3, (err_out, err_in)
    assert float(g_loss) < g0, (g0, float(g_loss))

    # discriminator still separates real from fake
    d_real, _ = brain.module_apply("discriminator", params, {}, clean)
    d_fake, _ = brain.module_apply("discriminator", params, {}, fake)
    assert jnp.isfinite(d_real).all() and jnp.isfinite(d_fake).all()
