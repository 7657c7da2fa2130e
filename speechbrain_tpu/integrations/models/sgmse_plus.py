"""SGMSE+: speech enhancement with score-based generative models.

Capability parity with the reference's
``speechbrain/integrations/models/sgmse_plus.py`` (ScoreModel at
sgmse_plus.py:22, which wraps the external ``sgmse`` torch package).
This is a self-contained TPU-native implementation (Richter et al.
2023, "Speech Enhancement and Dereverberation with Diffusion-based
Generative Models"):

- The OUVE SDE (Ornstein-Uhlenbeck drift toward the noisy observation
  ``y`` + variance-exploding diffusion) in closed form — mean/std are
  analytic, so training samples x_t in one fused elementwise op.
- Complex STFTs as 2-channel real/imag arrays, channels-last
  ``(B, F, T, 2)``, backing onto the framework's diffusion UNet (MXU
  convs) by default; any ``module(x_t_and_y, t)`` backbone works.
- The predictor-corrector sampler (reverse Euler-Maruyama + annealed
  Langevin) is one ``lax.scan`` — the full N-step enhancement compiles
  to a single XLA program; rng is explicit.
"""

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from speechbrain_tpu.nnet.unet import UNetModel


class OUVESDE:
    """Ornstein-Uhlenbeck Variance-Exploding SDE (SGMSE+):
    ``dx = gamma (y - x) dt + sigma_min (sigma_max/sigma_min)^t
    sqrt(2 ln(sigma_max/sigma_min)) dw``."""

    def __init__(self, gamma=1.5, sigma_min=0.05, sigma_max=0.5, N=30,
                 T=1.0):
        self.gamma = gamma
        self.sigma_min = sigma_min
        self.sigma_max = sigma_max
        self.N = N
        self.T = T
        self.logratio = jnp.log(sigma_max / sigma_min)

    def mean(self, x0, y, t):
        """Closed-form marginal mean: exponential pull toward y."""
        w = jnp.exp(-self.gamma * t)
        w = w.reshape((-1,) + (1,) * (x0.ndim - 1))
        return w * x0 + (1.0 - w) * y

    def std(self, t):
        """Closed-form marginal std of the OUVE process."""
        L, g = self.logratio, self.gamma
        var = (
            self.sigma_min**2
            * L / (g + L)
            * (jnp.exp(2 * L * t) - jnp.exp(-2 * g * t))
        )
        return jnp.sqrt(jnp.maximum(var, 1e-12))

    def marginal_prob(self, x0, y, t):
        return self.mean(x0, y, t), self.std(t)

    def diffusion(self, t):
        """g(t) of the forward SDE."""
        return (
            self.sigma_min
            * (self.sigma_max / self.sigma_min) ** t
            * jnp.sqrt(2.0 * self.logratio)
        )


class ScoreModel(nn.Module):
    """Score network + OUVE SDE for enhancement in the STFT domain
    (reference ScoreModel at sgmse_plus.py:22).

    ``__call__(x_t, y, t)`` -> score estimate (same shape as x_t, which
    is (B, F, T, C)); ``loss(x0, y, t, z)`` -> denoising score-matching
    loss; ``enhance(y, rng, N)`` -> predictor-corrector sample.
    """

    backbone: Optional[nn.Module] = None
    gamma: float = 1.5
    sigma_min: float = 0.05
    sigma_max: float = 0.5
    t_eps: float = 0.03
    N: int = 30
    model_channels: int = 32
    snr: float = 0.5  # corrector step size scale

    def setup(self):
        self.sde = OUVESDE(
            self.gamma, self.sigma_min, self.sigma_max, self.N
        )
        if self.backbone is not None:
            self.net = self.backbone
        else:
            self.net = UNetModel(
                in_channels=4,  # x_t (re, im) + y (re, im)
                model_channels=self.model_channels,
                out_channels=2,
                num_res_blocks=1,
                channel_mult=(1, 2),
                name="net",
            )

    def __call__(self, x_t, y, t, train=False):
        """Score estimate s(x_t, y, t) ≈ ∇ log p_t(x_t | y)."""
        inp = jnp.concatenate([x_t, y], axis=-1)
        raw = self.net(inp, t * 999.0)
        # network scaling 1/sigma: scores blow up as t -> 0
        std = self.sde.std(t).reshape((-1,) + (1,) * (x_t.ndim - 1))
        return -raw / std

    def loss(self, x0, y, t, z, train=False):
        """Denoising score matching with sigma^2 weighting
        (reference loss_type="score_matching"): E||s*std + z||^2."""
        mean, std = self.sde.marginal_prob(x0, y, t)
        stdb = std.reshape((-1,) + (1,) * (x0.ndim - 1))
        x_t = mean + stdb * z
        score = self(x_t, y, t, train=train)
        err = score * stdb + z
        return 0.5 * jnp.mean(jnp.sum(err**2, axis=tuple(range(1, x0.ndim))))

    def train_step_inputs(self, rng, x0):
        """Sample (t, z) for one step (host helper; rng explicit)."""
        r_t, r_z = jax.random.split(rng)
        t = (
            jax.random.uniform(r_t, (x0.shape[0],))
            * (self.sde.T - self.t_eps) + self.t_eps
        )
        z = jax.random.normal(r_z, x0.shape)
        return t, z

    def enhance(self, y, rng, N=None, corrector_steps=1):
        """Predictor-corrector reverse sampling from the noisy
        observation ``y`` (one ``lax.scan``; reference get_pc_sampler at
        sgmse_plus.py:244)."""
        sde = self.sde
        n_steps = N or sde.N
        # pad the (T, F) grid so the UNet's stride-2 stages divide evenly
        T0, F0 = y.shape[1], y.shape[2]
        pt, pf = (-T0) % 4, (-F0) % 4
        if pt or pf:
            y = jnp.pad(y, ((0, 0), (0, pt), (0, pf), (0, 0)))
        B = y.shape[0]
        ts = jnp.linspace(sde.T, self.t_eps, n_steps)
        dt = ts[0] - ts[1] if n_steps > 1 else sde.T - self.t_eps

        r_init, r_loop = jax.random.split(rng)
        std_T = sde.std(jnp.full((B,), sde.T)).reshape(
            (-1,) + (1,) * (y.ndim - 1)
        )
        x = y + std_T * jax.random.normal(r_init, y.shape)

        if self.is_initializing():
            # params cannot be created inside lax.scan: trace one score
            # call to materialize them, skip the sampling loop
            _ = self(x, y, jnp.full((B,), sde.T))
            return x[:, :T0, :F0]

        def body(carry, inp):
            x, r = carry
            t = inp
            tb = jnp.full((B,), t)
            g = sde.diffusion(t)
            # corrector: annealed Langevin
            def corr(x, r):
                r, rz = jax.random.split(r)
                score = self(x, y, tb)
                noise = jax.random.normal(rz, x.shape)
                eps = 2 * (self.snr * g) ** 2
                return x + eps * score + jnp.sqrt(2 * eps) * noise, r

            for _ in range(corrector_steps):
                x, r = corr(x, r)
            # predictor: reverse Euler-Maruyama
            score = self(x, y, tb)
            drift = self.gamma * (y - x) - (g**2) * score
            r, rz = jax.random.split(r)
            noise = jax.random.normal(rz, x.shape)
            x = x - drift * dt + g * jnp.sqrt(dt) * noise
            return (x, r), None

        (x, _), _ = jax.lax.scan(body, (x, r_loop), ts)
        return x[:, :T0, :F0]
