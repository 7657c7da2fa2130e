"""Device-side nonfinite guard: with loss_sync_interval > 1 the loss and
nonfinite counters accumulate on device and sync once per window
(beyond-reference: torch core.py:855-884 syncs every step), while the
averaged epoch loss and the patience policy stay equivalent."""

import jax.numpy as jnp
import numpy as np
import pytest

import speechbrain_tpu as sb


class TinyBrain(sb.Brain):
    def compute_forward(self, params, state, batch, stage, rng):
        x, _ = batch["x"]
        return x * params["m"]["w"], state

    def compute_objectives(self, predictions, batch, stage):
        y, _ = batch["y"]
        return jnp.mean((predictions - y) ** 2)

    def init_forward(self, rng, eb):
        return {"params": {"m": {"w": jnp.ones(())}}}


def _dataset(n=8):
    from speechbrain_tpu.dataio.dataset import DynamicItemDataset

    data = {
        f"u{i}": {"x": np.full((4,), float(i + 1), np.float32),
                  "y": np.zeros((4,), np.float32)}
        for i in range(n)
    }
    ds = DynamicItemDataset(data)
    ds.set_output_keys(["id", "x", "y"])
    return ds


def _train(interval):
    import optax

    brain = TinyBrain(
        modules={},
        opt_class=lambda: optax.sgd(0.0),
        hparams={},
        run_opts={"loss_sync_interval": interval, "noprogressbar": True},
    )
    from speechbrain_tpu.utils.epoch_loop import EpochCounter

    brain.fit(EpochCounter(1), _dataset(), None,
              train_loader_kwargs={"batch_size": 2, "shuffle": False})
    return brain.train_loss


def test_windowed_sync_matches_per_step_average():
    assert _train(3) == pytest.approx(_train(1), rel=1e-5)
