"""Train-step tests: loss finite, params update, frozen backbone untouched,
EMA tracks, NaN batches skipped, checkpoint roundtrip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from foundationstereo_tpu.train.trainer import Trainer, make_label_index


TRAIN_CONFIG = {
    "model": {
        "max_disp": 64, "vit_size": "vits", "mixed_precision": False,
        "train_iters": 2, "valid_iters": 3,
        "corr_radius": 4, "corr_levels": 4, "n_gru_layers": 3,
        "hidden_dims": [128, 128, 128],
    },
    "loss": {
        "stereo": {"foundation_stereo": {
            "function": "foundation_stereo_loss", "weight": 1.0,
            "params": {"gamma": 0.9, "max_disparity": 192.0}}},
        "invalid": {"dummy": {
            "function": "disparity_l1_loss", "weight": 0.0,
            "params": {"max_disparity": 192.0}}},
    },
    "optimizer": {
        "type": "AdamW",
        "params": [{"params": {"include": ["*"], "exclude": []},
                    "lr": 1e-4, "weight_decay": 1e-4,
                    "betas": [0.9, 0.999], "eps": 1e-8}],
    },
    "lr_scheduler": {
        "type": "LambdaLR",
        "params": {"lr_lambda": "Piecewise((1.0, epoch < 160000), (0.1, True))"},
    },
}


def make_batch(rng, b=2, h=64, w=96):
    return {
        "left": jnp.asarray(rng.uniform(0, 255, (b, h, w, 3)).astype(np.float32)),
        "right": jnp.asarray(rng.uniform(0, 255, (b, h, w, 3)).astype(np.float32)),
        "disparity": jnp.asarray(rng.uniform(0, 40, (b, h, w)).astype(np.float32)),
        "mask": jnp.asarray(rng.uniform(size=(b, h, w)) > 0.2),
        "label_idx": jnp.asarray(make_label_index(["stereo", "invalid"],
                                                  TRAIN_CONFIG["loss"])),
        "rng": jnp.asarray(np.array([0, 1], np.uint32)),
    }


@pytest.fixture(scope="module")
def _trainer_state():
    rng = np.random.default_rng(0)
    trainer = Trainer(TRAIN_CONFIG, seed=0)
    batch = make_batch(rng)
    state = trainer.init_state(batch)
    return trainer, state, batch


@pytest.fixture
def trainer_state(_trainer_state):
    # train_step donates its input state, so hand each test a fresh copy.
    trainer, state, batch = _trainer_state
    return trainer, jax.tree.map(jnp.copy, state), batch


def test_train_step_updates(trainer_state):
    trainer, state, batch = trainer_state
    dino_before = jax.tree.map(np.asarray, state.params["feature"]["dino"])
    head_before = np.asarray(
        jax.tree.leaves(state.params["refine"]["update_block"])[0])

    new_state, metrics = trainer.train_step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["skipped_nonfinite"]) == 0.0
    assert int(new_state.step) == 1

    # Frozen monocular backbone must not move.
    dino_after = jax.tree.map(np.asarray, new_state.params["feature"]["dino"])
    for a, b in zip(jax.tree.leaves(dino_before), jax.tree.leaves(dino_after)):
        np.testing.assert_array_equal(a, b)

    # Trainable params must move.
    head_after = np.asarray(jax.tree.leaves(new_state.params["refine"]["update_block"])[0])
    assert not np.array_equal(head_before, head_after)

    # EMA drifts toward params.
    ema_leaf = np.asarray(jax.tree.leaves(new_state.ema_params["refine"]["update_block"])[0])
    assert not np.array_equal(ema_leaf, head_after)


def test_nan_batch_skipped(trainer_state):
    trainer, state, batch = trainer_state
    bad = dict(batch)
    bad["left"] = batch["left"].at[0, 0, 0, 0].set(jnp.nan)
    before = jax.tree.map(np.asarray, state.params)  # host copy pre-donation
    new_state, metrics = trainer.train_step(state, bad)
    assert float(metrics["skipped_nonfinite"]) == 1.0
    for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(new_state.params)):
        np.testing.assert_array_equal(a, np.asarray(b))


def test_eval_step(trainer_state):
    trainer, state, batch = trainer_state
    disp, metrics = trainer.eval_step(state, batch)
    assert disp.shape == batch["disparity"].shape
    assert np.isfinite(float(metrics["epe"][0]))


def test_checkpoint_roundtrip(tmp_path, trainer_state):
    from foundationstereo_tpu.train.checkpoints import CheckpointManager
    trainer, state, batch = trainer_state
    mgr = CheckpointManager(tmp_path / "ckpt")
    mgr.save(0, state, config=TRAIN_CONFIG)
    mgr.wait()
    restored, step = mgr.restore("latest", state)
    assert step == 0
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()
