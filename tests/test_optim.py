"""Optimizer/schedule builder tests (train/optim.py)."""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from foundationstereo_tpu.train.optim import (
    build_optimizer,
    build_schedule,
    ema_init,
    ema_update,
    label_params,
    parse_lr_lambda,
)


def test_parse_lr_lambda_piecewise():
    lam = parse_lr_lambda("Piecewise((1.0, epoch < 160000), (0.1, True))")
    assert lam(0) == 1.0
    assert lam(159999) == 1.0
    assert lam(160000) == 0.1


def test_parse_lr_lambda_expr():
    lam = parse_lr_lambda("Min(1.0, epoch / 100)")
    assert lam(50) == 0.5
    assert lam(1000) == 1.0


def test_build_schedule_on_device():
    sched = build_schedule(
        {"type": "LambdaLR",
         "params": {"lr_lambda": "Piecewise((1.0, epoch < 1000), (0.1, True))"}},
        base_lr=2e-4)
    v0 = float(jax.jit(sched)(jnp.asarray(0)))
    v1 = float(jax.jit(sched)(jnp.asarray(5000)))
    np.testing.assert_allclose(v0, 2e-4, rtol=1e-5)
    np.testing.assert_allclose(v1, 2e-5, rtol=1e-5)


def test_label_params_freezes_dino():
    params = {
        "feature": {"dino": {"block0": {"kernel": jnp.ones((2, 2))}},
                    "edgenext": {"kernel": jnp.ones((2, 2))}},
        "cnet": {"kernel": jnp.ones((2, 2))},
    }
    labels = label_params(params, [{"params": {"include": ["*"], "exclude": []}}])
    assert labels["feature"]["dino"]["block0"]["kernel"] == "frozen"
    assert labels["feature"]["edgenext"]["kernel"] == "group0"
    assert labels["cnet"]["kernel"] == "group0"


def test_param_groups_by_pattern():
    params = {"backbone": {"w": jnp.ones(3)}, "head": {"w": jnp.ones(3)}}
    groups = [
        {"params": {"include": ["backbone/*"], "exclude": []}, "lr": 1e-5},
        {"params": {"include": ["*"], "exclude": []}, "lr": 1e-3},
    ]
    labels = label_params(params, groups)
    assert labels["backbone"]["w"] == "group0"
    assert labels["head"]["w"] == "group1"

    tx, _ = build_optimizer(params, {"type": "AdamW", "params": groups})
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    # group1's lr is 100x group0's.
    r = abs(float(updates["head"]["w"][0])) / abs(float(updates["backbone"]["w"][0]))
    np.testing.assert_allclose(r, 100.0, rtol=0.05)


def test_ema():
    p = {"w": jnp.ones(3)}
    e = ema_init(p)
    p2 = {"w": jnp.zeros(3)}
    e2 = ema_update(e, p2, decay=0.9)
    np.testing.assert_allclose(np.asarray(e2["w"]), 0.9)
