"""Optimizer / LR-schedule builders (optax).

Mirrors the reference's config-driven builders (train/utils.py:15-85):

* optimizer type by name with fnmatch include/exclude param groups;
* LR lambdas parsed from sympy expression strings
  (e.g. ``"Piecewise((1.0, epoch < 160000), (0.1, True))"``);
* the frozen DepthAnything backbone (params under ``feature/dino``) is always
  masked out of updates (the reference freezes it via requires_grad=False,
  core/extractor.py:332-333).

Also provides warmup/cosine/poly schedules (train/utils.py:240-319) and an
EMA state (torch.optim.swa_utils.AveragedModel analog, scripts/train.py:173).
"""

from __future__ import annotations

import fnmatch
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax


FROZEN_PATTERNS = ("feature/dino/*", "feature/dino")


def _param_path_map(params) -> dict:
    """Flatten a param pytree into {'a/b/c': leaf_path} labels."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {}
    for path, _leaf in flat:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        out[key] = path
    return out


def _match(name: str, patterns) -> bool:
    return any(fnmatch.fnmatch(name, p) for p in patterns)


def label_params(params, group_specs: list[dict]) -> Any:
    """Label each param with its group index ('frozen' for the dino subtree).

    group_specs: config ``optimizer.params`` list, each with
    ``params.include`` / ``params.exclude`` fnmatch patterns.
    """

    def label_of(path_key: str) -> str:
        if _match(path_key, FROZEN_PATTERNS) or path_key.startswith("feature/dino/"):
            return "frozen"
        for gi, spec in enumerate(group_specs):
            inc = spec.get("params", {}).get("include", ["*"])
            exc = spec.get("params", {}).get("exclude", [])
            if _match(path_key, inc) and not _match(path_key, exc):
                return f"group{gi}"
        return "frozen"  # unmatched params are not updated

    return jax.tree_util.tree_map_with_path(
        lambda path, _leaf: label_of(
            "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)),
        params,
    )


def parse_lr_lambda(expr: str) -> Callable[[int], float]:
    """Parse a sympy LR-lambda expression in variable ``epoch``
    (train/utils.py:47-51)."""
    import sympy

    epoch = sympy.Symbol("epoch")
    fn = sympy.lambdify(epoch, sympy.sympify(expr), modules=["numpy"])
    return lambda step: float(fn(step))


def build_schedule(lr_scheduler_cfg: dict | None, base_lr: float) -> optax.Schedule:
    """Schedule from the reference's lr_scheduler config section."""
    if not lr_scheduler_cfg:
        return lambda step: base_lr
    typ = lr_scheduler_cfg.get("type", "LambdaLR")
    params = lr_scheduler_cfg.get("params", {})
    if typ == "LambdaLR":
        lam = parse_lr_lambda(params["lr_lambda"])
        table = _jit_lambda(lam)  # tabulated so it evaluates on-device under jit
        return lambda step: base_lr * table(jnp.asarray(step))
    if typ == "SequentialLR":
        subs = [build_schedule(s, base_lr) for s in params["schedulers"]]
        milestones = params["milestones"]
        return optax.join_schedules(subs, milestones)
    if typ == "warmup_cosine":
        return optax.warmup_cosine_decay_schedule(
            0.0, base_lr, params.get("warmup_steps", 1000),
            params.get("total_steps", 100000), params.get("end_lr", 0.0))
    if typ == "poly":
        return optax.polynomial_schedule(
            base_lr, params.get("end_lr", 0.0), params.get("power", 0.9),
            params.get("total_steps", 100000))
    raise ValueError(f"unknown scheduler {typ}")


def _jit_lambda(lam: Callable[[int], float], horizon: int = 1_000_001,
                stride: int = 1000) -> Callable:
    """Tabulate a python LR lambda so it can be evaluated on-device."""
    xs = np.arange(0, horizon, stride)
    ys = np.array([lam(int(x)) for x in xs], np.float32)
    xs_j, ys_j = jnp.asarray(xs, jnp.float32), jnp.asarray(ys)

    def fn(step):
        return jnp.interp(step.astype(jnp.float32), xs_j, ys_j)

    return fn


def build_optimizer(params, optimizer_cfg: dict, lr_scheduler_cfg: dict | None = None,
                    clip_norm: float = 1.0) -> tuple[optax.GradientTransformation, Any]:
    """Build the optax transform + param labels from reference-format config.

    Returns (tx, labels). Gradient clipping (scripts/train.py:415) is fused in.
    """
    typ = optimizer_cfg.get("type", "AdamW")
    group_specs = optimizer_cfg.get("params", [{"params": {"include": ["*"]}, "lr": 1e-4}])
    labels = label_params(params, group_specs)

    transforms = {"frozen": optax.set_to_zero()}
    for gi, spec in enumerate(group_specs):
        lr = spec.get("lr", 1e-4)
        sched = build_schedule(lr_scheduler_cfg, lr)
        kwargs = dict(
            b1=spec.get("betas", (0.9, 0.999))[0],
            b2=spec.get("betas", (0.9, 0.999))[1],
            eps=spec.get("eps", 1e-8),
        )
        if typ == "AdamW":
            tx = optax.adamw(sched, weight_decay=spec.get("weight_decay", 0.0), **kwargs)
        elif typ == "Adam":
            tx = optax.adam(sched, **kwargs)
        elif typ == "SGD":
            tx = optax.sgd(sched, momentum=spec.get("momentum", 0.0))
        else:
            raise ValueError(f"unknown optimizer {typ}")
        transforms[f"group{gi}"] = tx

    tx = optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.multi_transform(transforms, labels),
    )
    return tx, labels


# --------------------------------------------------------------------------
# EMA (scripts/train.py:173-175,424-426; decay 0.999)
# --------------------------------------------------------------------------


def ema_init(params):
    # Materialize copies: EMA must not alias the live params (aliased buffers
    # break donation and would silently track instead of averaging).
    return jax.tree.map(jnp.copy, params)


def ema_update(ema_params, params, decay: float = 0.999):
    return jax.tree.map(lambda e, p: decay * e + (1.0 - decay) * p, ema_params, params)
