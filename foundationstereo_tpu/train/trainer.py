"""Jitted train step, train state, and the per-label loss dispatch.

TPU-native redesign of the reference train loop (scripts/train.py:313-455):
the whole step — forward, per-label-type loss dispatch, backward, NaN-grad
skip, gradient clipping, optimizer update, EMA — is one compiled XLA program.
Data parallelism is expressed by sharding the batch over the mesh's ``data``
axis; gradient psums are inserted by GSPMD, and BatchNorm statistics are
automatically global (batch reductions over a sharded axis become
collectives), giving sync-BN for free.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from foundationstereo_tpu.config import ModelConfig
from foundationstereo_tpu.models.foundation_stereo import FoundationStereo
from foundationstereo_tpu.train import losses as L
from foundationstereo_tpu.train.optim import build_optimizer, ema_init, ema_update


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any


def make_label_index(label_types: list[str], loss_cfg: dict) -> np.ndarray:
    """Map per-sample label_type strings to indices into sorted(loss_cfg)."""
    keys = sorted(loss_cfg.keys())
    return np.array([keys.index(lt) for lt in label_types], np.int32)


class Trainer:
    """Owns the model, optimizer, and the compiled train/eval steps."""

    def __init__(self, config: dict, seed: int = 0, enable_ema: bool = True):
        self.config = config
        self.model_cfg = ModelConfig.from_dict(config["model"])
        self.model = FoundationStereo(self.model_cfg)
        self.loss_cfg = config.get("loss", {
            "stereo": {"main": {"function": "foundation_stereo_loss", "weight": 1.0,
                                "params": {"gamma": 0.9, "max_disparity": 192.0}}},
        })
        self.label_keys = sorted(self.loss_cfg.keys())
        self.seed = seed
        self.enable_ema = enable_ema
        self.iters = self.model_cfg.train_iters
        self._tx = None
        # Measurement-only knob (scripts/bench_train_step.py --bn_frozen):
        # run the forward-under-grad with train=False so BatchNorm uses
        # running stats — isolates the cost of batch-stat reductions (and
        # their recompute under remat) in the step time. NOT a training mode.
        self.train_flag = True

    def init_state(self, sample_batch: dict) -> TrainState:
        rng = jax.random.PRNGKey(self.seed)
        # Jit the init: eager flax init dispatches hundreds of tiny ops, each
        # one a separate (GSPMD-processed, on a mesh) program — minutes on the
        # 8-virtual-device CPU mesh and tens of minutes over the TPU tunnel
        # (same finding as __graft_entry__.entry, round 2).
        variables = jax.jit(
            lambda k, l, r: self.model.init(
                k, l, r, iters=1, test_mode=False, train=False)
        )(rng, sample_batch["left"][:1], sample_batch["right"][:1])
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        tx, _labels = build_optimizer(
            params, self.config.get("optimizer", {"type": "AdamW", "params": [
                {"params": {"include": ["*"], "exclude": []}, "lr": 1e-4,
                 "weight_decay": 1e-4}]}),
            self.config.get("lr_scheduler"))
        self._tx = tx
        opt_state = jax.jit(tx.init)(params)
        ema = ema_init(params) if self.enable_ema else None
        return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                          batch_stats=batch_stats, opt_state=opt_state,
                          ema_params=ema)

    # -- loss ---------------------------------------------------------------

    def _composite_loss(self, init_disp, preds, gt, mask, label_idx):
        """Per-sample weighted loss over the label-type registry."""
        init_full = init_disp * 4.0  # full-res units; upsampled inside the loss
        final = preds[-1]
        per_label_losses = []
        metrics = {}
        for lt in self.label_keys:
            total = jnp.zeros(gt.shape[0], jnp.float32)
            for name, spec in self.loss_cfg[lt].items():
                fn = L.LOSS_REGISTRY[spec["function"]]
                kwargs = dict(spec.get("params", {}))
                if spec["function"] == "foundation_stereo_loss":
                    loss, m = fn(init_full, preds, gt, mask, **kwargs)
                elif spec["function"] == "multi_scale_loss":
                    loss, m = fn(preds, gt, mask, **kwargs)
                else:
                    loss, m = fn(final, gt, mask, **kwargs)
                total = total + spec.get("weight", 1.0) * loss
                if lt != "invalid":
                    for k, v in m.items():
                        metrics[f"{lt}.{name}.{k}"] = v
            per_label_losses.append(total)
        stacked = jnp.stack(per_label_losses, axis=0)          # (L, B)
        onehot = jax.nn.one_hot(label_idx, len(self.label_keys), axis=0)
        per_sample = jnp.sum(stacked * onehot, axis=0)          # (B,)
        return per_sample, metrics

    # -- train step ---------------------------------------------------------

    def _loss_and_grads(self, params, batch_stats, batch):
        def loss_fn(params):
            out, mutated = self.model.apply(
                {"params": params, "batch_stats": batch_stats},
                batch["left"], batch["right"], iters=self.iters,
                test_mode=False, train=self.train_flag,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.wrap_key_data(batch["rng"])}
                if "rng" in batch else {},
            )
            init_disp, preds = out
            per_sample, metrics = self._composite_loss(
                init_disp, preds, batch["disparity"], batch["mask"],
                batch["label_idx"])
            loss = jnp.mean(per_sample)
            return loss, (metrics, mutated.get("batch_stats", batch_stats))

        return jax.value_and_grad(loss_fn, has_aux=True)(params)

    def _apply_grads(self, state, loss, metrics, new_bs, grads):
        # NaN/Inf-grad skip (scripts/train.py:410-414).
        tx = self._tx
        gnorm = optax_global_norm(grads)
        ok = jnp.isfinite(gnorm) & jnp.isfinite(loss)
        grads = jax.tree.map(lambda g: jnp.where(ok, g, jnp.zeros_like(g)), grads)

        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(
            lambda p, u: jnp.where(ok, p + u, p), state.params, updates)
        new_opt = jax.tree.map(lambda n, o: jnp.where(ok, n, o), new_opt, state.opt_state)

        new_ema = state.ema_params
        if self.enable_ema and state.ema_params is not None:
            new_ema = ema_update(state.ema_params, new_params, 0.999)

        metrics = {k: jnp.mean(v) for k, v in metrics.items()}
        metrics["loss"] = loss
        metrics["grad_norm"] = gnorm
        metrics["skipped_nonfinite"] = 1.0 - ok.astype(jnp.float32)

        return TrainState(step=state.step + 1, params=new_params,
                          batch_stats=new_bs, opt_state=new_opt,
                          ema_params=new_ema), metrics

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(self, state: TrainState, batch: dict):
        """One optimization step.

        batch: left/right (B,H,W,3) float 0-255, disparity (B,H,W), mask
        (B,H,W) bool, label_idx (B,) int32, rng (2,) uint32.
        """
        (loss, (metrics, new_bs)), grads = self._loss_and_grads(
            state.params, state.batch_stats, batch)
        return self._apply_grads(state, loss, metrics, new_bs, grads)

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step_accum(self, state: TrainState, batches: dict):
        """One optimization step over K accumulated micro-batches.

        batches: same keys as train_step but with a leading micro-batch axis
        (K, B, ...). Gradients are averaged over micro-batches before the
        single optimizer update (scripts/train.py's accelerator.accumulate
        semantics), scanning to bound memory.
        """
        k = batches["left"].shape[0]

        def body(carry, micro):
            bs, grad_acc, loss_acc = carry
            (loss, (metrics, new_bs)), grads = self._loss_and_grads(
                state.params, bs, micro)
            grad_acc = jax.tree.map(jnp.add, grad_acc, grads)
            return (new_bs, grad_acc, loss_acc + loss), metrics

        zero_grads = jax.tree.map(jnp.zeros_like, state.params)
        (new_bs, grads, loss_sum), metrics_stack = jax.lax.scan(
            body, (state.batch_stats, zero_grads, 0.0), batches)
        grads = jax.tree.map(lambda g: g / k, grads)
        loss = loss_sum / k
        metrics = {key: jnp.mean(v) for key, v in metrics_stack.items()}
        return self._apply_grads(state, loss, metrics, new_bs, grads)

    @functools.partial(jax.jit, static_argnums=(0, 3))
    def eval_step(self, state: TrainState, batch: dict, use_ema: bool = False):
        """Test-mode forward + metrics; use_ema serves the EMA weights
        (the reference evaluates its `{step}_ema.pt` checkpoints,
        scripts/train.py:424-426,457-508)."""
        params = state.params
        if use_ema and state.ema_params is not None:
            params = state.ema_params
        disp = self.model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            batch["left"], batch["right"],
            iters=self.model_cfg.valid_iters, test_mode=True, train=False)
        return disp, L.compute_stereo_metrics(disp, batch["disparity"], batch["mask"])


def optax_global_norm(tree) -> jnp.ndarray:
    leaves = jax.tree.leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32))) for x in leaves))
