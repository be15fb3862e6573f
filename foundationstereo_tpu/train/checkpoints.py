"""Checkpoint save/restore (orbax) — the reference's .pt family analog.

The reference writes {step}.pt / {step}_optimizer.pt / {step}_ema.pt /
latest.pt asynchronously on rank 0 with a retry loop
(scripts/train.py:457-508) and resumes from a path, "latest", or a bare step
number (:192-255). Here a single orbax CheckpointManager provides async,
atomic, sharded-aware saves with step tracking and `latest_step()` —
fault-tolerant by construction.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str | Path, max_to_keep: int = 5,
                 save_interval_steps: int = 1):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            save_interval_steps=save_interval_steps,
            enable_async_checkpointing=True,
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: Any, config: dict | None = None):
        """Async save; `state` is any pytree (TrainState works directly)."""
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        if config is not None:
            cfg_path = self.directory / "config.json"
            if not cfg_path.exists():
                cfg_path.write_text(json.dumps(config, indent=2))

    def restore(self, step: int | str | None, target: Any) -> tuple[Any, int]:
        """Restore `target`-structured state from `step` (int, "latest", None)."""
        if step in (None, "latest"):
            step = self._mgr.latest_step()
            if step is None:
                return target, 0
        state = self._mgr.restore(int(step), args=ocp.args.StandardRestore(target))
        return state, int(step)

    def restore_inference(self, step: int | str | None = "latest",
                          use_ema: bool = False) -> tuple[dict, int]:
        """Restore inference variables {params, batch_stats} from a saved
        TrainState without needing a structure-matched target (orbax requires
        exact tree matches otherwise). With ``use_ema`` the EMA weights are
        served instead of the raw params — the reference's `{step}_ema.pt`
        evaluation path (scripts/train.py:424-426,457-508)."""
        if step in (None, "latest"):
            step = self._mgr.latest_step()
            if step is None:
                raise FileNotFoundError(f"no checkpoint in {self.directory}")
        raw = self._mgr.restore(int(step))
        params = raw.get("params")
        if use_ema:
            ema = raw.get("ema_params")
            if ema is None:
                raise ValueError("checkpoint has no EMA weights (trained with --ema 0)")
            params = ema
        return ({"params": params, "batch_stats": raw.get("batch_stats") or {}},
                int(step))

    def latest_step(self):
        return self._mgr.latest_step()

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()
