"""One-call model loading — the HF-hub `from_pretrained` ergonomic.

The reference model is a ``PyTorchModelHubMixin``
(/root/reference/core/foundation_stereo.py:127), so users write
``FoundationStereo.from_pretrained(dir)`` and get a ready model. Flax
modules are stateless, so the TPU-native equivalent returns the triple the
rest of this framework works with::

    model, variables, cfg = from_pretrained("path/to/ckpt_dir")
    disp = model.apply(variables, left, right, iters=32, test_mode=True)

Accepted sources (auto-detected):

* an **orbax checkpoint directory** written by this framework's trainer or
  :func:`save_pretrained` (per-step subdirs + ``config.json``) — restored
  via ``CheckpointManager.restore_inference`` (EMA weights with ``ema=True``,
  the reference's ``{step}_ema.pt`` analog);
* a **reference torch checkpoint** ``.pth``/``.pt`` file (the
  ``{'model': state_dict, ...}`` layout of scripts/run_demo.py:123-125),
  converted through :mod:`foundationstereo_tpu.convert.torch_import`; the
  model config is read from a sibling ``cfg.yaml`` (the reference stores it
  next to the weights, scripts/run_demo.py:111-117) or from ``config.json``.
"""

from __future__ import annotations

import json
from pathlib import Path

__all__ = ["from_pretrained", "save_pretrained"]


def _load_sibling_config(path: Path, overrides: dict) -> "ModelConfig":
    from foundationstereo_tpu.config import ModelConfig

    cfg_dict: dict = {}
    yaml_path = path / "cfg.yaml"
    json_path = path / "config.json"
    if yaml_path.exists():
        import yaml

        raw = yaml.safe_load(yaml_path.read_text()) or {}
        cfg_dict = raw.get("model", raw)
    elif json_path.exists():
        raw = json.loads(json_path.read_text())
        cfg_dict = raw.get("model", raw)
    cfg_dict = dict(cfg_dict)
    cfg_dict.update(overrides)
    return ModelConfig.from_dict(cfg_dict)


def _init_variables(model, cfg, seed: int = 0):
    """Abstractly initialize a parameter tree (no FLOPs — eval_shape +
    concrete init only of the RNG-shaped leaves via jit on CPU-sized input)."""
    import jax
    import jax.numpy as jnp

    h, w = 64, 96
    left = jnp.zeros((1, h, w, 3), jnp.float32)
    init = jax.jit(lambda k, l, r: model.init(k, l, r, iters=1, test_mode=True))
    return init(jax.random.PRNGKey(seed), left, left)


def from_pretrained(path: str | Path, *, ema: bool = False,
                    step: int | str = "latest", seed: int = 0, **overrides):
    """Load a ready-to-apply model from `path`.

    Returns ``(model, variables, cfg)``. ``overrides`` are ModelConfig
    fields overlaid on the stored config (the reference overlays CLI args on
    cfg.yaml the same way, scripts/run_demo.py:111-117).
    """
    from foundationstereo_tpu.models.foundation_stereo import FoundationStereo

    path = Path(path)
    if path.is_file() and path.suffix in (".pth", ".pt"):
        from foundationstereo_tpu.convert.torch_import import (
            import_reference_checkpoint,
            load_torch_state_dict,
        )

        cfg = _load_sibling_config(path.parent, overrides)
        model = FoundationStereo(cfg)
        variables = _init_variables(model, cfg, seed)
        state_dict = load_torch_state_dict(str(path))
        variables, report = import_reference_checkpoint(state_dict, variables, cfg)
        bad = (report["unmapped_flax"] + report["missing_torch"]
               + report["shape_mismatch"])
        if bad:
            raise ValueError(
                f"torch checkpoint import left {len(bad)} params unresolved "
                f"(first: {bad[:5]})")
        return model, variables, cfg

    if path.is_dir():
        from foundationstereo_tpu.train.checkpoints import CheckpointManager

        cfg = _load_sibling_config(path, overrides)
        model = FoundationStereo(cfg)
        mgr = CheckpointManager(path)
        try:
            variables, _ = mgr.restore_inference(step, use_ema=ema)
        finally:
            mgr.close()
        return model, variables, cfg

    raise FileNotFoundError(
        f"{path} is neither an orbax checkpoint directory nor a .pth/.pt file")


def save_pretrained(path: str | Path, variables, cfg, *, step: int = 0):
    """Write `variables` + config to `path` so :func:`from_pretrained`
    round-trips. Inference variables ({params, batch_stats}) and full
    TrainStates both work (restore_inference reads either)."""
    from foundationstereo_tpu.train.checkpoints import CheckpointManager

    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    state = dict(variables) if not isinstance(variables, dict) else variables
    mgr = CheckpointManager(path)
    try:
        import dataclasses

        cfg_dict = (dataclasses.asdict(cfg)
                    if dataclasses.is_dataclass(cfg) else dict(cfg))
        # json can't serialize tuples distinguishably; lists load back fine.
        mgr.save(step, state, config={"model": cfg_dict})
        mgr.wait()
    finally:
        mgr.close()
