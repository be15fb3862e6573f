"""Model export — the reference's ONNX route (scripts/make_onnx.py) re-done
the XLA way.

The reference exports a fixed-iters wrapper to ONNX opset 16 for TensorRT.
The portable interchange format for a JAX model is StableHLO: we lower the
fixed-configuration forward with ``jax.jit(...).lower()`` and serialize the
portable bytecode artifact, which any StableHLO consumer (IREE, TF, XLA
AOT) can ingest. Optionally also saves the params via orbax.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def export_stablehlo(model, variables, height: int, width: int, iters: int,
                     out_path: str | Path, batch: int = 1) -> dict:
    """Lower the test-mode forward at a fixed shape and save StableHLO.

    Returns a small manifest dict (also written next to the artifact).
    """
    import jax
    import jax.numpy as jnp

    left = jnp.zeros((batch, height, width, 3), jnp.float32)
    right = jnp.zeros((batch, height, width, 3), jnp.float32)

    def fwd(variables, left, right):
        return model.apply(variables, left, right, iters=iters, test_mode=True)

    lowered = jax.jit(fwd).lower(variables, left, right)
    bytecode = lowered.compiler_ir("stablehlo")
    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)

    # Serialize portable artifact via jax.export when available.
    try:
        from jax import export as jax_export

        exported = jax_export.export(jax.jit(fwd))(variables, left, right)
        data = exported.serialize()
        out_path.write_bytes(data)
        fmt = "jax.export serialized StableHLO"
    except Exception:  # noqa: BLE001 — fall back to textual MLIR
        out_path.write_text(str(bytecode))
        fmt = "StableHLO MLIR text"

    manifest = {
        "format": fmt,
        "input_shapes": {"left": [batch, height, width, 3],
                         "right": [batch, height, width, 3]},
        "output": f"disparity ({batch}, {height}, {width})",
        "iters": iters,
    }
    import json
    Path(str(out_path) + ".json").write_text(json.dumps(manifest, indent=2))
    return manifest


def load_exported(path: str | Path):
    """Deserialize a jax.export artifact and return a callable."""
    from jax import export as jax_export

    exported = jax_export.deserialize(Path(path).read_bytes())
    return exported.call
