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
                     out_path: str | Path, batch: int = 1,
                     dynamic_batch: bool = False) -> dict:
    """Lower the test-mode forward at a fixed shape and save StableHLO.

    ``dynamic_batch=True`` exports with a SYMBOLIC batch dimension via
    jax.export shape polymorphism — the analog of the reference's ONNX
    ``dynamic_axes={'left': {0: 'batch'}, ...}`` (scripts/make_onnx.py:60):
    one artifact serves any batch size. H/W/iters stay static (the cost
    volume, scan length, and Pallas kernel grids are shape-specialized by
    design — the reference's ONNX export also freezes them).

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

        if dynamic_batch:
            spec = jax_export.symbolic_shape(f"b, {height}, {width}, 3")
            img = jax.ShapeDtypeStruct(spec, jnp.float32)
            exported = jax_export.export(jax.jit(fwd))(variables, img, img)
        else:
            exported = jax_export.export(jax.jit(fwd))(variables, left, right)
        data = exported.serialize()
        out_path.write_bytes(data)
        fmt = "jax.export serialized StableHLO"
    except Exception:  # noqa: BLE001 — fall back to textual MLIR
        if dynamic_batch:
            raise  # a silent static fallback would belie the manifest
        out_path.write_text(str(bytecode))
        fmt = "StableHLO MLIR text"

    bdim = "b (symbolic)" if dynamic_batch else batch
    manifest = {
        "format": fmt,
        "input_shapes": {"left": [bdim, height, width, 3],
                         "right": [bdim, height, width, 3]},
        "output": f"disparity ({bdim}, {height}, {width})",
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
