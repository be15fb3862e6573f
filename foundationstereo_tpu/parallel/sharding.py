"""Sharding annotations and placement helpers.

In-model calls go through :func:`shard_spatial` / :func:`shard_batch`, which
are no-ops unless a mesh is active (so the same model code runs single-chip
and distributed). Under an active mesh they emit
``jax.lax.with_sharding_constraint`` hints; GSPMD then partitions the
surrounding convolutions/matmuls and inserts halo exchanges and collectives
over ICI — the TPU-native replacement for the reference's hand-rolled DDP
(scripts/train.py:135-141).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from foundationstereo_tpu.parallel.mesh import current_mesh


def _named(mesh: Mesh, spec: P) -> NamedSharding:
    return NamedSharding(mesh, spec)


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard axis 0 over 'data', replicate the rest."""
    return _named(mesh, P("data", *([None] * (ndim - 1))))


def replicate(mesh: Mesh) -> NamedSharding:
    return _named(mesh, P())


def shard_batch(x, mesh: Optional[Mesh] = None):
    """Constrain a (B, ...) tensor to batch sharding (no-op without a mesh)."""
    mesh = mesh or current_mesh()
    if mesh is None or "data" not in mesh.axis_names:
        return x
    if x.shape[0] % mesh.shape["data"] != 0:
        return x
    return jax.lax.with_sharding_constraint(x, batch_sharding(mesh, x.ndim))


def shard_spatial(x, w_axis: int, mesh: Optional[Mesh] = None):
    """Constrain a tensor's width axis over 'spatial' (+ batch over 'data').

    Used on the unary features and the (B, D, H, W, C) cost volume so the
    3D filtering partitions along image width across chips.
    """
    mesh = mesh or current_mesh()
    if mesh is None or "spatial" not in mesh.axis_names:
        return x
    if mesh.shape["spatial"] == 1 or x.shape[w_axis] % mesh.shape["spatial"] != 0:
        return shard_batch(x, mesh)
    spec = [None] * x.ndim
    if ("data" in mesh.axis_names and x.shape[0] % mesh.shape["data"] == 0):
        spec[0] = "data"
    spec[w_axis] = "spatial"
    return jax.lax.with_sharding_constraint(x, _named(mesh, P(*spec)))


def place_batch(batch: dict, mesh: Mesh) -> dict:
    """Device_put a host batch with axis-0 'data' sharding."""
    out = {}
    for k, v in batch.items():
        if hasattr(v, "ndim") and v.ndim >= 1 and v.shape[0] % mesh.shape["data"] == 0:
            out[k] = jax.device_put(v, batch_sharding(mesh, v.ndim))
        else:
            out[k] = jax.device_put(v, replicate(mesh))
    return out
