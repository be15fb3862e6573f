"""Device mesh management.

One global mesh with named axes replaces the reference's NCCL/DDP process
groups (SURVEY §2.5, §5.8):

* ``data``    — batch parallelism (gradient psum inserted by GSPMD);
* ``spatial`` — image-width sharding of features and the cost volume; XLA
  partitions the 2D/3D convolutions spatially and inserts halo exchanges
  over ICI automatically.

On a multi-host slice, keep ``spatial`` within a host's ICI domain and let
``data`` cross hosts (DCN) — arrange via the device order passed to
:func:`make_mesh`.
"""

from __future__ import annotations

import contextlib
import contextvars
import math
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

_ACTIVE_MESH: contextvars.ContextVar[Optional[Mesh]] = contextvars.ContextVar(
    "fstpu_mesh", default=None)


def make_mesh(n_devices: int | None = None,
              axis_names: Sequence[str] = ("data", "spatial"),
              shape: Sequence[int] | None = None,
              devices=None) -> Mesh:
    """Build a Mesh over the first ``n_devices`` devices.

    If ``shape`` is not given, the device count is factored so that
    ``spatial`` gets the largest power-of-two factor <= 4 and ``data`` the
    rest (spatial halo traffic is neighbor-only and cheap on ICI; batch
    gradients are the all-reduce-heavy axis).
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if shape is None:
        if len(axis_names) == 1:
            shape = (n,)
        else:
            spatial = 1
            while spatial < 4 and n % (spatial * 2) == 0:
                spatial *= 2
            shape = (n // spatial, spatial) + (1,) * (len(axis_names) - 2)
    assert math.prod(shape) == n, f"shape {shape} != {n} devices"
    arr = np.array(devices).reshape(shape)
    return Mesh(arr, tuple(axis_names))


def current_mesh() -> Optional[Mesh]:
    return _ACTIVE_MESH.get()


@contextlib.contextmanager
def mesh_context(mesh: Optional[Mesh]):
    """Make ``mesh`` visible to in-model sharding annotations."""
    token = _ACTIVE_MESH.set(mesh)
    try:
        yield mesh
    finally:
        _ACTIVE_MESH.reset(token)
