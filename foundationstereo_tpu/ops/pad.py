"""Input padding to divisibility constraints (reference core/utils/utils.py:17-41).

Channel-last (NHWC) variant of the reference's ``InputPadder``: replicate-pad
H and W to multiples of ``divis_by`` with centered ("sintel") placement.
"""

from __future__ import annotations

import jax.numpy as jnp


class InputPadder:
    def __init__(self, dims, mode: str = "sintel", divis_by: int = 8, force_square: bool = False):
        # dims: any shape tuple whose (-3, -2) axes are (H, W) for NHWC inputs,
        # or pass (H, W) directly.
        if len(dims) >= 3:
            self.ht, self.wd = dims[-3], dims[-2]
        else:
            self.ht, self.wd = dims
        if force_square:
            max_side = max(self.ht, self.wd)
            pad_ht = ((max_side // divis_by) + 1) * divis_by - self.ht
            pad_wd = ((max_side // divis_by) + 1) * divis_by - self.wd
        else:
            pad_ht = (((self.ht // divis_by) + 1) * divis_by - self.ht) % divis_by
            pad_wd = (((self.wd // divis_by) + 1) * divis_by - self.wd) % divis_by
        if mode == "sintel":
            self._pad = [pad_wd // 2, pad_wd - pad_wd // 2, pad_ht // 2, pad_ht - pad_ht // 2]
        else:
            self._pad = [pad_wd // 2, pad_wd - pad_wd // 2, 0, pad_ht]

    @property
    def pad_left(self) -> int:
        """Horizontal left pad — needed to offset disparity in hierarchical mode."""
        return self._pad[0]

    @property
    def pads(self):
        """(left, right, top, bottom) pad amounts."""
        return tuple(self._pad)

    def padded_shape(self):
        l, r, t, b = self._pad
        return self.ht + t + b, self.wd + l + r

    def pad(self, *inputs):
        l, r, t, b = self._pad
        out = []
        for x in inputs:
            assert x.ndim == 4, "expected NHWC"
            out.append(jnp.pad(x, ((0, 0), (t, b), (l, r), (0, 0)), mode="edge"))
        return out if len(out) > 1 else out[0]

    def pad_np(self, *inputs):
        """Host-side (numpy) twin of :meth:`pad` — identical placement and
        edge mode, so the training host pad can never diverge from the
        device/inference pad path."""
        import numpy as np

        l, r, t, b = self._pad
        out = []
        for x in inputs:
            assert x.ndim == 4, "expected NHWC"
            out.append(np.pad(x, ((0, 0), (t, b), (l, r), (0, 0)), mode="edge"))
        return out if len(out) > 1 else out[0]

    def unpad(self, x):
        assert x.ndim == 4
        l, r, t, b = self._pad
        h, w = x.shape[-3], x.shape[-2]
        return x[:, t:h - b, l:w - r, :]
