"""Training losses and stereo metrics (JAX, batched).

Re-implements the reference loss registry (train/losses.py) with the same
math but batched semantics: every function takes (B, H, W) predictions /
ground truth / masks and returns per-sample ``(B,)`` losses plus a dict of
per-sample metric arrays. The reference computes these per instance in a
Python loop (scripts/train.py:374-387); on TPU we keep the whole batch on
device and weight per-sample losses by the config's per-label-type weights.

Naming note: the reference's ``d1_error`` is the >3px rate and ``d3_error``
the >1px rate (train/losses.py:66-67 — swapped vs convention). We expose both
that legacy naming and conventional ``bp1/bp2/bp3`` keys.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from foundationstereo_tpu.ops.resize import resize2d


def _smooth_l1(x: jnp.ndarray, y: jnp.ndarray, beta: float = 1.0) -> jnp.ndarray:
    diff = jnp.abs(x - y)
    if beta == 0:
        return diff
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Per-sample masked mean over (H, W): (B,H,W) -> (B,)."""
    m = mask.astype(x.dtype)
    count = jnp.sum(m, axis=(1, 2))
    total = jnp.sum(x * m, axis=(1, 2))
    return jnp.where(count > 0, total / jnp.maximum(count, 1.0), 0.0)


def _resize_pred(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Bilinear-resize (B,h,w) prediction to gt's (H,W) (align_corners=False),
    matching the reference's resolution-mismatch handling (losses.py:36-53)."""
    if pred.shape[1:] != gt.shape[1:]:
        pred = resize2d(pred[..., None], gt.shape[1:3], "bilinear", False)[..., 0]
    return pred


def _error_metrics(pred, gt, mask, prefix=""):
    diff = jnp.abs(pred - gt)
    return {
        prefix + "epe": _masked_mean(diff, mask),
        prefix + "bp1": _masked_mean((diff > 1.0).astype(jnp.float32), mask),
        prefix + "bp2": _masked_mean((diff > 2.0).astype(jnp.float32), mask),
        prefix + "bp3": _masked_mean((diff > 3.0).astype(jnp.float32), mask),
        # legacy reference names (swapped):
        prefix + "d1_error": _masked_mean((diff > 3.0).astype(jnp.float32), mask),
        prefix + "d3_error": _masked_mean((diff > 1.0).astype(jnp.float32), mask),
    }


def disparity_l1_loss(pred, gt, mask, max_disparity: float = 192.0, **_):
    pred = _resize_pred(pred, gt)
    pred = jnp.clip(pred, 0.0, max_disparity)
    loss = _masked_mean(jnp.abs(pred - gt), mask)
    return loss, _error_metrics(pred, gt, mask)


def disparity_smooth_l1_loss(pred, gt, mask, beta: float = 1.0,
                             max_disparity: float = 192.0, **_):
    pred = _resize_pred(pred, gt)
    pred = jnp.clip(pred, 0.0, max_disparity)
    loss = _masked_mean(_smooth_l1(pred, gt, beta), mask)
    return loss, _error_metrics(pred, gt, mask)


def disparity_epe_loss(pred, gt, mask, max_disparity: float = 192.0, **_):
    pred = jnp.clip(pred, 0.0, max_disparity)
    loss = _masked_mean(jnp.abs(pred - gt), mask)
    return loss, _error_metrics(pred, gt, mask)


def gradient_loss(pred, gt, mask, **_):
    """Disparity-gradient matching loss (train/losses.py:287-323)."""
    pgx = jnp.abs(pred[:, :, 1:] - pred[:, :, :-1])
    pgy = jnp.abs(pred[:, 1:, :] - pred[:, :-1, :])
    ggx = jnp.abs(gt[:, :, 1:] - gt[:, :, :-1])
    ggy = jnp.abs(gt[:, 1:, :] - gt[:, :-1, :])
    mx = mask[:, :, 1:] & mask[:, :, :-1]
    my = mask[:, 1:, :] & mask[:, :-1, :]
    lx = _masked_mean(jnp.abs(pgx - ggx), mx)
    ly = _masked_mean(jnp.abs(pgy - ggy), my)
    loss = 0.5 * (lx + ly)
    return loss, {"gradient_loss_x": lx, "gradient_loss_y": ly}


def multi_scale_loss(pred_pyramid, gt, mask, weights=None, loss_type: str = "smooth_l1",
                     beta: float = 1.0, max_disparity: float = 192.0, **_):
    """Per-scale loss with nearest-downsampled, scale-adjusted GT
    (train/losses.py:190-284)."""
    if weights is None:
        weights = [1.0] * len(pred_pyramid)
    total = 0.0
    metrics = {"multi_scale_epe": 0.0}
    for pred, w in zip(pred_pyramid, weights):
        scale = pred.shape[-1] / gt.shape[-1]
        if scale != 1.0:
            gt_s = resize2d(gt[..., None], pred.shape[1:3], "nearest")[..., 0] * scale
            m_s = resize2d(mask[..., None].astype(jnp.float32), pred.shape[1:3],
                           "nearest")[..., 0] > 0.5
        else:
            gt_s, m_s = gt, mask
        pred = jnp.clip(pred, 0.0, max_disparity * scale)
        if loss_type in ("l1", "epe"):
            per = jnp.abs(pred - gt_s)
        elif loss_type == "smooth_l1":
            per = _smooth_l1(pred, gt_s, beta)
        else:
            raise ValueError(loss_type)
        total = total + w * _masked_mean(per, m_s)
        metrics["multi_scale_epe"] = metrics["multi_scale_epe"] + (
            w * _masked_mean(jnp.abs(pred - gt_s), m_s))
    tw = sum(weights)
    metrics["multi_scale_epe"] = metrics["multi_scale_epe"] / tw
    return total, metrics


def foundation_stereo_loss(pred_initial, pred_pyramid, gt, mask, gamma: float = 0.9,
                           max_disparity: float = 192.0, **_):
    """Paper §3.4: L = smoothL1(d0) + sum_k gamma^(K-k) * L1(d_k)
    (train/losses.py:379-498). ``pred_initial`` should be the initial
    disparity upsampled to full resolution in full-res units (x4 of the 1/4-
    grid value — the scale handling the fork omits)."""
    init = _resize_pred(pred_initial, gt)
    init = jnp.clip(init, 0.0, max_disparity)
    loss = _masked_mean(_smooth_l1(init, gt, 1.0), mask)
    metrics = _error_metrics(init, gt, mask, prefix="initial_")
    K = len(pred_pyramid)
    for k, pred in enumerate(pred_pyramid):
        pred = _resize_pred(pred, gt)
        pred = jnp.clip(pred, 0.0, max_disparity)
        w = gamma ** (K - (k + 1))
        loss = loss + w * _masked_mean(jnp.abs(pred - gt), mask)
    metrics.update(_error_metrics(jnp.clip(_resize_pred(pred_pyramid[-1], gt), 0, max_disparity),
                                  gt, mask, prefix="final_"))
    return loss, metrics


LOSS_REGISTRY: dict[str, Callable] = {
    "disparity_l1_loss": disparity_l1_loss,
    "disparity_smooth_l1_loss": disparity_smooth_l1_loss,
    "disparity_epe_loss": disparity_epe_loss,
    "multi_scale_loss": multi_scale_loss,
    "gradient_loss": gradient_loss,
    "foundation_stereo_loss": foundation_stereo_loss,
}


def compute_stereo_metrics(pred, gt, mask, thresholds=(1.0, 3.0, 5.0)):
    """Standalone metric pack (train/losses.py:342-376), batched."""
    diff = jnp.abs(pred - gt)
    out = {
        "epe": _masked_mean(diff, mask),
        "rmse": jnp.sqrt(_masked_mean(diff * diff, mask)),
    }
    for t in thresholds:
        out[f"d{int(t)}_error"] = _masked_mean((diff > t).astype(jnp.float32), mask)
    return out
