"""Demo CLI: stereo pair -> disparity, depth, and point cloud.

TPU-native equivalent of scripts/run_demo.py with the same flag surface
(camera_type pinhole|panorama, --scale, --hiera, --valid_iters, --z_far,
point-cloud options) and K.txt formats. Checkpoints are orbax directories
saved by this framework (``--ckpt_dir``), or omit to run with randomly
initialized weights (smoke mode).
"""

from __future__ import annotations

import argparse
import datetime
import functools
import json
import logging
import os
import sys
from pathlib import Path

import numpy as np

logging.basicConfig(level=logging.INFO, format="%(message)s")


def load_image(path: str) -> np.ndarray:
    from PIL import Image

    img = np.asarray(Image.open(path))
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    if img.shape[2] == 4:
        img = img[:, :, :3]
    return img


def main(argv=None):
    code_dir = os.path.dirname(os.path.realpath(__file__))
    ap = argparse.ArgumentParser(description="FoundationStereo-TPU demo")
    ap.add_argument("--left_file", default=None, type=str)
    ap.add_argument("--right_file", default=None, type=str)
    ap.add_argument("--intrinsic_file", default=None, type=str,
                    help="3x3 K row-major + baseline (pinhole) or baseline-only (panorama)")
    ap.add_argument("--ckpt_dir", default=None, type=str,
                    help="orbax checkpoint dir (with config.json); random init if omitted")
    ap.add_argument("--out_dir", default=None, type=str)
    ap.add_argument("--camera_type", type=str, default="pinhole",
                    choices=["pinhole", "panorama"])
    ap.add_argument("--scale", default=1.0, type=float)
    ap.add_argument("--hiera", default=0, type=int)
    ap.add_argument("--z_far", default=10.0, type=float)
    ap.add_argument("--valid_iters", type=int, default=32)
    ap.add_argument("--get_pc", type=int, default=1)
    ap.add_argument("--remove_invisible", default=1, type=int)
    ap.add_argument("--denoise_cloud", type=int, default=1)
    ap.add_argument("--denoise_nb_points", type=int, default=30)
    ap.add_argument("--denoise_radius", type=float, default=0.03)
    ap.add_argument("--vit_size", type=str, default=None)
    ap.add_argument("--max_disp", type=int, default=None)
    ap.add_argument("--ema", type=int, default=0,
                    help="serve the checkpoint's EMA weights instead of raw params")
    args = ap.parse_args(argv)

    # Default assets: repo-local assets/ first, the mounted reference's
    # assets as a fallback for this environment.
    # code_dir = <repo>/foundationstereo_tpu/inference -> parents[1] = <repo>
    repo_assets = Path(code_dir).resolve().parents[1] / "assets"
    assets = repo_assets if repo_assets.is_dir() else Path("/root/reference/assets")
    if args.camera_type == "panorama":
        args.left_file = args.left_file or str(assets / "blender/up_erp.png")
        args.right_file = args.right_file or str(assets / "blender/down_erp.png")
        args.intrinsic_file = args.intrinsic_file or str(assets / "blender/K.txt")
    else:
        args.left_file = args.left_file or str(assets / "left.png")
        args.right_file = args.right_file or str(assets / "right.png")
        args.intrinsic_file = args.intrinsic_file or str(assets / "K.txt")
    if args.out_dir is None:
        stamp = datetime.datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
        args.out_dir = f"{code_dir}/../../test_outputs/{args.camera_type}_{stamp}"
    os.makedirs(args.out_dir, exist_ok=True)

    import jax
    import jax.numpy as jnp

    from foundationstereo_tpu.config import ModelConfig
    from foundationstereo_tpu.inference.geometry3d import (
        depth2xyzmap,
        depth_from_disparity,
        erp_pointcloud,
        radius_outlier_removal,
        read_intrinsics,
        remove_invisible,
        write_ply,
    )
    from foundationstereo_tpu.inference.hierarchical import run_hierarchical
    from foundationstereo_tpu.models.foundation_stereo import FoundationStereo
    from foundationstereo_tpu.ops.pad import InputPadder
    from foundationstereo_tpu.utils.vis import vis_disparity

    # Config + weights.
    overrides = {}
    if args.vit_size:
        overrides["vit_size"] = args.vit_size
    if args.max_disp:
        overrides["max_disp"] = args.max_disp
    if args.ckpt_dir:
        cfg_path = Path(args.ckpt_dir) / "config.json"
        cfg_dict = json.loads(cfg_path.read_text()).get("model", {}) if cfg_path.exists() else {}
        cfg_dict.update(overrides)
        cfg = ModelConfig.from_dict(cfg_dict)
    else:
        cfg = ModelConfig.from_dict({"vit_size": "vits", "max_disp": 192, **overrides})

    img0 = load_image(args.left_file)
    img1 = load_image(args.right_file)
    if args.scale != 1.0:
        assert args.scale <= 1, "scale must be <=1"
        from foundationstereo_tpu.ops.resize import resize2d
        h, w = img0.shape[:2]
        nh, nw = int(h * args.scale), int(w * args.scale)
        img0 = np.asarray(resize2d(jnp.asarray(img0[None], jnp.float32),
                                   (nh, nw), "bilinear")[0]).astype(np.uint8)
        img1 = np.asarray(resize2d(jnp.asarray(img1[None], jnp.float32),
                                   (nh, nw), "bilinear")[0]).astype(np.uint8)
    H, W = img0.shape[:2]
    img0_ori = img0.copy()
    logging.info(f"img0: {img0.shape}")

    left = jnp.asarray(img0[None].astype(np.float32))
    right = jnp.asarray(img1[None].astype(np.float32))

    model = FoundationStereo(cfg)
    if args.ckpt_dir:
        from foundationstereo_tpu.train.checkpoints import CheckpointManager
        mgr = CheckpointManager(args.ckpt_dir)
        variables, step = mgr.restore_inference("latest", use_ema=bool(args.ema))
        logging.info(f"restored checkpoint step {step} from {args.ckpt_dir}"
                     f"{' (EMA weights)' if args.ema else ''}")
    else:
        padder0 = InputPadder(left.shape, divis_by=32)
        l0, r0 = padder0.pad(left, right)
        # Jit the init: eager flax init dispatches hundreds of tiny ops —
        # tens of minutes over the tunnelled TPU runtime. Images are jit
        # arguments, not closures (closed-over arrays constant-fold at
        # compile time — ADVICE r3).
        variables = jax.jit(
            lambda k, l, r: model.init(k, l, r, iters=1, test_mode=True)
        )(jax.random.PRNGKey(0), l0, r0)
        logging.info("no --ckpt_dir given: using randomly initialized weights")

    # `variables` is a jit ARGUMENT, not a closure: closed-over trees bake
    # into the executable as compile-time constants (ADVICE r3 pattern).
    @functools.partial(jax.jit, static_argnums=(3,))
    def _fwd(v, l, r, iters, init_disp):
        return model.apply(v, l, r, iters=iters, test_mode=True,
                           init_disp=init_disp)

    def apply_fn(l, r, iters=args.valid_iters, init_disp=None):
        return _fwd(variables, l, r, iters, init_disp)

    if not args.hiera:
        padder = InputPadder(left.shape, divis_by=32)
        lp, rp = padder.pad(left, right)
        disp = apply_fn(lp, rp)
        disp = padder.unpad(disp[..., None])[..., 0]
    else:
        disp = run_hierarchical(apply_fn, left, right, iters=args.valid_iters,
                                small_ratio=0.5)
    disp = np.asarray(disp).reshape(H, W)

    from PIL import Image
    vis = vis_disparity(disp)
    Image.fromarray(np.concatenate([img0_ori, vis], axis=1)).save(
        f"{args.out_dir}/vis.png")
    logging.info(f"Output saved to {args.out_dir}")

    if args.remove_invisible:
        disp = remove_invisible(disp)

    if not args.get_pc:
        return

    if args.camera_type == "panorama":
        lines = Path(args.intrinsic_file).read_text().splitlines()
        baseline = float(lines[1])
        points = erp_pointcloud(disp, baseline)
        invalid = ~np.isfinite(points).all(axis=-1) | np.isinf(disp)
    else:
        K, baseline = read_intrinsics(args.intrinsic_file)
        K = K.copy()
        K[:2] *= args.scale
        depth = depth_from_disparity(disp, K, baseline)
        points = depth2xyzmap(depth, K)
        invalid = np.isinf(disp)
        np.save(f"{args.out_dir}/depth_meter.npy", depth)

    pts = points[~invalid].astype(np.float64)
    cols = img0_ori[~invalid]
    if args.camera_type == "pinhole":
        keep = (pts[:, 2] > 0) & (pts[:, 2] <= args.z_far)
        pts, cols = pts[keep], cols[keep]
    write_ply(f"{args.out_dir}/cloud.ply", pts, cols)
    logging.info(f"Point cloud saved to {args.out_dir}/cloud.ply")

    if args.denoise_cloud and len(pts):
        keep = radius_outlier_removal(pts, args.denoise_nb_points, args.denoise_radius)
        write_ply(f"{args.out_dir}/cloud_denoise.ply", pts[keep], cols[keep])
        logging.info(f"Denoised point cloud saved to {args.out_dir}/cloud_denoise.ply")


if __name__ == "__main__":
    main()
