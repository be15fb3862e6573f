#!/usr/bin/env python
"""Training CLI.

TPU-native counterpart of the reference's scripts/train.py: JSON config with
model/data/loss/optimizer/lr_scheduler sections, checkpoint resume (path |
"latest" | step number), periodic async checkpoints, metric logging (JSONL +
optional MLflow), EMA, and mesh-sharded data parallelism — but the entire
step (forward/loss/backward/update/EMA) is one compiled XLA program and the
data pipeline prefetches on host threads.

Usage:
  python scripts/train.py --config configs/train/stereo_v1.json \
      --workspace workspace/run1 [--num_iterations N] [--batch_size B] \
      [--checkpoint latest] [--n_devices N]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--workspace", default="workspace/run")
    ap.add_argument("--num_iterations", type=int, default=200_000)
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument("--gradient_accumulation_steps", type=int, default=1)
    ap.add_argument("--checkpoint", default="latest",
                    help="'latest', a step number, or 'none'")
    ap.add_argument("--save_every", type=int, default=1000)
    ap.add_argument("--log_every", type=int, default=50)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--ema", type=int, default=1)
    ap.add_argument("--n_devices", type=int, default=0,
                    help="0 = all local devices")
    ap.add_argument("--mlflow", type=int, default=0)
    ap.add_argument("--vis_every", type=int, default=0,
                    help="dump left|GT|prediction panels every N steps")
    ap.add_argument("--profile_steps", type=str, default="",
                    help="'start,stop' step range to capture a jax.profiler trace")
    ap.add_argument("--override", action="append", default=[],
                    help="dot-path config override, e.g. model.vit_size=vits "
                         "or data.datasets.0.path=/tmp/data (JSON values)")
    args = ap.parse_args()

    config = json.loads(Path(args.config).read_text())
    for ov in args.override:
        path, _, raw = ov.partition("=")
        try:
            value = json.loads(raw)
        except json.JSONDecodeError:
            value = raw
        node = config
        keys = path.split(".")
        for k in keys[:-1]:
            node = node[int(k)] if isinstance(node, list) else node[k]
        last = keys[-1]
        if isinstance(node, list):
            node[int(last)] = value
        else:
            node[last] = value
    workspace = Path(args.workspace)
    workspace.mkdir(parents=True, exist_ok=True)
    (workspace / "config.json").write_text(json.dumps(config, indent=2))

    import jax

    from foundationstereo_tpu.parallel import make_mesh, mesh_context
    from foundationstereo_tpu.parallel.sharding import place_batch, replicate
    from foundationstereo_tpu.train.checkpoints import CheckpointManager
    from foundationstereo_tpu.train.dataloader import StereoTrainDataLoaderPipeline
    from foundationstereo_tpu.train.trainer import Trainer, make_label_index
    from foundationstereo_tpu.utils.misc import set_seed

    set_seed(args.seed)
    n_dev = args.n_devices or len(jax.devices())
    mesh = make_mesh(n_dev)
    print(f"mesh: {dict(mesh.shape)}", flush=True)

    mlflow = None
    if args.mlflow:
        try:
            import mlflow as _mlflow
            mlflow = _mlflow
            mlflow.start_run()
            mlflow.log_params({f"model.{k}": v for k, v in config["model"].items()})
        except Exception as e:  # noqa: BLE001 — soft-fail like the reference
            print(f"mlflow disabled: {e}")

    data_pipe = StereoTrainDataLoaderPipeline(
        config["data"], args.batch_size, num_load_workers=4)
    data_pipe.start()

    def to_device_batch(raw):
        from foundationstereo_tpu.ops.pad import InputPadder
        left = (raw["left_image"] * np.float32(255.0)).astype(np.float32)
        right = (raw["right_image"] * np.float32(255.0)).astype(np.float32)
        padder = InputPadder(left.shape, divis_by=32)
        # Pad on the HOST: routing through jnp here moved each batch across
        # the tunnel three times (pad on device, np.asarray pull-back,
        # place_batch re-upload) — a blocking round-trip pair inside t_data
        # (round-4 phase split: t_data 2.4 s/step vs 1.9 s device step).
        l, r_, t, b = padder.pads
        left, right = padder.pad_np(left, right)
        h, w = left.shape[1], left.shape[2]
        gt = np.zeros((left.shape[0], h, w), np.float32)
        m = np.zeros((left.shape[0], h, w), bool)
        gt[:, t:t + raw["disparity"].shape[1], l:l + raw["disparity"].shape[2]] = raw["disparity"]
        m[:, t:t + raw["disparity"].shape[1], l:l + raw["disparity"].shape[2]] = raw["disparity_mask"]
        batch = {
            "left": left, "right": right,
            "disparity": gt, "mask": m,
            "label_idx": make_label_index(raw["label_type"], config["loss"]),
            "rng": np.random.randint(0, 2 ** 31, size=2).astype(np.uint32),
        }
        return place_batch(batch, mesh)

    with mesh_context(mesh):
        trainer = Trainer(config, seed=args.seed, enable_ema=bool(args.ema))
        first = to_device_batch(data_pipe.get())
        state = trainer.init_state(first)
        state = jax.device_put(state, replicate(mesh))

        ckpt = CheckpointManager(workspace / "checkpoints", max_to_keep=5)
        initial_step = 0
        if args.checkpoint != "none":
            state, initial_step = ckpt.restore(
                args.checkpoint if args.checkpoint != "latest" else "latest", state)
            if initial_step:
                print(f"resumed from step {initial_step}", flush=True)

        metrics_log = open(workspace / "metrics.jsonl", "a")
        records = []
        t_last = time.time()
        batch = first
        prof_range = ([int(x) for x in args.profile_steps.split(",")]
                      if args.profile_steps else None)
        for step in range(initial_step, args.num_iterations):
            if prof_range and step == prof_range[0]:
                jax.profiler.start_trace(str(workspace / "profile"))
            t0 = time.perf_counter()
            if args.gradient_accumulation_steps > 1:
                micros = [batch]
                for _ in range(args.gradient_accumulation_steps - 1):
                    micros.append(to_device_batch(data_pipe.get()))
                import jax.numpy as jnp
                stacked = {k: jnp.stack([m[k] for m in micros])
                           for k in micros[0]}
                state, metrics = trainer.train_step_accum(state, stacked)
            else:
                state, metrics = trainer.train_step(state, batch)
            t_dispatch = time.perf_counter() - t0
            last_batch = batch
            t0 = time.perf_counter()
            raw = data_pipe.get()
            t_get = time.perf_counter() - t0
            t0 = time.perf_counter()
            batch = to_device_batch(raw)
            t_data = time.perf_counter() - t0
            # ONE batched device fetch (async-copy all leaves, then gather):
            # a float() per metric is a separate round-trip each — ~15 of
            # them per step cost several hundred ms over the tunnelled
            # runtime (round-4 finding: device step 0.818 s vs CLI 1.37 s).
            t0 = time.perf_counter()
            host_metrics = jax.device_get(metrics)
            t_fence = time.perf_counter() - t0
            rec = {k: float(v) for k, v in host_metrics.items()}
            rec["t_dispatch"] = t_dispatch
            rec["t_get"] = t_get
            rec["t_data"] = t_data
            rec["t_fence"] = t_fence
            records.append(rec)
            if prof_range and step == prof_range[1]:
                jax.profiler.stop_trace()
                print(f"profile trace written to {workspace / 'profile'}", flush=True)

            if args.vis_every and step % args.vis_every == 0:
                try:
                    from PIL import Image
                    from foundationstereo_tpu.utils.vis import vis_disparity
                    disp, _ = trainer.eval_step(state, last_batch)
                    disp = np.asarray(disp[0])
                    left_img = np.asarray(last_batch["left"][0]).astype(np.uint8)
                    gt_vis = vis_disparity(np.asarray(last_batch["disparity"][0]))
                    pred_vis = vis_disparity(disp)
                    panel = np.concatenate([left_img, gt_vis, pred_vis], axis=1)
                    vis_dir = workspace / "vis"
                    vis_dir.mkdir(exist_ok=True)
                    Image.fromarray(panel).save(vis_dir / f"{step:08d}.png")
                except Exception as e:  # noqa: BLE001 — vis must not kill training
                    print(f"vis failed: {e}", flush=True)

            if step % args.log_every == 0 or step == initial_step:
                avg = {k: float(np.mean([r[k] for r in records if k in r]))
                       for k in records[-1]}
                dt = time.time() - t_last
                ips = len(records) / max(dt, 1e-9)
                line = {"step": step, "it_per_s": round(ips, 3), **avg}
                print(json.dumps({k: round(v, 5) if isinstance(v, float) else v
                                  for k, v in line.items()}), flush=True)
                metrics_log.write(json.dumps(line) + "\n")
                metrics_log.flush()
                if mlflow:
                    try:
                        mlflow.log_metrics(avg, step=step)
                    except Exception as e:  # noqa: BLE001
                        print(f"mlflow error: {e}")
                records, t_last = [], time.time()

            if step % args.save_every == 0 and step > initial_step:
                ckpt.save(step, state, config=config)

        ckpt.save(args.num_iterations, state, config=config)
        ckpt.wait()
    data_pipe.stop()
    print("training done", flush=True)


if __name__ == "__main__":
    main()
