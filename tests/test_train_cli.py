"""End-to-end training CLI smoke test (reference scripts/test_training.py
analog): synthetic dataset on disk -> scripts/train.py for a few steps ->
finite losses, checkpoint written, resume works."""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from foundationstereo_tpu.utils.misc import depth_uint8_encoding

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture
def train_setup(tmp_path, rng):
    data = tmp_path / "data"
    for sub in ("left/rgb", "right/rgb", "left/disparity"):
        (data / sub).mkdir(parents=True)
    for i in range(4):
        img = rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)
        Image.fromarray(img).save(data / "left/rgb" / f"{i}.jpg")
        Image.fromarray(np.roll(img, -2, 1)).save(data / "right/rgb" / f"{i}.jpg")
        disp = rng.uniform(1, 30, (64, 96)).astype(np.float32)
        Image.fromarray(depth_uint8_encoding(disp)).save(
            data / "left/disparity" / f"{i}.png")

    config = {
        "model": {"max_disp": 64, "vit_size": "vits", "mixed_precision": False,
                  "train_iters": 1, "valid_iters": 1},
        "data": {
            "datasets": [{"name": "syn", "path": str(data), "weight": 1.0,
                          "label_type": "stereo",
                          "image_augmentation": ["jittering"]}],
            "image_sizes": [[96, 64]],
            "max_disparity": 64,
            "image_augmentation": ["jittering"],
            "stereo_augmentation": True,
        },
        "loss": {
            "stereo": {"main": {"function": "foundation_stereo_loss", "weight": 1.0,
                                "params": {"gamma": 0.9, "max_disparity": 64.0}}},
            "invalid": {"dummy": {"function": "disparity_l1_loss", "weight": 0.0,
                                  "params": {"max_disparity": 64.0}}},
        },
        "optimizer": {"type": "AdamW", "params": [
            {"params": {"include": ["*"], "exclude": []}, "lr": 1e-4,
             "weight_decay": 1e-4}]},
        "lr_scheduler": {"type": "LambdaLR",
                         "params": {"lr_lambda": "Piecewise((1.0, epoch < 100), (0.1, True))"}},
    }
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps(config))
    return tmp_path, cfg_path


def _run_train(tmp_path, cfg_path, steps, ckpt="none"):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = str(REPO)
    return subprocess.run(
        [sys.executable, str(REPO / "scripts/train.py"),
         "--config", str(cfg_path), "--workspace", str(tmp_path / "ws"),
         "--num_iterations", str(steps), "--batch_size", "2",
         "--save_every", "2", "--log_every", "1", "--checkpoint", ckpt,
         "--n_devices", "2"],
        capture_output=True, text=True, timeout=1200, env=env)


@pytest.mark.slow
@pytest.mark.xdist_group("heavy_subprocess")
def test_one_program_per_image_size_bucket(train_setup):
    """Variable image_sizes must compile exactly one train_step program per
    /32-padded shape bucket (reference varies size per batch; we bucket —
    dataloader module docstring)."""
    tmp_path, cfg_path = train_setup
    cfg = json.loads(cfg_path.read_text())
    cfg["data"]["image_sizes"] = [[96, 64], [64, 96]]  # two buckets
    cfg2 = tmp_path / "config2.json"
    cfg2.write_text(json.dumps(cfg))

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = str(REPO)
    env["JAX_LOG_COMPILES"] = "1"
    res = subprocess.run(
        [sys.executable, str(REPO / "scripts/train.py"),
         "--config", str(cfg2), "--workspace", str(tmp_path / "ws_bucket"),
         "--num_iterations", "6", "--batch_size", "1",
         "--save_every", "1000", "--log_every", "1", "--checkpoint", "none",
         "--n_devices", "1", "--seed", "3"],
        capture_output=True, text=True, timeout=2400, env=env)
    assert res.returncode == 0, res.stderr[-3000:]
    lines = [json.loads(l) for l in res.stdout.splitlines()
             if l.startswith("{") and "step" in l]
    assert len(lines) >= 6
    # JAX emits each compile-log line through two handlers — dedup by the
    # argument-shape signature, which is what distinguishes real programs.
    import re

    shapes = set(re.findall(
        r"Compiling jit\(train_step\) with global shapes and types (.*?)\.",
        res.stderr))
    # Both sizes are sampled w.h.p. over 6+prefetch batches; the hard bound
    # is what matters: no per-batch recompiles beyond one per bucket.
    assert 1 <= len(shapes) <= 2, (shapes, res.stderr[-2000:])


@pytest.mark.slow
@pytest.mark.xdist_group("heavy_subprocess")
def test_train_cli_runs_and_resumes(train_setup):
    tmp_path, cfg_path = train_setup
    res = _run_train(tmp_path, cfg_path, steps=3)
    assert res.returncode == 0, res.stderr[-3000:]
    lines = [json.loads(l) for l in res.stdout.splitlines()
             if l.startswith("{") and "step" in l]
    assert lines and all(np.isfinite(l["loss"]) for l in lines)
    metrics_file = tmp_path / "ws" / "metrics.jsonl"
    assert metrics_file.exists()
    ckpts = tmp_path / "ws" / "checkpoints"
    assert any(ckpts.iterdir())

    # Resume from latest and run a couple more steps.
    res2 = _run_train(tmp_path, cfg_path, steps=5, ckpt="latest")
    assert res2.returncode == 0, res2.stderr[-3000:]
    assert "resumed from step" in res2.stdout


@pytest.mark.slow
@pytest.mark.xdist_group("heavy_subprocess")
def test_train_cli_mlflow_integration(train_setup, tmp_path):
    """--mlflow 1 logs params at start and metrics per log_every through the
    mlflow client API. The real package is not installed in this image
    (documented deviation), so a fake module on PYTHONPATH records the calls
    — proving the integration path the reference exercises against a live
    server (scripts/train.py:146-154 upstream)."""
    ws_path, cfg_path = train_setup
    fake_dir = tmp_path / "fake_pkgs"
    fake_dir.mkdir(exist_ok=True)
    calls = tmp_path / "mlflow_calls.jsonl"
    (fake_dir / "mlflow.py").write_text(f'''
import json
_LOG = r"{calls}"

def _rec(kind, payload):
    with open(_LOG, "a") as f:
        f.write(json.dumps({{"kind": kind, "payload": payload}}) + "\\n")

def start_run():
    _rec("start_run", None)

def log_params(params):
    _rec("log_params", {{k: str(v) for k, v in params.items()}})

def log_metrics(metrics, step=None):
    _rec("log_metrics", {{"step": step, "n": len(metrics)}})
''')
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = f"{fake_dir}{os.pathsep}{REPO}"
    res = subprocess.run(
        [sys.executable, str(REPO / "scripts/train.py"),
         "--config", str(cfg_path), "--workspace", str(ws_path / "ws_mlflow"),
         "--num_iterations", "2", "--batch_size", "1",
         "--save_every", "1000", "--log_every", "1", "--checkpoint", "none",
         "--n_devices", "1", "--mlflow", "1"],
        capture_output=True, text=True, timeout=1200, env=env)
    assert res.returncode == 0, res.stderr[-3000:]
    recorded = [json.loads(l) for l in calls.read_text().splitlines()]
    kinds = [r["kind"] for r in recorded]
    assert kinds[0] == "start_run"
    params = next(r for r in recorded if r["kind"] == "log_params")
    assert params["payload"]["model.vit_size"] == "vits"
    metric_calls = [r for r in recorded if r["kind"] == "log_metrics"]
    assert metric_calls and all(r["payload"]["n"] > 0 for r in metric_calls)
