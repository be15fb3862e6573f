"""The shipped training configs (configs/train/*.json) load 1:1 and drive
the trainer — including against the actual reference JSONs when the
reference tree is mounted (reference: configs/train/stereo_v1.json,
scripts/train.py:45-64)."""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from foundationstereo_tpu.config import ModelConfig
from foundationstereo_tpu.train.losses import LOSS_REGISTRY
from foundationstereo_tpu.train.optim import build_schedule
from foundationstereo_tpu.utils.misc import depth_uint8_encoding

REPO = Path(__file__).resolve().parent.parent
REF = Path("/root/reference/configs/train")
CONFIGS = sorted((REPO / "configs/train").glob("*.json"))


def test_configs_exist():
    names = {p.name for p in CONFIGS}
    assert {"stereo_v1.json", "stereo_v1_bigger.json"} <= names


@pytest.mark.parametrize("path", CONFIGS, ids=lambda p: p.name)
def test_config_loads_and_validates(path):
    cfg = json.loads(path.read_text())
    model = ModelConfig.from_json(str(path))
    assert model.max_disp == cfg["model"]["max_disp"]
    assert model.vit_size == cfg["model"]["vit_size"]
    assert tuple(model.hidden_dims) == tuple(cfg["model"]["hidden_dims"])
    # Every configured loss resolves in the registry.
    for label_type in cfg["loss"].values():
        for spec in label_type.values():
            assert spec["function"] in LOSS_REGISTRY
    # The lr schedule builds and evaluates.
    sched = build_schedule(cfg["lr_scheduler"], base_lr=1.0)
    assert np.isfinite(float(sched(0))) and np.isfinite(float(sched(200_000)))


@pytest.mark.parametrize("name", ["stereo_v1.json", "stereo_v1_bigger.json"])
def test_reference_configs_translate_1to1(name):
    """The actual reference JSONs produce the same ModelConfig as ours."""
    ref_path = REF / name
    if not ref_path.exists():
        pytest.skip("reference tree not mounted")
    ours = ModelConfig.from_json(str(REPO / "configs/train" / name))
    theirs = ModelConfig.from_json(str(ref_path))
    assert ours == theirs


@pytest.mark.slow
@pytest.mark.xdist_group("heavy_subprocess")
def test_readme_train_command_runs(tmp_path, rng):
    """`scripts/train.py --config configs/train/stereo_v1.json` executes ≥2
    steps on synthetic data (model shrunk via --override to keep CPU time
    bounded; the config itself is the shipped one)."""
    data = tmp_path / "data"
    for sub in ("left/rgb", "right/rgb", "left/disparity"):
        (data / sub).mkdir(parents=True)
    for i in range(3):
        img = rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)
        Image.fromarray(img).save(data / "left/rgb" / f"{i}.jpg")
        Image.fromarray(np.roll(img, -2, 1)).save(data / "right/rgb" / f"{i}.jpg")
        disp = rng.uniform(1, 30, (64, 96)).astype(np.float32)
        Image.fromarray(depth_uint8_encoding(disp)).save(
            data / "left/disparity" / f"{i}.png")

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = str(REPO)
    res = subprocess.run(
        [sys.executable, str(REPO / "scripts/train.py"),
         "--config", str(REPO / "configs/train/stereo_v1.json"),
         "--workspace", str(tmp_path / "ws"),
         "--num_iterations", "2", "--batch_size", "1",
         "--log_every", "1", "--checkpoint", "none", "--n_devices", "1",
         "--override", "model.vit_size=vits",
         "--override", "model.max_disp=64",
         "--override", "model.train_iters=1",
         "--override", "model.mixed_precision=false",
         "--override", "data.image_sizes=[[96,64]]",
         "--override", "data.max_disparity=64",
         "--override", f"data.datasets.0.path={data}"],
        capture_output=True, text=True, timeout=2400, env=env)
    assert res.returncode == 0, res.stderr[-3000:]
    lines = [json.loads(l) for l in res.stdout.splitlines()
             if l.startswith("{") and "step" in l]
    assert len(lines) >= 2 and all(np.isfinite(l["loss"]) for l in lines)
