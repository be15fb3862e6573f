"""Dataset readers + eval metrics tests on synthetic on-disk fixtures."""

import numpy as np
import pytest
from PIL import Image

from foundationstereo_tpu.inference.datasets import (
    iter_fsd,
    iter_kitti,
    iter_middlebury,
    read_pfm,
    stereo_eval_metrics,
    write_pfm,
)
from foundationstereo_tpu.utils.misc import depth_uint8_encoding


def test_pfm_roundtrip(tmp_path, rng):
    d = rng.uniform(0, 100, (17, 23)).astype(np.float32)
    write_pfm(tmp_path / "d.pfm", d)
    back = read_pfm(tmp_path / "d.pfm")
    np.testing.assert_array_equal(back, d)


def test_middlebury_reader(tmp_path, rng):
    scene = tmp_path / "sceneA"
    scene.mkdir()
    img = rng.integers(0, 255, (20, 30, 3), dtype=np.uint8)
    Image.fromarray(img).save(scene / "im0.png")
    Image.fromarray(img).save(scene / "im1.png")
    gt = rng.uniform(1, 50, (20, 30)).astype(np.float32)
    gt[0, 0] = np.inf  # occluded/invalid
    write_pfm(scene / "disp0.pfm", gt)
    mask = np.full((20, 30), 255, np.uint8)
    mask[1, 1] = 0
    Image.fromarray(mask).save(scene / "mask0nocc.png")

    samples = list(iter_middlebury(tmp_path))
    assert len(samples) == 1
    s = samples[0]
    assert s["left"].shape == (20, 30, 3)
    assert not s["mask"][0, 0] and not s["mask"][1, 1]
    assert s["mask"][2, 2]


def test_kitti_reader(tmp_path, rng):
    (tmp_path / "image_2").mkdir()
    (tmp_path / "image_3").mkdir()
    (tmp_path / "disp_occ_0").mkdir()
    img = rng.integers(0, 255, (10, 14, 3), dtype=np.uint8)
    Image.fromarray(img).save(tmp_path / "image_2" / "000000_10.png")
    Image.fromarray(img).save(tmp_path / "image_3" / "000000_10.png")
    disp16 = (rng.uniform(0, 50, (10, 14)) * 256).astype(np.uint16)
    Image.fromarray(disp16).save(tmp_path / "disp_occ_0" / "000000_10.png")
    samples = list(iter_kitti(tmp_path, "2015"))
    assert len(samples) == 1
    np.testing.assert_allclose(samples[0]["disparity"],
                               disp16.astype(np.float32) / 256.0)


def test_fsd_reader(tmp_path, rng):
    for sub in ("left/rgb", "right/rgb", "left/disparity"):
        (tmp_path / sub).mkdir(parents=True)
    img = rng.integers(0, 255, (12, 16, 3), dtype=np.uint8)
    Image.fromarray(img).save(tmp_path / "left/rgb/0.jpg")
    Image.fromarray(img).save(tmp_path / "right/rgb/0.jpg")
    gt = rng.uniform(1, 30, (12, 16)).astype(np.float32)
    Image.fromarray(depth_uint8_encoding(gt)).save(tmp_path / "left/disparity/0.png")
    samples = list(iter_fsd(tmp_path))
    assert len(samples) == 1
    np.testing.assert_allclose(samples[0]["disparity"], gt, atol=1e-3)


def test_metrics_pack(rng):
    gt = rng.uniform(1, 60, (20, 30)).astype(np.float32)
    pred = gt + rng.normal(0, 1.0, gt.shape).astype(np.float32)
    mask = np.ones_like(gt, bool)
    m = stereo_eval_metrics(pred, gt, mask)
    assert 0 < m["epe"] < 3
    assert m["bad3"] <= m["bad1"] <= m["bad05"]
    assert m["d1_all"] <= m["bad3"] + 1e-9

    perfect = stereo_eval_metrics(gt, gt, mask)
    assert perfect["epe"] == 0 and perfect["bad1"] == 0


@pytest.mark.slow
@pytest.mark.xdist_group("heavy_subprocess")
@pytest.mark.parametrize("fmt", ["middlebury", "eth3d", "kitti2015"])
def test_eval_cli_benchmark_formats(tmp_path, fmt):
    """scripts/eval.py end-to-end per real-benchmark on-disk format (the
    readers behind BASELINE.md Tables 2-4), on fixtures emitted by
    scripts/make_eval_fixtures.py — not just the unit-level readers above."""
    import json
    import os
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = str(repo)
    fix = tmp_path / "fixtures"
    subprocess.run(
        [sys.executable, str(repo / "scripts/make_eval_fixtures.py"), "--out",
         str(fix), "--n", "1", "--height", "96", "--width", "128",
         "--max_disp", "32"], check=True, timeout=300, env=env)
    out = tmp_path / "metrics.jsonl"
    res = subprocess.run(
        [sys.executable, str(repo / "scripts/eval.py"), "--dataset", fmt,
         "--root", str(fix / fmt), "--vit_size", "vits", "--max_disp", "64",
         "--valid_iters", "2", "--out", str(out)],
        capture_output=True, text=True, timeout=1200, env=env)
    assert res.returncode == 0, res.stderr[-3000:]
    rows = [json.loads(l) for l in out.read_text().splitlines()]
    frames = [r for r in rows if r["type"] == "frame"]
    summary = [r for r in rows if r["type"] == "summary"]
    assert len(frames) == 1 and len(summary) == 1
    assert np.isfinite(frames[0]["epe"]) and 0 < frames[0]["density"] <= 1
    assert summary[0]["dataset"] == fmt


@pytest.mark.slow
@pytest.mark.xdist_group("heavy_subprocess")
def test_eval_cli_end_to_end(tmp_path, rng):
    """scripts/eval.py runs the full surface: FSD reader -> padded forward ->
    metric pack -> per-frame + summary JSONL (the on-chip r3/r4 eval runs use
    exactly this path; this pins it on CPU at tiny shapes)."""
    import json
    import os
    import subprocess
    import sys
    from pathlib import Path

    root = tmp_path / "fsd"
    for sub in ("left/rgb", "right/rgb", "left/disparity"):
        (root / sub).mkdir(parents=True)
    for i in range(2):
        img = rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)
        Image.fromarray(img).save(root / "left/rgb" / f"{i}.jpg")
        Image.fromarray(np.roll(img, -2, 1)).save(root / "right/rgb" / f"{i}.jpg")
        disp = rng.uniform(1, 20, (64, 96)).astype(np.float32)
        Image.fromarray(depth_uint8_encoding(disp)).save(
            root / "left/disparity" / f"{i}.png")

    repo = Path(__file__).resolve().parent.parent
    out = tmp_path / "metrics.jsonl"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = str(repo)
    res = subprocess.run(
        [sys.executable, str(repo / "scripts/eval.py"), "--dataset", "fsd",
         "--root", str(root), "--vit_size", "vits", "--max_disp", "64",
         "--valid_iters", "2", "--out", str(out)],
        capture_output=True, text=True, timeout=1200, env=env)
    assert res.returncode == 0, res.stderr[-3000:]
    rows = [json.loads(l) for l in out.read_text().splitlines()]
    frames = [r for r in rows if r["type"] == "frame"]
    summary = [r for r in rows if r["type"] == "summary"]
    assert len(frames) == 2 and len(summary) == 1
    assert all(np.isfinite(r["epe"]) for r in frames)
    assert summary[0]["frames"] == 2
