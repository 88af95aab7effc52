"""The benchmark harness's real-scene mode, driven in-process on a
synthetic on-disk scene (the synthetic headline mode runs on hardware via
the driver; this pins the --scene code path)."""

import argparse
import sys

import numpy as np
import pytest

from fixtures import write_synthetic_scene

sys.path.insert(0, ".")  # repo root for `import bench`


@pytest.mark.slow
def test_synthetic_bench_mode(monkeypatch):
    """The driver-run synthetic mode end-to-end at toy scale: headline +
    early-stop + pair sweep + real-density + 4K extras all produce finite
    numbers (breakage here means the round-end hardware bench breaks)."""
    import bench

    monkeypatch.setattr(bench, "WIDTH", 128)
    monkeypatch.setattr(bench, "HEIGHT", 96)
    monkeypatch.setattr(bench, "NUM_GAUSSIANS", 800)
    monkeypatch.setattr(bench, "PAIR_SWEEP_SHIFTS", [0.8])
    monkeypatch.setattr(bench, "REAL_DENSITY_N", 800)
    monkeypatch.setattr(bench, "REAL_DENSITY_SHIFT", 1.0)
    monkeypatch.setattr(bench, "RES_4K", (160, 128))
    monkeypatch.setattr(bench, "CAPACITY_FLOOR", 1 << 10)
    monkeypatch.setattr(bench, "ITERS", (1, 1, 1, 1))
    out = bench.synthetic_bench(argparse.Namespace(quick=False))
    assert out["value"] > 0 and np.isfinite(out["extra"]["loss"])
    assert out["extra"]["early_stop_fps"] > 0
    assert out["extra"]["pair_sweep"][0]["fps"] > 0, out["extra"]["pair_sweep"]
    assert out["extra"]["real_density"]["fps"] > 0, out["extra"]["real_density"]
    assert out["extra"]["res_4k"]["fps"] > 0, out["extra"]["res_4k"]


@pytest.mark.slow
def test_synthetic_bench_budget_exhausted(monkeypatch, capsys):
    """With a zero wall-clock budget every extra stage is skipped but the
    headline is still measured, emitted, and names the skips — the property
    that makes the driver's tail-parse succeed on ANY exit path."""
    import json

    import bench

    monkeypatch.setattr(bench, "WIDTH", 128)
    monkeypatch.setattr(bench, "HEIGHT", 96)
    monkeypatch.setattr(bench, "NUM_GAUSSIANS", 800)
    monkeypatch.setattr(bench, "CAPACITY_FLOOR", 1 << 10)
    monkeypatch.setattr(bench, "ITERS", (1, 1, 1, 1))
    monkeypatch.setattr(bench, "BENCH_BUDGET_S", 0.0)
    out = bench.synthetic_bench(argparse.Namespace(quick=False))
    assert out["value"] > 0
    skipped = out["extra"]["budget"]["skipped"]
    assert "real_density" in skipped and "early_stop" in skipped, skipped
    assert "real_density" not in out["extra"]
    # every emitted stdout line is valid JSON with the headline value
    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    assert lines, "headline line must be emitted even with no budget"
    for line in lines:
        parsed = json.loads(line)
        assert parsed["value"] == out["value"]


@pytest.mark.slow
def test_scene_bench_mode(tmp_path):
    import bench

    root = str(tmp_path / "scene")
    write_synthetic_scene(root, np.random.default_rng(3), n_gaussians=200, n_images=2)
    args = argparse.Namespace(
        scene=root, model=root + "/model", scale_factor=1, quick=True
    )
    out = bench.scene_bench(args)
    assert out["value"] > 0
    assert out["extra"]["num_views"] == 2
    assert np.isfinite(out["extra"]["mean_psnr"])
