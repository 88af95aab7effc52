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
