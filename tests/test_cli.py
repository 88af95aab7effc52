"""CLI end-to-end on a synthetic on-disk scene (no display)."""

import os
import shutil

import numpy as np
import pytest
from click.testing import CliRunner

from gsplat_tpu.cli import cli

from fixtures import write_synthetic_scene

HAS_FFMPEG = shutil.which("ffmpeg") is not None


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("scene")
    rng = np.random.default_rng(21)
    write_synthetic_scene(str(root), rng, n_gaussians=120, width=64, height=48, scale_factor=1)
    return str(root)


def _common(scene_dir, out):
    return [
        "--input_dir", scene_dir,
        "--trained_model_path", os.path.join(scene_dir, "model"),
        "--scale-factor", "1",
        "--scene-index", "1",
        "--tile-size", "16",
        "--chunk-size", "8",
        "--max-pairs", str(1 << 13),
        "--backend", "jnp",
        "--output_path", out,
    ]


def test_cli_render(scene_dir, tmp_path):
    out = str(tmp_path / "out")
    result = CliRunner().invoke(cli, ["render", *_common(scene_dir, out), "--no-show"])
    assert result.exit_code == 0, result.output + repr(result.exception)
    assert os.path.exists(os.path.join(out, "render.png"))
    assert os.path.exists(os.path.join(out, "comparison.png"))


@pytest.mark.skipif(not HAS_FFMPEG, reason="ffmpeg not installed")
def test_cli_render_video(scene_dir, tmp_path):
    out = str(tmp_path / "vid")
    result = CliRunner().invoke(
        cli, ["render", *_common(scene_dir, out), "--no-show", "--generate_video"]
    )
    assert result.exit_code == 0, result.output + repr(result.exception)
    assert os.path.exists(os.path.join(out, "video_render.mp4"))


def test_cli_finetune(scene_dir, tmp_path):
    out = str(tmp_path / "ft")
    result = CliRunner().invoke(
        cli, ["finetune", *_common(scene_dir, out), "--steps", "3"]
    )
    assert result.exit_code == 0, result.output + repr(result.exception)
    assert os.path.exists(
        os.path.join(out, "point_cloud/iteration_30001/point_cloud.ply")
    )


@pytest.mark.skipif(not HAS_FFMPEG, reason="ffmpeg not installed")
def test_cli_orbit(scene_dir, tmp_path):
    out = str(tmp_path / "orbit")
    result = CliRunner().invoke(
        cli, ["orbit", *_common(scene_dir, out), "--num-frames", "4"]
    )
    assert result.exit_code == 0, result.output + repr(result.exception)
    assert os.path.exists(os.path.join(out, "video_render.mp4"))
