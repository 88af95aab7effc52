"""CLI end-to-end on a synthetic on-disk scene (no display)."""

import os
import shutil

import numpy as np
import pytest
from click.testing import CliRunner

from gsplat_tpu.cli import cli

from fixtures import write_synthetic_scene

HAS_FFMPEG = shutil.which("ffmpeg") is not None
# Without ffmpeg the encoder falls back to a pure-Python MJPEG AVI.
VIDEO_NAME = "video_render.mp4" if HAS_FFMPEG else "video_render.avi"


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


def test_cli_render_mesh(scene_dir, tmp_path):
    """`render --mesh 1x4` shards the frame's tile grid over the virtual
    mesh and writes the same artifacts; a data axis > 1 is rejected up
    front (single view)."""
    out = str(tmp_path / "out_mesh")
    result = CliRunner().invoke(
        cli, ["render", *_common(scene_dir, out), "--no-show", "--mesh", "1x4"]
    )
    assert result.exit_code == 0, result.output + repr(result.exception)
    assert os.path.exists(os.path.join(out, "render.png"))

    bad = CliRunner().invoke(
        cli, ["render", *_common(scene_dir, out), "--no-show", "--mesh", "2x2"]
    )
    assert bad.exit_code != 0
    assert "1xTILE" in bad.output


def test_cli_render_video(scene_dir, tmp_path):
    out = str(tmp_path / "vid")
    result = CliRunner().invoke(
        cli, ["render", *_common(scene_dir, out), "--no-show", "--generate_video"]
    )
    assert result.exit_code == 0, result.output + repr(result.exception)
    assert os.path.exists(os.path.join(out, VIDEO_NAME))


@pytest.mark.slow
def test_cli_finetune(scene_dir, tmp_path):
    out = str(tmp_path / "ft")
    result = CliRunner().invoke(
        cli, ["finetune", *_common(scene_dir, out), "--steps", "3"]
    )
    assert result.exit_code == 0, result.output + repr(result.exception)
    assert os.path.exists(
        os.path.join(out, "point_cloud/iteration_30001/point_cloud.ply")
    )


def test_cli_train_from_points(scene_dir, tmp_path):
    """`train` without a checkpoint seeds from the scene's SfM points."""
    out = str(tmp_path / "tr")
    args = [a for a in _common(scene_dir, out)]
    i = args.index("--trained_model_path")
    del args[i : i + 2]  # no checkpoint: points3D init
    result = CliRunner().invoke(
        cli, ["train", *args, "--steps", "3", "--no-densify"]
    )
    assert result.exit_code == 0, result.output + repr(result.exception)
    assert os.path.exists(
        os.path.join(out, "point_cloud/iteration_30000/point_cloud.ply")
    )


def test_cli_train_warm_start(scene_dir, tmp_path):
    """`train --trained_model_path` warm-starts from the checkpoint instead
    of silently ignoring the flag (code-review finding)."""
    out = str(tmp_path / "trw")
    result = CliRunner().invoke(
        cli, ["train", *_common(scene_dir, out), "--steps", "3", "--no-densify"]
    )
    assert result.exit_code == 0, result.output + repr(result.exception)
    assert os.path.exists(
        os.path.join(out, "point_cloud/iteration_30000/point_cloud.ply")
    )


@pytest.mark.slow
def test_cli_finetune_mesh(scene_dir, tmp_path):
    """`finetune --mesh 2x2` trains through ParallelTrainer on the virtual
    device mesh and writes the same checkpoint layout."""
    out = str(tmp_path / "ftm")
    result = CliRunner().invoke(
        cli, ["finetune", *_common(scene_dir, out), "--steps", "3",
              "--mesh", "2x2"]
    )
    assert result.exit_code == 0, result.output + repr(result.exception)
    assert os.path.exists(
        os.path.join(out, "point_cloud/iteration_30001/point_cloud.ply")
    )


def test_cli_train_background_and_lr_decay(scene_dir, tmp_path):
    """`--background white --lr-decay-steps N` reach TrainConfig: the run
    completes and writes the checkpoint (the schedule/compositing semantics
    themselves are pinned in test_train.py)."""
    out = str(tmp_path / "trbg")
    result = CliRunner().invoke(
        cli, ["train", *_common(scene_dir, out), "--steps", "3", "--no-densify",
              "--background", "white", "--lr-decay-steps", "3",
              "--lr-means-final", "1.6e-6"]
    )
    assert result.exit_code == 0, result.output + repr(result.exception)
    assert os.path.exists(
        os.path.join(out, "point_cloud/iteration_30000/point_cloud.ply")
    )


def test_cli_train_lr_scale_extent(scene_dir, tmp_path):
    """`--lr-scale-extent` multiplies the position lr by the camera-extent
    radius (3DGS spatial_lr_scale) and the run still completes."""
    out = str(tmp_path / "trext")
    result = CliRunner().invoke(
        cli, ["train", *_common(scene_dir, out), "--steps", "2", "--no-densify",
              "--lr-scale-extent"]
    )
    assert result.exit_code == 0, result.output + repr(result.exception)
    assert os.path.exists(
        os.path.join(out, "point_cloud/iteration_30000/point_cloud.ply")
    )


def test_cli_train_test_holdout(scene_dir, tmp_path):
    """`--test-every 2` on the 2-view scene trains on one view and
    evaluates the held-out one (checkpoint write follows the eval, so its
    existence proves the holdout path ran); holding out everything is a
    usage error."""
    out = str(tmp_path / "trho")
    result = CliRunner().invoke(
        cli, ["train", *_common(scene_dir, out), "--steps", "2", "--no-densify",
              "--test-every", "2"]
    )
    assert result.exit_code == 0, result.output + repr(result.exception)
    assert os.path.exists(
        os.path.join(out, "point_cloud/iteration_30000/point_cloud.ply")
    )

    bad = CliRunner().invoke(
        cli, ["train", *_common(scene_dir, out), "--steps", "2", "--no-densify",
              "--test-every", "1"]
    )
    assert bad.exit_code != 0


def test_cli_orbit(scene_dir, tmp_path):
    out = str(tmp_path / "orbit")
    result = CliRunner().invoke(
        cli, ["orbit", *_common(scene_dir, out), "--num-frames", "4"]
    )
    assert result.exit_code == 0, result.output + repr(result.exception)
    assert os.path.exists(os.path.join(out, VIDEO_NAME))


def test_cli_orbit_mesh(scene_dir, tmp_path):
    """`orbit --mesh 2x2` renders frames through make_batch_render on the
    virtual mesh (tail batch padded to the data axis and trimmed)."""
    out = str(tmp_path / "orbit_mesh")
    result = CliRunner().invoke(
        cli, ["orbit", *_common(scene_dir, out), "--num-frames", "3",
              "--mesh", "2x2"]
    )
    assert result.exit_code == 0, result.output + repr(result.exception)
    assert os.path.exists(os.path.join(out, VIDEO_NAME))


def test_mjpeg_avi_structure(scene_dir, tmp_path):
    """The no-ffmpeg fallback writes a structurally valid RIFF AVI."""
    import struct

    from gsplat_tpu.utils import video as videolib

    out = str(tmp_path / "avi")
    frames = [np.full((32, 48, 3), v, np.float32) for v in (0.2, 0.5, 0.8)]
    videolib.write_frames(out, frames)
    path = videolib.encode_mjpeg_avi(out)
    data = open(path, "rb").read()
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    assert struct.unpack("<I", data[4:8])[0] == len(data) - 8
    assert b"movi" in data and b"MJPG" in data and b"idx1" in data


def test_cli_evaluate(scene_dir, tmp_path):
    out = str(tmp_path / "eval")
    result = CliRunner().invoke(cli, ["evaluate", *_common(scene_dir, out)])
    assert result.exit_code == 0, result.output + repr(result.exception)
    import json

    metrics = json.load(open(os.path.join(out, "metrics.json")))
    assert metrics["views"] and np.isfinite(metrics["mean_psnr"])
    assert -1.0 <= metrics["mean_ssim"] <= 1.0


def test_multicamera_views_use_their_own_intrinsics(tmp_path):
    """A two-camera COLMAP reconstruction: every multi-view path must
    resolve intrinsics per image via BaseImage.camera_id, not the
    reference's single-view cam_info[1] hardcode (rasterize.py:336 — kept
    only in `render`). Camera 2 has 1.5x the focal length, so views 0/1
    must come back with different focals, and `evaluate` must render each
    with its own."""
    import json

    root = str(tmp_path / "scene2cam")
    write_synthetic_scene(
        root, np.random.default_rng(7), n_gaussians=120,
        width=64, height=48, scale_factor=1, two_cameras=True,
    )
    from gsplat_tpu.cli import _load_views

    views = _load_views(root, 1)
    assert len(views) == 2
    f0, f1 = views[0][0].focal_x, views[1][0].focal_x
    assert abs(f1 / f0 - 1.5) < 1e-6, (f0, f1)

    out = str(tmp_path / "eval2cam")
    result = CliRunner().invoke(cli, ["evaluate", *_common(root, out)])
    assert result.exit_code == 0, result.output + repr(result.exception)
    metrics = json.load(open(os.path.join(out, "metrics.json")))
    assert len(metrics["views"]) == 2 and np.isfinite(metrics["mean_psnr"])


def test_cli_evaluate_holdout_split(scene_dir, tmp_path):
    """`evaluate --test-every 2` scores only the held-out split (view
    indices % 2 == 0): one of the scene's two views."""
    import json

    out = str(tmp_path / "evalho")
    result = CliRunner().invoke(
        cli, ["evaluate", *_common(scene_dir, out), "--test-every", "2"]
    )
    assert result.exit_code == 0, result.output + repr(result.exception)
    metrics = json.load(open(os.path.join(out, "metrics.json")))
    assert len(metrics["views"]) == 1
    assert np.isfinite(metrics["mean_psnr"])


def test_cli_evaluate_mesh(scene_dir, tmp_path):
    """`evaluate --mesh 2x2` computes the same per-view metrics as the
    single-device path (views batched over the data axis)."""
    import json

    out1 = str(tmp_path / "eval1")
    out2 = str(tmp_path / "eval2")
    r1 = CliRunner().invoke(cli, ["evaluate", *_common(scene_dir, out1)])
    r2 = CliRunner().invoke(
        cli, ["evaluate", *_common(scene_dir, out2), "--mesh", "2x2"]
    )
    assert r1.exit_code == 0, r1.output + repr(r1.exception)
    assert r2.exit_code == 0, r2.output + repr(r2.exception)
    m1 = json.load(open(os.path.join(out1, "metrics.json")))
    m2 = json.load(open(os.path.join(out2, "metrics.json")))
    assert len(m1["views"]) == len(m2["views"])
    for a, b in zip(m1["views"], m2["views"]):
        assert a["view"] == b["view"]
        assert abs(a["psnr"] - b["psnr"]) < 1e-3, (a, b)
        assert abs(a["ssim"] - b["ssim"]) < 1e-5, (a, b)


def test_progressive_frames_converge_to_full_render(scene_dir):
    """Incremental slab compositing (C + T*C_slab) must reproduce the full
    render exactly at the last frame, and build up monotonically."""
    from gsplat_tpu import RasterConfig, render
    from gsplat_tpu.io.ply import load_splat_arrays
    from gsplat_tpu.io.scene import checkpoint_ply_path
    from gsplat_tpu.models.gaussians import GaussianModel
    from gsplat_tpu.utils.video import progressive_frames
    from fixtures import make_camera

    cfg = RasterConfig(tile_size=16, chunk_size=8, pair_block=8, max_pairs=1 << 13, use_pallas=False)
    model = GaussianModel.from_arrays(
        load_splat_arrays(checkpoint_ply_path(os.path.join(scene_dir, "model")))
    )
    camera = make_camera(64, 48)
    frames = progressive_frames(model, camera, cfg, num_frames=5)
    full = np.asarray(render(model, camera, cfg)[0])
    np.testing.assert_allclose(frames[-1], full, rtol=1e-5, atol=1e-6)
    # opacity is accumulated front-to-back: per-pixel brightness sum never decreases
    sums = [f.sum() for f in frames]
    assert all(b >= a - 1e-3 for a, b in zip(sums, sums[1:])), sums


def test_cli_orbit_auto_pairs_resizes(scene_dir, tmp_path):
    """--auto-pairs budget-checks the whole orbit trajectory: with a tiny
    max_pairs the run warns + resizes rather than silently dropping splats
    on rotated poses."""
    import logging

    out = str(tmp_path / "orbit_ap")
    args = _common(scene_dir, out)
    args[args.index("--max-pairs") + 1] = "32"  # far below the demand
    records = []

    class Capture(logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    logger = logging.getLogger("gsplat_tpu")
    h = Capture()
    logger.addHandler(h)
    try:
        result = CliRunner().invoke(
            cli, ["orbit", *args, "--num-frames", "3", "--auto-pairs"]
        )
    finally:
        logger.removeHandler(h)
    assert result.exit_code == 0, result.output + repr(result.exception)
    assert any("overflow" in r and "using max_pairs" in r for r in records), records
    assert os.path.exists(os.path.join(out, VIDEO_NAME))
