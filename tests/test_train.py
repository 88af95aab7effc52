"""Training loop: loss decreases, metrics sane, checkpoints round-trip."""

import numpy as np
import pytest

import jax.numpy as jnp

from gsplat_tpu import RasterConfig, TrainConfig, render
from gsplat_tpu.models.gaussians import GaussianModel
from gsplat_tpu.train.checkpoint import (
    load_ply_checkpoint,
    restore_train_state,
    save_ply_checkpoint,
    save_train_state,
)
from gsplat_tpu.train.loss import psnr, rgb_loss, ssim
from gsplat_tpu.train.trainer import Trainer

from fixtures import orbit_camera, random_splat_arrays

CFG = RasterConfig(tile_size=16, chunk_size=8, max_pairs=1 << 13, use_pallas=False)


def test_ssim_identity_and_range():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (32, 48, 3)).astype(np.float32))
    assert float(ssim(img, img)) == pytest.approx(1.0, abs=1e-5)
    noise = jnp.asarray(rng.uniform(0, 1, (32, 48, 3)).astype(np.float32))
    val = float(ssim(img, noise))
    assert -1.0 <= val < 0.9


def test_ssim_matches_torch_reference_formula():
    """Cross-check against an independent torch implementation of the same
    windowed SSIM (zero-padded 11x11 gaussian window, as used by 3DGS)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(1)
    a = rng.uniform(0, 1, (24, 40, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)

    def torch_ssim(x, y):
        win = 11
        sigma = 1.5
        g = torch.exp(-((torch.arange(win) - win // 2) ** 2) / (2 * sigma**2))
        g = (g / g.sum()).float()
        kernel = (g[:, None] @ g[None, :]).expand(3, 1, win, win)
        x = torch.tensor(x).permute(2, 0, 1)[None]
        y = torch.tensor(y).permute(2, 0, 1)[None]
        mu_x = F.conv2d(x, kernel, padding=win // 2, groups=3)
        mu_y = F.conv2d(y, kernel, padding=win // 2, groups=3)
        sxx = F.conv2d(x * x, kernel, padding=win // 2, groups=3) - mu_x**2
        syy = F.conv2d(y * y, kernel, padding=win // 2, groups=3) - mu_y**2
        sxy = F.conv2d(x * y, kernel, padding=win // 2, groups=3) - mu_x * mu_y
        c1, c2 = 0.01**2, 0.03**2
        m = ((2 * mu_x * mu_y + c1) * (2 * sxy + c2)) / (
            (mu_x**2 + mu_y**2 + c1) * (sxx + syy + c2)
        )
        return float(m.mean())

    ours = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    theirs = torch_ssim(a, b)
    assert ours == pytest.approx(theirs, abs=2e-4)


@pytest.mark.slow
def test_finetune_improves_psnr():
    """Fine-tune a perturbed model toward images rendered by the original."""
    rng = np.random.default_rng(3)
    arrays = random_splat_arrays(rng, 150)
    target_model = GaussianModel.from_arrays(arrays)
    cameras = [orbit_camera(a, width=48, height=32) for a in (0.0, 0.2)]
    views = [(cam, render(target_model, cam, CFG)[0]) for cam in cameras]

    perturbed = dict(arrays)
    perturbed["means"] = arrays["means"] + rng.normal(0, 0.01, arrays["means"].shape).astype(np.float32)
    perturbed["opacity_logits"] = arrays["opacity_logits"] - 0.5
    model = GaussianModel.from_arrays(perturbed)

    trainer = Trainer(raster=CFG, train=TrainConfig(steps=60, log_every=20, ssim_weight=0.2))
    start_psnr = float(psnr(render(model, cameras[0], CFG)[0], views[0][1]))
    model, history = trainer.fit(model, views)
    end_psnr = float(psnr(render(model, cameras[0], CFG)[0], views[0][1]))
    assert end_psnr > start_psnr + 1.0, (start_psnr, end_psnr)
    assert history[-1]["loss"] < history[0]["loss"]


def test_trainer_auto_pairs_resizes_on_overflow():
    """An overflowing fit must not silently train on a truncated scene:
    with auto_pairs the budget grows (one recompile) and the steps match a
    run that had enough capacity all along; without it, a loud warning."""
    import logging

    rng = np.random.default_rng(6)
    arrays = random_splat_arrays(rng, 120)
    cam = orbit_camera(0.1, width=48, height=32)
    target = render(GaussianModel.from_arrays(arrays), cam, CFG)[0]
    model = GaussianModel.from_arrays(arrays)

    tiny = RasterConfig(tile_size=16, chunk_size=8, max_pairs=64, use_pallas=False)
    tc = TrainConfig(steps=3, log_every=10, ssim_weight=0.0)

    trainer = Trainer(raster=tiny, train=tc, show_progress=False)
    m_auto, hist_auto = trainer.fit(model, [(cam, target)])
    assert trainer.raster.max_pairs > 64  # resized to cover the demand

    roomy = RasterConfig(
        tile_size=16, chunk_size=8, max_pairs=trainer.raster.max_pairs,
        use_pallas=False,
    )
    ref_trainer = Trainer(raster=roomy, train=tc, show_progress=False)
    m_ref, hist_ref = ref_trainer.fit(model, [(cam, target)])
    assert hist_auto[0]["loss"] == pytest.approx(hist_ref[0]["loss"], rel=1e-6)
    np.testing.assert_allclose(
        np.asarray(m_auto.means), np.asarray(m_ref.means), rtol=1e-6, atol=1e-8
    )

    # auto_pairs off: capacity stays, a warning is emitted.
    trainer2 = Trainer(raster=tiny, train=tc, auto_pairs=False, show_progress=False)
    logger = logging.getLogger("gsplat_tpu")
    records = []

    class Capture(logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    h = Capture()
    logger.addHandler(h)
    try:
        trainer2.fit(model, [(cam, target)], steps=1)
    finally:
        logger.removeHandler(h)
    assert trainer2.raster.max_pairs == 64
    assert any("overflow" in r for r in records), records


def test_ply_checkpoint_roundtrip(tmp_path):
    rng = np.random.default_rng(4)
    model = GaussianModel.from_arrays(random_splat_arrays(rng, 31))
    path = save_ply_checkpoint(str(tmp_path / "model"), model, iteration=7000)
    assert path.endswith("point_cloud/iteration_7000/point_cloud.ply")
    loaded = load_ply_checkpoint(str(tmp_path / "model"), iteration=7000)
    for a, b in zip(model.tree_flatten()[0], loaded.tree_flatten()[0]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_orbax_train_state_roundtrip(tmp_path):
    rng = np.random.default_rng(5)
    model = GaussianModel.from_arrays(random_splat_arrays(rng, 17))
    trainer = Trainer(raster=CFG, train=TrainConfig())
    opt_state = trainer.init_state(model)
    save_train_state(str(tmp_path / "ckpt"), model, opt_state, step=42)
    restored_model, restored_opt, step = restore_train_state(str(tmp_path / "ckpt"))
    assert step == 42
    np.testing.assert_array_equal(
        np.asarray(model.means), np.asarray(restored_model.means)
    )
    import jax

    n_leaves = len(jax.tree.leaves(opt_state))
    assert len(jax.tree.leaves(restored_opt)) == n_leaves
