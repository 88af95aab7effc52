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

CFG = RasterConfig(tile_size=16, chunk_size=8, pair_block=8, max_pairs=1 << 13, use_pallas=False)


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

    tiny = RasterConfig(tile_size=16, chunk_size=8, pair_block=8, max_pairs=64, use_pallas=False)
    tc = TrainConfig(steps=3, log_every=10, ssim_weight=0.0)

    trainer = Trainer(raster=tiny, train=tc, show_progress=False)
    m_auto, hist_auto = trainer.fit(model, [(cam, target)])
    assert trainer.raster.max_pairs > 64  # resized to cover the demand

    roomy = RasterConfig(
        tile_size=16, chunk_size=8, pair_block=8, max_pairs=trainer.raster.max_pairs,
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


def test_densify_prune_step_semantics():
    """Hand-built pool: low-opacity slot pruned (freed), high-grad small
    splat cloned into a free slot, high-grad large splat split (both halves
    shrunk, sampled mean), optimizer rows of touched slots flagged."""
    import jax
    import jax.numpy as jnp

    from gsplat_tpu.config import DensifyConfig
    from gsplat_tpu.models.gaussians import DEAD_OPACITY_LOGIT, GaussianModel
    from gsplat_tpu.train import densify as D

    # pool of 8: [0]=dying, [1]=small+high grad, [2]=big+high grad,
    # [3]=quiet, [4..7]=dead (free)
    c = 8
    model = GaussianModel(
        means=jnp.arange(c * 3, dtype=jnp.float32).reshape(c, 3),
        log_scales=jnp.full((c, 3), -4.0).at[2].set(0.0),  # slot 2 is huge
        quats=jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (c, 1)),
        opacity_logits=jnp.asarray(
            [-7.0, 2.0, 2.0, 2.0] + [DEAD_OPACITY_LOGIT] * 4
        ),  # sigmoid(-7) ~ 9e-4 < min_opacity
        sh=jnp.zeros((c, 16, 3)).at[1, 0, 0].set(0.7),
    )
    state = D.DensifyState(
        grad_sum=jnp.asarray([0.0, 1.0, 1.0, 0.0, 0, 0, 0, 0]),
        grad_count=jnp.asarray([1, 1, 1, 1, 0, 0, 0, 0], jnp.int32),
        max_radius=jnp.zeros((8,), jnp.float32),
    )
    cfg = DensifyConfig(grad_threshold=0.5, percent_dense=0.01)
    new, touched, stats = D.densify_prune_step(
        model, state, jax.random.key(0), 10.0, cfg  # extent 10 -> cutoff 0.1
    )
    assert int(stats["pruned"]) == 1
    assert int(stats["cloned"]) == 1
    assert int(stats["split"]) == 1
    assert int(stats["alive"]) == 5  # 3 survivors + clone + split half
    alive = np.asarray(D.alive_mask(new))
    assert alive[1] and alive[2] and alive[3]
    # two new slots allocated among the freed region (the just-pruned slot 0
    # is legitimately reusable in the same pass)
    free_region = [0] + list(range(4, 8))
    assert sum(alive[i] for i in free_region) == 2
    # the clone of slot 1 is an exact copy somewhere in the free region
    clones = [
        i for i in free_region
        if alive[i] and abs(float(new.sh[i, 0, 0]) - 0.7) < 1e-6
    ]
    assert len(clones) == 1
    np.testing.assert_allclose(
        np.asarray(new.means[clones[0]]), np.asarray(model.means[1])
    )
    np.testing.assert_allclose(
        np.asarray(new.log_scales[clones[0]]), np.asarray(model.log_scales[1])
    )
    # the split half shrank, and so did the original
    splits = [i for i in free_region if alive[i] and i not in clones]
    assert len(splits) == 1
    import math as _m

    np.testing.assert_allclose(
        np.asarray(new.log_scales[splits[0]]),
        np.asarray(model.log_scales[2]) - _m.log(cfg.split_factor),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(new.log_scales[2]),
        np.asarray(model.log_scales[2]) - _m.log(cfg.split_factor),
        rtol=1e-6,
    )
    t = np.asarray(touched)
    assert t[0] and t[2] and t[clones[0]] and t[splits[0]] and not t[1] and not t[3]
    # pruned-but-unreused slots are dead
    assert not any(alive[i] for i in free_region if i not in clones + splits)


def test_densify_size_prune():
    """The full 3DGS prune rule: past ``size_prune_start`` a gaussian is
    pruned when its largest world-space scale exceeds
    ``prune_scale_extent * extent`` (big_points_ws) or its windowed max
    projected radius exceeds ``max_screen_size`` px (big_points_vs) —
    before the warmup step, neither criterion fires."""
    import jax
    import jax.numpy as jnp

    from gsplat_tpu.config import DensifyConfig
    from gsplat_tpu.models.gaussians import DEAD_OPACITY_LOGIT, GaussianModel
    from gsplat_tpu.train import densify as D

    # [0]=oversized world scale, [1]=oversized screen radius, [2]=fine,
    # [3]=free
    c = 4
    extent = 10.0
    model = GaussianModel(
        means=jnp.zeros((c, 3)),
        # exp(0.5)=1.65 > 0.1*10 for slot 0; the rest are tiny
        log_scales=jnp.full((c, 3), -4.0).at[0].set(0.5),
        quats=jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (c, 1)),
        opacity_logits=jnp.asarray([2.0, 2.0, 2.0, DEAD_OPACITY_LOGIT]),
        sh=jnp.zeros((c, 16, 3)),
    )
    state = D.DensifyState(
        grad_sum=jnp.zeros((c,)),
        grad_count=jnp.zeros((c,), jnp.int32),
        max_radius=jnp.asarray([0.0, 37.0, 4.0, 0.0]),  # slot 1 > 20 px
    )
    cfg = DensifyConfig(max_screen_size=20.0, prune_scale_extent=0.1,
                        size_prune_start=3000)
    key = jax.random.key(0)

    # before the warmup gate: nothing pruned
    new, _, stats = D.densify_prune_step(model, state, key, extent, cfg, step=0)
    assert int(stats["pruned"]) == 0
    alive = np.asarray(D.alive_mask(new))
    assert alive[0] and alive[1] and alive[2]

    # past the gate: both size criteria fire, the healthy splat survives
    new, touched, stats = D.densify_prune_step(
        model, state, key, extent, cfg, step=3000
    )
    assert int(stats["pruned"]) == 2
    alive = np.asarray(D.alive_mask(new))
    assert not alive[0] and not alive[1] and alive[2]
    t = np.asarray(touched)
    assert t[0] and t[1] and not t[2]

    # max_screen_size=0 disables both criteria entirely
    cfg_off = DensifyConfig(max_screen_size=0.0)
    _, _, stats = D.densify_prune_step(
        model, state, key, extent, cfg_off, step=9999
    )
    assert int(stats["pruned"]) == 0


def test_screen_radii_matches_covariance():
    """screen_radii inverts the conic back to 3*sqrt(max eigenvalue) of the
    2D covariance (the reference's own bbox radius, rasterize.py:163-181)."""
    import jax.numpy as jnp

    from gsplat_tpu.train.densify import screen_radii

    # covariance [[4, 1], [1, 2]]: eigenvalues 3 +- sqrt(2)
    a, b, c = 4.0, 1.0, 2.0
    det = a * c - b * b
    conic = jnp.asarray([[c / det, a / det, -b / det]])
    lam_max = 3.0 + np.sqrt(2.0)
    expected = np.ceil(3.0 * np.sqrt(lam_max))
    r = np.asarray(screen_radii(conic, jnp.asarray([True])))
    np.testing.assert_allclose(r, [expected])
    # inactive -> 0
    r0 = np.asarray(screen_radii(conic, jnp.asarray([False])))
    np.testing.assert_allclose(r0, [0.0])


def test_trainer_densify_integration():
    """finetune with densification on: pool grows/prunes without recompiling
    per step, history is finite, the returned model is compacted."""
    from gsplat_tpu.config import DensifyConfig

    rng = np.random.default_rng(8)
    arrays = random_splat_arrays(rng, 60)
    target_model = GaussianModel.from_arrays(arrays)
    cams = [orbit_camera(a, width=48, height=32) for a in (0.0, 0.25)]
    views = [(cam, render(target_model, cam, CFG)[0]) for cam in cams]

    perturbed = dict(arrays)
    perturbed["opacity_logits"] = arrays["opacity_logits"] - 1.0
    model = GaussianModel.from_arrays(perturbed)

    tc = TrainConfig(
        steps=9, log_every=4, ssim_weight=0.0,
        densify=DensifyConfig(
            every=3, start=1, grad_threshold=1e-6, pool_factor=1.5,
            opacity_reset_every=0,
        ),
    )
    trainer = Trainer(raster=CFG, train=tc, show_progress=False)
    out, history = trainer.fit(model, views)
    assert np.isfinite([h["loss"] for h in history]).all()
    # compacted: no dead slots in the returned model
    from gsplat_tpu.train import densify as D

    assert out.num_gaussians == int(np.asarray(D.alive_mask(out)).sum())
    assert out.num_gaussians > 0
    img, _ = render(out, cams[0], CFG)
    assert np.isfinite(np.asarray(img)).all()


def test_sh_warmup_schedule():
    """SH warmup trains low-degree first: early steps must be insensitive to
    high-band SH coefficients, late steps sensitive."""
    rng = np.random.default_rng(12)
    arrays = random_splat_arrays(rng, 80)
    cam = orbit_camera(0.1, width=32, height=32)
    target = render(GaussianModel.from_arrays(arrays), cam, CFG)[0]

    base = GaussianModel.from_arrays(arrays)
    pert = dict(arrays)
    pert["sh"] = arrays["sh"].copy()
    pert["sh"][:, 1:, :] += 0.5  # change only bands 1-3
    shifted = GaussianModel.from_arrays(pert)

    tc = TrainConfig(steps=4, ssim_weight=0.0, sh_warmup_every=2, log_every=1)
    trainer = Trainer(raster=CFG, train=tc, show_progress=False)

    # Step 0-1 run at degree 0: the loss must be identical for models that
    # differ only in bands 1+.
    _, hist_a = trainer.fit(base, [(cam, target)], steps=1)
    _, hist_b = trainer.fit(shifted, [(cam, target)], steps=1)
    assert hist_a[0]["loss"] == pytest.approx(hist_b[0]["loss"], rel=1e-6)

    # At full degree the same band shift must change the loss.
    tc_full = TrainConfig(steps=1, ssim_weight=0.0, log_every=1)
    tr_full = Trainer(raster=CFG, train=tc_full, show_progress=False)
    _, full_a = tr_full.fit(base, [(cam, target)], steps=1)
    _, full_b = tr_full.fit(shifted, [(cam, target)], steps=1)
    assert abs(full_a[0]["loss"] - full_b[0]["loss"]) > 1e-5


def test_from_points3d_init_semantics():
    """3DGS initialization from SfM points: dc-band reproduces the point
    color through sh_to_rgb, scales track local point spacing, identity
    rotation, requested opacity."""
    import jax.numpy as jnp

    from gsplat_tpu.ops.sh import sh_to_rgb

    # two clusters with different spacings
    pts = np.array(
        [[0, 0, 0], [0.1, 0, 0], [0, 0.1, 0],
         [5, 5, 5], [6, 5, 5], [5, 6, 5]], np.float64
    )
    rgb = np.array([[255, 0, 0]] * 3 + [[0, 128, 255]] * 3, np.float64)
    m = GaussianModel.from_points3d(pts, rgb, initial_opacity=0.1)
    assert m.num_gaussians == 6
    # color round-trips through the SH evaluator (degree 0, any view dir)
    got = np.asarray(
        sh_to_rgb(m.means, m.sh, jnp.zeros((3,), jnp.float32), degree=0)
    )
    np.testing.assert_allclose(got, rgb / 255.0, atol=2e-3)
    # tight cluster -> smaller splats than the loose cluster
    assert float(m.log_scales[0, 0]) < float(m.log_scales[3, 0])
    # isotropic scales, identity quats, requested opacity
    np.testing.assert_allclose(
        np.asarray(m.log_scales[:, 0]), np.asarray(m.log_scales[:, 1])
    )
    np.testing.assert_allclose(
        np.asarray(m.quats), np.tile([1.0, 0, 0, 0], (6, 1)), atol=0
    )
    np.testing.assert_allclose(np.asarray(m.opacity()), 0.1, rtol=1e-5)


def test_knn_mean_sq_dist_matches_bruteforce():
    from gsplat_tpu.models.gaussians import knn_mean_sq_dist

    rng = np.random.default_rng(11)
    pts = rng.normal(size=(37, 3)).astype(np.float32)
    got = np.asarray(knn_mean_sq_dist(jnp.asarray(pts), k=3, chunk=8))
    d2 = ((pts[:, None] - pts[None]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    want = np.sort(d2, axis=1)[:, :3].mean(1)
    np.testing.assert_allclose(got, want, rtol=1e-5)


@pytest.mark.slow
def test_train_from_points_reaches_psnr_bar(tmp_path):
    """End-to-end train-from-scratch: COLMAP points3D -> from_points3d ->
    densifying Trainer -> PSNR improves substantially over the init render
    (the full 3DGS loop, VERDICT round-2 missing #3)."""
    from gsplat_tpu.config import DensifyConfig
    from gsplat_tpu.io.scene import read_points3d
    from fixtures import write_synthetic_scene

    rng = np.random.default_rng(21)
    root = write_synthetic_scene(str(tmp_path / "scene"), rng, n_gaussians=120)

    # GT views: renders of a reference model (the fixture's noise JPEGs are
    # untrainable); cameras match the on-disk scene.
    target_model = GaussianModel.from_arrays(random_splat_arrays(rng, 150))
    cams = [orbit_camera(a, width=48, height=32) for a in (0.0, 0.15)]
    views = [(cam, render(target_model, cam, CFG)[0]) for cam in cams]

    xyzs, rgbs, _ = read_points3d(root)
    model = GaussianModel.from_points3d(xyzs, rgbs)
    start_psnr = float(psnr(render(model, cams[0], CFG)[0], views[0][1]))

    tc = TrainConfig(
        steps=80, log_every=20, ssim_weight=0.0,
        densify=DensifyConfig(every=25, start=1, grad_threshold=1e-4,
                              pool_factor=2.0),
    )
    trainer = Trainer(raster=CFG, train=tc, show_progress=False)
    out, history = trainer.fit(model, views)
    end_psnr = float(psnr(render(out, cams[0], CFG)[0], views[0][1]))
    assert np.isfinite([h["loss"] for h in history]).all()
    assert end_psnr > start_psnr + 3.0, (start_psnr, end_psnr)


def test_lr_means_decay_schedule():
    """The 3DGS position-lr schedule: with constant unit gradients Adam's
    means update magnitude is ~lr, so after ``lr_means_decay_steps`` updates
    it must have decayed from lr_means to lr_means_final (and clamp there),
    while every other parameter's lr stays constant."""
    import jax
    from gsplat_tpu.train.trainer import make_optimizer

    tc = TrainConfig(lr_means=1e-2, lr_means_final=1e-4, lr_means_decay_steps=50)
    opt = make_optimizer(tc)
    rng = np.random.default_rng(11)
    model = GaussianModel.from_arrays(random_splat_arrays(rng, 16))
    grads = jax.tree.map(jnp.ones_like, model)
    state = opt.init(model)

    mags = []
    sh_mags = []
    for _ in range(60):
        updates, state = opt.update(grads, state, model)
        mags.append(float(jnp.abs(updates.means).mean()))
        sh_mags.append(float(jnp.abs(updates.sh).mean()))
    # update k consumes schedule count k: lr(k) = init * rate^(k/steps)
    assert mags[0] == pytest.approx(1e-2, rel=1e-3)
    assert mags[25] == pytest.approx(1e-2 * 1e-2 ** (25 / 50), rel=0.02)
    assert mags[50] == pytest.approx(1e-4, rel=0.02)
    assert mags[59] == pytest.approx(1e-4, rel=0.02)  # clamped past the window
    assert sh_mags[0] == pytest.approx(sh_mags[59], rel=1e-3)

    with pytest.raises(ValueError):
        make_optimizer(TrainConfig(lr_means_decay_steps=10, lr_means_final=0.0))


def test_scene_extent():
    """3DGS spatial_lr_scale: 1.1x the max camera-center distance from the
    centroid. Identity-rotation cameras put the center at -tvec."""
    from gsplat_tpu.ops.camera import CameraParams
    from gsplat_tpu.train.trainer import scene_extent

    def cam(tvec):
        return CameraParams(
            width=8, height=8, fov_x=1.0, fov_y=1.0, focal_x=4.0, focal_y=4.0,
            qvec=(1.0, 0.0, 0.0, 0.0), tvec=tvec,
        )

    # centers (0,0,0) and (0,0,-4): centroid (0,0,-2), radius 2
    ext = scene_extent([cam((0.0, 0.0, 0.0)), cam((0.0, 0.0, 4.0))])
    assert ext == pytest.approx(2.2, rel=1e-5)
    # a single camera degenerates to the floor, not zero
    assert scene_extent([cam((1.0, 2.0, 3.0))]) > 0.0


def _transparent_views(rng, n=40):
    """A fully transparent model (every alpha below MIN_ALPHA) and a white
    GT view: the rendered image is exactly the background color."""
    arrays = random_splat_arrays(rng, n)
    arrays["opacity_logits"] = np.full_like(arrays["opacity_logits"], -12.0)
    model = GaussianModel.from_arrays(arrays)
    cam = orbit_camera(0.0, width=48, height=32)
    target = jnp.ones((32, 48, 3), jnp.float32)
    return model, cam, target


@pytest.mark.parametrize("background,want_loss", [("black", 1.0), ("white", 0.0)])
def test_trainer_background_compositing(background, want_loss):
    """image + T*bg: a transparent scene against a white GT has L1 loss 1
    on the (reference-default) black background and 0 on white."""
    rng = np.random.default_rng(12)
    model, cam, target = _transparent_views(rng)
    tc = TrainConfig(ssim_weight=0.0, background=background)
    trainer = Trainer(raster=CFG, train=tc, show_progress=False)
    state = trainer.init_state(model)
    _, _, metrics = trainer.train_step(model, state, cam, target)
    assert float(metrics["loss"]) == pytest.approx(want_loss, abs=1e-5)


def test_trainer_background_random_draws():
    """'random' draws a fresh background every step, deterministically per
    trainer seed; invalid choices are rejected up front."""
    tc = TrainConfig(background="random")
    t1 = Trainer(raster=CFG, train=tc, show_progress=False)
    t2 = Trainer(raster=CFG, train=tc, show_progress=False)
    a, b = t1.draw_background(), t1.draw_background()
    assert not np.allclose(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(np.asarray(t2.draw_background()), np.asarray(a))
    assert np.all((np.asarray(a) >= 0) & (np.asarray(a) <= 1))

    with pytest.raises(ValueError):
        Trainer(raster=CFG, train=TrainConfig(background="blue"))


def _resume_fixture(seed=9, n=120):
    rng = np.random.default_rng(seed)
    arrays = random_splat_arrays(rng, n)
    target_model = GaussianModel.from_arrays(arrays)
    cameras = [orbit_camera(a, width=48, height=32) for a in (0.0, 0.2)]
    views = [(cam, render(target_model, cam, CFG)[0]) for cam in cameras]
    perturbed = dict(arrays)
    perturbed["means"] = arrays["means"] + rng.normal(
        0, 0.01, arrays["means"].shape
    ).astype(np.float32)
    return GaussianModel.from_arrays(perturbed), views


def test_trainer_checkpoint_resume_matches_uninterrupted(tmp_path):
    """Train k steps, 'kill', resume: the resumed run must reach EXACTLY the
    uninterrupted run's final parameters (same view rotation, same RNG path,
    f32-bitwise — every op sequence is identical)."""
    model, views = _resume_fixture()
    tc = TrainConfig(steps=6, log_every=100, ssim_weight=0.2, checkpoint_every=3)

    ref_trainer = Trainer(raster=CFG, train=tc, show_progress=False)
    m_ref, _ = ref_trainer.fit(model, views)

    ckpt = str(tmp_path / "run")
    t1 = Trainer(raster=CFG, train=tc, show_progress=False)
    t1.fit(model, views, steps=3, checkpoint_dir=ckpt)  # dies after step 3

    t2 = Trainer(raster=CFG, train=tc, show_progress=False)
    m_res, history = t2.fit(model, views, checkpoint_dir=ckpt, resume=True)
    assert history[0]["step"] >= 3  # really resumed, not restarted
    for a, b in zip(m_ref.tree_flatten()[0], m_res.tree_flatten()[0]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trainer_checkpoint_resume_with_densify(tmp_path):
    """Resume restores the densify pool, viewspace accumulator and RNG key:
    a run killed mid-window must still match the uninterrupted trajectory."""
    from gsplat_tpu.config import DensifyConfig

    model, views = _resume_fixture(seed=11)
    dc = DensifyConfig(every=4, start=0, grad_threshold=1e-6, pool_factor=1.5)
    tc = TrainConfig(
        steps=10, log_every=100, ssim_weight=0.0, checkpoint_every=3, densify=dc
    )

    m_ref, _ = Trainer(raster=CFG, train=tc, show_progress=False).fit(model, views)

    ckpt = str(tmp_path / "run_d")
    # Kill between checkpoint (step 3) and the densify pass (step 4): the
    # accumulated viewspace state at step 3 must survive the restart.
    Trainer(raster=CFG, train=tc, show_progress=False).fit(
        model, views, steps=3, checkpoint_dir=ckpt
    )
    m_res, _ = Trainer(raster=CFG, train=tc, show_progress=False).fit(
        model, views, checkpoint_dir=ckpt, resume=True
    )
    for a, b in zip(m_ref.tree_flatten()[0], m_res.tree_flatten()[0]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trainer_resume_random_background_rng(tmp_path):
    """background='random' draws one host-RNG color per step; resume must
    fast-forward the stream so the sequence continues, not restart it."""
    model, views = _resume_fixture(seed=13)
    tc = TrainConfig(
        steps=4, log_every=100, ssim_weight=0.0, checkpoint_every=2,
        background="random",
    )
    m_ref, _ = Trainer(raster=CFG, train=tc, show_progress=False).fit(model, views)

    ckpt = str(tmp_path / "run_bg")
    Trainer(raster=CFG, train=tc, show_progress=False).fit(
        model, views, steps=2, checkpoint_dir=ckpt
    )
    m_res, _ = Trainer(raster=CFG, train=tc, show_progress=False).fit(
        model, views, checkpoint_dir=ckpt, resume=True
    )
    for a, b in zip(m_ref.tree_flatten()[0], m_res.tree_flatten()[0]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
