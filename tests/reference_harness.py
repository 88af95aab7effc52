"""Drive the torch reference at /root/reference as a parity oracle.

The reference repo is mounted read-only in the build environment; when it is
absent (e.g. CI elsewhere) every parity test skips. A tiny ``plyfile`` stub
is installed because the environment doesn't ship that package and the
reference imports it at module scope; the stub is only a namespace — the
fake PLY object below feeds numpy arrays straight through.

This module contains *test harness glue only*: all substantive math is
executed by the reference's own functions.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest

REFERENCE_PATH = "/root/reference"


def _install_plyfile_stub():
    if "plyfile" in sys.modules:
        return
    stub = types.ModuleType("plyfile")

    class PlyData:  # pragma: no cover - never instantiated in tests
        @staticmethod
        def read(path):
            raise NotImplementedError

    class PlyElement:
        pass

    stub.PlyData = PlyData
    stub.PlyElement = PlyElement
    sys.modules["plyfile"] = stub


def load_reference():
    """Import the reference modules, or skip the calling test."""
    import os

    if not os.path.isdir(REFERENCE_PATH):
        pytest.skip("reference repo not available")
    _install_plyfile_stub()
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import matplotlib

    matplotlib.use("Agg")
    import rasterize as ref_rasterize  # noqa: E402
    import spherical_harmonics as ref_sh  # noqa: E402
    import utils as ref_utils  # noqa: E402
    import data_reader as ref_data_reader  # noqa: E402

    return ref_rasterize, ref_sh, ref_utils, ref_data_reader


class FakePlyElement:
    """Duck-typed stand-in for plyfile's element: name -> numpy array."""

    def __init__(self, fields):
        self._fields = fields

    def __getitem__(self, key):
        return self._fields[key]


class FakePlyData:
    def __init__(self, fields):
        self.elements = [FakePlyElement(fields)]


def arrays_to_fake_ply(arrays) -> FakePlyData:
    """Raw-parameter arrays -> the Inria PLY field layout the reference reads."""
    fields = {
        "x": arrays["means"][:, 0],
        "y": arrays["means"][:, 1],
        "z": arrays["means"][:, 2],
        "opacity": arrays["opacity_logits"],
    }
    for i in range(3):
        fields[f"scale_{i}"] = arrays["log_scales"][:, i]
    for i in range(4):
        fields[f"rot_{i}"] = arrays["quats"][:, i]
    for c in range(3):
        fields[f"f_dc_{c}"] = arrays["sh"][:, 0, c]
        for j in range(15):
            fields[f"f_rest_{c * 15 + j}"] = arrays["sh"][:, j + 1, c]
    return FakePlyData(fields)


def reference_render(arrays, camera):
    """Replay the reference driver's compute path (rasterize.py:353-452) on
    in-memory data, returning (image [H, W, 3], transmittance [H, W]) as
    numpy in display orientation.
    """
    import torch

    ref_rasterize, ref_sh, ref_utils, _ = load_reference()
    R = ref_rasterize

    plydata = arrays_to_fake_ply(arrays)
    width, height = camera.width, camera.height
    focals = np.array([camera.focal_x, camera.focal_y])

    means = torch.tensor(arrays["means"]).float()
    cov3d = R.get_covariance_matrix_from_mesh(plydata).float()
    opacity = torch.sigmoid(torch.tensor(arrays["opacity_logits"]))

    qvec = torch.tensor(np.asarray(camera.qvec))
    tvec = torch.tensor(np.asarray(camera.tvec))
    world_to_camera = R.get_world_to_camera_matrix(qvec, tvec).transpose(0, 1)
    projection = R.get_projection_matrix(camera.fov_x, camera.fov_y).transpose(0, 1)
    full_proj = (world_to_camera.unsqueeze(0).bmm(projection.unsqueeze(0))).squeeze(0)

    colors = ref_utils.read_color_components(plydata)
    rgb = ref_sh.sh_to_rgb(means, colors, world_to_camera, degree=3)

    cam_means = R.project_to_camera_space(means, world_to_camera)
    points = means @ full_proj[:3, :] + full_proj[-1, :]
    cull = cam_means[:, 2] < 0.2
    points[cull] = 0.0
    p_w = 1.0 / (points[:, -1] + 0.0000001)
    p_proj = points[:, :-1] * p_w[:, None]

    cov2d = R.compute_2d_covariance(
        cov3d, cam_means, camera.tan_fov_x, camera.tan_fov_y, focals, world_to_camera
    )
    cov2d[cull] = 0.0
    screen_means = (
        (p_proj[:, :2] + 1.0) * torch.tensor([width, height]).float() - 1.0
    ) / 2
    bboxes_blocks = R.compute_covering_bbox(screen_means, cov2d, width, height)

    det = cov2d[:, 0, 0] * cov2d[:, 1, 1] - cov2d[:, 1, 0] * cov2d[:, 0, 1]
    det_inv = torch.where(det == 0, 0, 1 / det)
    sigmas = torch.stack(
        [cov2d[:, 1, 1] * det_inv, cov2d[:, 0, 0] * det_inv, -cov2d[:, 0, 1] * det_inv],
        dim=-1,
    )
    bs = R.BLOCK_SIZE
    bboxes = torch.stack(
        [
            torch.clamp(bboxes_blocks[:, 0] * bs, 0, width - 1),
            torch.clamp(bboxes_blocks[:, 1] * bs, 0, height - 1),
            torch.clamp(bboxes_blocks[:, 2] * bs, 0, width - 1),
            torch.clamp(bboxes_blocks[:, 3] * bs, 0, height - 1),
        ],
        dim=-1,
    )
    bbox_area = (bboxes[:, 2] - bboxes[:, 0]) * (bboxes[:, 3] - bboxes[:, 1])
    order = torch.sort(cam_means[:, 2]).indices

    screen = torch.zeros((int(width), int(height), 3)).float()
    opacity_buffer = torch.ones((int(width), int(height))).float()
    for gidx in order:
        if bbox_area[gidx] == 0 or torch.any(sigmas[gidx] == 0):
            continue
        screen, opacity_buffer = R.rasterize_gaussian(
            gidx, bboxes, screen, screen_means, sigmas, rgb, opacity_buffer, opacity
        )
    return (
        screen.transpose(1, 0).numpy(),
        opacity_buffer.transpose(1, 0).numpy(),
    )


def reference_render_grads(arrays, camera, w_img, w_trans):
    """Replay the reference forward on torch *leaf* tensors with
    ``requires_grad=True`` and backprop ``loss = sum(image * w_img) +
    sum(trans * w_trans)`` through torch autograd (the reference forward is
    differentiable end-to-end even though the repo never calls .backward(),
    rasterize.py:255-305).

    Returns (loss, {means, log_scales, quats, opacity_logits, sh} grads as
    numpy). The PLY-reading helpers build tensors from numpy internally
    (rasterize.py:97-112, utils.py:21-31) which severs autograd, so their
    activation plumbing (exp / normalize / sigmoid / SH stacking) is replayed
    here on the leaves — every substantive math op is still the reference's.
    """
    import torch

    ref_rasterize, ref_sh, ref_utils, _ = load_reference()
    R = ref_rasterize

    leaves = {
        "means": torch.tensor(arrays["means"], requires_grad=True),
        "log_scales": torch.tensor(arrays["log_scales"], requires_grad=True),
        "quats": torch.tensor(arrays["quats"], requires_grad=True),
        "opacity_logits": torch.tensor(arrays["opacity_logits"], requires_grad=True),
        "sh": torch.tensor(arrays["sh"], requires_grad=True),
    }
    means = leaves["means"]
    width, height = camera.width, camera.height
    focals = np.array([camera.focal_x, camera.focal_y])

    # get_covariance_matrix_from_mesh (rasterize.py:89-120) on leaf tensors:
    scales = torch.exp(leaves["log_scales"].T)  # [3, N], as the ref stacks it
    unit_quaternions = torch.nn.functional.normalize(
        leaves["quats"].T, p=2.0, dim=0
    )
    rotation_matrices = R.quaternion_to_rotation_matrix(unit_quaternions).permute(2, 0, 1)
    n = means.shape[0]
    indices = torch.arange(3)
    scale_matrices = torch.zeros((n, 3, 3))
    scale_matrices[:, indices, indices] = scales.T
    M = rotation_matrices @ scale_matrices
    cov3d = M @ torch.permute(M, (0, 2, 1))

    opacity = torch.sigmoid(leaves["opacity_logits"])
    colors = leaves["sh"]  # read_color_components returns exactly [N, 16, 3]

    qvec = torch.tensor(np.asarray(camera.qvec))
    tvec = torch.tensor(np.asarray(camera.tvec))
    world_to_camera = R.get_world_to_camera_matrix(qvec, tvec).transpose(0, 1)
    projection = R.get_projection_matrix(camera.fov_x, camera.fov_y).transpose(0, 1)
    full_proj = (world_to_camera.unsqueeze(0).bmm(projection.unsqueeze(0))).squeeze(0)

    rgb = ref_sh.sh_to_rgb(means, colors, world_to_camera, degree=3)

    cam_means = R.project_to_camera_space(means, world_to_camera)
    points = means @ full_proj[:3, :] + full_proj[-1, :]
    cull = cam_means[:, 2] < 0.2
    points = torch.where(cull[:, None], torch.zeros_like(points), points)
    p_w = 1.0 / (points[:, -1] + 0.0000001)
    p_proj = points[:, :-1] * p_w[:, None]

    cov2d = R.compute_2d_covariance(
        cov3d, cam_means, camera.tan_fov_x, camera.tan_fov_y, focals, world_to_camera
    )
    cov2d = torch.where(cull[:, None, None], torch.zeros_like(cov2d), cov2d)
    screen_means = (
        (p_proj[:, :2] + 1.0) * torch.tensor([width, height]).float() - 1.0
    ) / 2
    bboxes_blocks = R.compute_covering_bbox(
        screen_means.detach(), cov2d.detach(), width, height
    )

    det = cov2d[:, 0, 0] * cov2d[:, 1, 1] - cov2d[:, 1, 0] * cov2d[:, 0, 1]
    det_inv = torch.where(det == 0, torch.zeros_like(det), 1 / det)
    sigmas = torch.stack(
        [cov2d[:, 1, 1] * det_inv, cov2d[:, 0, 0] * det_inv, -cov2d[:, 0, 1] * det_inv],
        dim=-1,
    )
    bs = R.BLOCK_SIZE
    bboxes = torch.stack(
        [
            torch.clamp(bboxes_blocks[:, 0] * bs, 0, width - 1),
            torch.clamp(bboxes_blocks[:, 1] * bs, 0, height - 1),
            torch.clamp(bboxes_blocks[:, 2] * bs, 0, width - 1),
            torch.clamp(bboxes_blocks[:, 3] * bs, 0, height - 1),
        ],
        dim=-1,
    )
    bbox_area = (bboxes[:, 2] - bboxes[:, 0]) * (bboxes[:, 3] - bboxes[:, 1])
    order = torch.sort(cam_means[:, 2].detach()).indices

    screen = torch.zeros((int(width), int(height), 3)).float()
    opacity_buffer = torch.ones((int(width), int(height))).float()
    for gidx in order:
        if bbox_area[gidx] == 0 or torch.any(sigmas[gidx] == 0):
            continue
        screen, opacity_buffer = R.rasterize_gaussian(
            gidx, bboxes, screen, screen_means, sigmas, rgb, opacity_buffer, opacity
        )

    image = screen.transpose(1, 0)  # display orientation [H, W, 3]
    trans = opacity_buffer.transpose(1, 0)
    loss = (image * torch.tensor(np.asarray(w_img))).sum() + (
        trans * torch.tensor(np.asarray(w_trans))
    ).sum()
    loss.backward()
    return float(loss.detach()), {k: v.grad.numpy() for k, v in leaves.items()}


def reference_preprocess(arrays, camera):
    """Expose the reference's intermediate per-gaussian quantities for
    component-level parity checks."""
    import torch

    ref_rasterize, ref_sh, ref_utils, _ = load_reference()
    R = ref_rasterize
    plydata = arrays_to_fake_ply(arrays)
    means = torch.tensor(arrays["means"]).float()
    cov3d = R.get_covariance_matrix_from_mesh(plydata).float()
    qvec = torch.tensor(np.asarray(camera.qvec))
    tvec = torch.tensor(np.asarray(camera.tvec))
    w2c_t = R.get_world_to_camera_matrix(qvec, tvec).transpose(0, 1)
    proj_t = R.get_projection_matrix(camera.fov_x, camera.fov_y).transpose(0, 1)
    full_proj = w2c_t @ proj_t
    colors = ref_utils.read_color_components(plydata)
    rgb = ref_sh.sh_to_rgb(means, colors, w2c_t, degree=3)
    cam_means = R.project_to_camera_space(means, w2c_t)
    points = means @ full_proj[:3, :] + full_proj[-1, :]
    cull = cam_means[:, 2] < 0.2
    points[cull] = 0.0
    p_w = 1.0 / (points[:, -1] + 0.0000001)
    p_proj = points[:, :-1] * p_w[:, None]
    cov2d = R.compute_2d_covariance(
        cov3d,
        cam_means,
        camera.tan_fov_x,
        camera.tan_fov_y,
        np.array([camera.focal_x, camera.focal_y]),
        w2c_t,
    )
    cov2d[cull] = 0.0
    screen_means = (
        (p_proj[:, :2] + 1.0) * torch.tensor([camera.width, camera.height]).float() - 1.0
    ) / 2
    return {
        "w2c_t": w2c_t.numpy(),
        "full_proj_t": full_proj.numpy(),
        "cov3d": cov3d.numpy(),
        "rgb": rgb.numpy(),
        "cam_means": cam_means.numpy(),
        "screen_means": screen_means.numpy(),
        "cov2d": cov2d.numpy(),
    }
