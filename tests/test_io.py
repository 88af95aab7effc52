"""IO round-trips: PLY splat checkpoints and COLMAP binary/text files."""

import numpy as np

from gsplat_tpu.io import colmap
from gsplat_tpu.io.ply import load_splat_arrays, read_ply, save_splat_arrays
from gsplat_tpu.io.scene import read_scene

from fixtures import random_splat_arrays, write_synthetic_scene


def test_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    arrays = random_splat_arrays(rng, 57)
    path = str(tmp_path / "ckpt.ply")
    save_splat_arrays(path, arrays)
    loaded = load_splat_arrays(path)
    for key in arrays:
        np.testing.assert_array_equal(loaded[key], arrays[key].astype(np.float32))


def test_ply_reader_matches_reference_field_semantics(tmp_path):
    """Our PLY loader's [N, 16, 3] SH layout must equal the reference's
    read_color_components (utils.py:10-31)."""
    import pytest

    from reference_harness import arrays_to_fake_ply, load_reference

    _, _, ref_utils, _ = load_reference()
    rng = np.random.default_rng(1)
    arrays = random_splat_arrays(rng, 23)
    path = str(tmp_path / "ckpt.ply")
    save_splat_arrays(path, arrays)
    loaded = load_splat_arrays(path)
    ref_colors = ref_utils.read_color_components(arrays_to_fake_ply(arrays)).numpy()
    np.testing.assert_allclose(loaded["sh"], ref_colors, rtol=0, atol=0)


def test_ply_ascii_format(tmp_path):
    path = str(tmp_path / "tri.ply")
    with open(path, "w") as f:
        f.write(
            "ply\nformat ascii 1.0\nelement vertex 2\n"
            "property float x\nproperty float y\nproperty double z\n"
            "end_header\n1 2 3\n4 5 6\n"
        )
    props = read_ply(path)
    np.testing.assert_allclose(props["x"], [1, 4])
    np.testing.assert_allclose(props["z"], [3, 6])
    assert props["z"].dtype == np.float64


def test_colmap_binary_roundtrip(tmp_path):
    cameras = {
        1: colmap.Camera(
            id=1, model="PINHOLE", width=640, height=480,
            params=np.array([500.0, 505.0, 320.0, 240.0]),
        )
    }
    images = {
        5: colmap.BaseImage(
            id=5,
            qvec=np.array([0.9, 0.1, 0.2, 0.3]),
            tvec=np.array([1.0, -2.0, 3.0]),
            camera_id=1,
            name="IMG_0001.JPG",
            xys=np.array([[1.5, 2.5], [3.5, 4.5]]),
            point3D_ids=np.array([7, -1], dtype=np.int64),
        )
    }
    cam_path = str(tmp_path / "cameras.bin")
    img_path = str(tmp_path / "images.bin")
    colmap.write_intrinsics_binary(cam_path, cameras)
    colmap.write_extrinsics_binary(img_path, images)

    cams = colmap.read_intrinsics_binary(cam_path)
    assert cams[1].model == "PINHOLE"
    assert cams[1].width == 640 and cams[1].height == 480
    np.testing.assert_allclose(cams[1].params, cameras[1].params)

    imgs = colmap.read_extrinsics_binary(img_path)
    img = imgs[5]
    assert img.name == "IMG_0001.JPG"
    assert img.camera_id == 1
    np.testing.assert_allclose(img.qvec, images[5].qvec)
    np.testing.assert_allclose(img.tvec, images[5].tvec)
    np.testing.assert_allclose(img.xys, images[5].xys)
    np.testing.assert_array_equal(img.point3D_ids, images[5].point3D_ids)


def test_colmap_binary_matches_reference_parser(tmp_path):
    """Our writers produce files the *reference's* parser reads identically."""
    from reference_harness import load_reference

    _, _, _, ref_data_reader = load_reference()
    rng = np.random.default_rng(2)
    write_synthetic_scene(str(tmp_path), rng, n_gaussians=10)

    ref_imgs = ref_data_reader.read_extrinsics_binary(str(tmp_path / "sparse/0/images.bin"))
    ref_cams = ref_data_reader.read_intrinsics_binary(str(tmp_path / "sparse/0/cameras.bin"))
    our_imgs, our_cams = read_scene(str(tmp_path))

    assert set(ref_imgs) == set(our_imgs)
    for k in ref_imgs:
        np.testing.assert_allclose(ref_imgs[k].qvec, our_imgs[k].qvec)
        np.testing.assert_allclose(ref_imgs[k].tvec, our_imgs[k].tvec)
        assert ref_imgs[k].name == our_imgs[k].name
    for k in ref_cams:
        np.testing.assert_allclose(ref_cams[k].params, our_cams[k].params)
        assert ref_cams[k].model == our_cams[k].model


def test_colmap_text_readers(tmp_path):
    cam_txt = tmp_path / "cameras.txt"
    cam_txt.write_text(
        "# comment\n1 PINHOLE 640 480 500.0 505.0 320.0 240.0\n"
    )
    cams = colmap.read_intrinsics_text(str(cam_txt))
    assert cams[1].width == 640
    np.testing.assert_allclose(cams[1].params, [500.0, 505.0, 320.0, 240.0])

    img_txt = tmp_path / "images.txt"
    img_txt.write_text(
        "# comment\n"
        "5 0.9 0.1 0.2 0.3 1.0 -2.0 3.0 1 IMG_0001.JPG\n"
        "1.5 2.5 7 3.5 4.5 -1\n"
    )
    imgs = colmap.read_extrinsics_text(str(img_txt))
    np.testing.assert_allclose(imgs[5].xys, [[1.5, 2.5], [3.5, 4.5]])
    np.testing.assert_array_equal(imgs[5].point3D_ids, [7, -1])


def test_points3d_binary(tmp_path):
    """points3D.bin writer-free check against a hand-built buffer."""
    import struct

    path = str(tmp_path / "points3D.bin")
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", 2))
        f.write(struct.pack("<QdddBBBd", 1, 0.5, 1.5, 2.5, 10, 20, 30, 0.25))
        f.write(struct.pack("<Q", 2) + struct.pack("<iiii", 1, 0, 2, 3))
        f.write(struct.pack("<QdddBBBd", 2, -1.0, -2.0, -3.0, 1, 2, 3, 0.5))
        f.write(struct.pack("<Q", 0))
    xyzs, rgbs, errors = colmap.read_points3D_binary(path)
    np.testing.assert_allclose(xyzs, [[0.5, 1.5, 2.5], [-1.0, -2.0, -3.0]])
    np.testing.assert_allclose(rgbs, [[10, 20, 30], [1, 2, 3]])
    np.testing.assert_allclose(errors[:, 0], [0.25, 0.5])

    from reference_harness import load_reference

    _, _, _, ref_data_reader = load_reference()
    rx, rr, re = ref_data_reader.read_points3D_binary(path)
    np.testing.assert_allclose(xyzs, rx)
    np.testing.assert_allclose(rgbs, rr)
    np.testing.assert_allclose(errors, re)


def test_from_colmap_single_focal_models():
    """SIMPLE_PINHOLE-family intrinsics store (f, cx, cy): fy must come from
    params[0], not params[1] (which is cx)."""
    import numpy as np

    from gsplat_tpu.io import colmap
    from gsplat_tpu.ops.camera import CameraParams

    image = colmap.BaseImage(
        id=1, qvec=np.array([1.0, 0, 0, 0]), tvec=np.zeros(3), camera_id=1,
        name="x.jpg", xys=np.zeros((0, 2)), point3D_ids=np.zeros(0, np.int64),
    )
    simple = colmap.Camera(
        id=1, model="SIMPLE_PINHOLE", width=640, height=480,
        params=np.array([500.0, 320.0, 240.0]),
    )
    cam = CameraParams.from_colmap(image, simple, 640, 480)
    assert cam.focal_x == cam.focal_y == 500.0
    pinhole = colmap.Camera(
        id=1, model="PINHOLE", width=640, height=480,
        params=np.array([500.0, 510.0, 320.0, 240.0]),
    )
    cam2 = CameraParams.from_colmap(image, pinhole, 640, 480)
    assert (cam2.focal_x, cam2.focal_y) == (500.0, 510.0)
    # FOV stores (fx, fy, cx, cy, omega): two-focal despite the 5th param
    fov = colmap.Camera(
        id=1, model="FOV", width=640, height=480,
        params=np.array([500.0, 510.0, 320.0, 240.0, 0.9]),
    )
    cam3 = CameraParams.from_colmap(image, fov, 640, 480)
    assert (cam3.focal_x, cam3.focal_y) == (500.0, 510.0)
