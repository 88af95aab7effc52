"""Progressive-render video generation (reference C19, rasterize.py:427-466).

The reference snapshots the framebuffer every 1000 gaussians inside its
sequential loop. A tile renderer has no such loop, so the progressive effect
is reproduced by rendering depth-prefixes of the gaussian set: frame k
composites only the nearest k*stride gaussians (same visual: the scene
"builds up" front to back). Frames are PNG'd and encoded with the same
ffmpeg settings (libx264, yuv420p, input framerate 20 -> output 10,
even-dimension fix)."""

from __future__ import annotations

import os
import subprocess
from typing import List, Optional

import numpy as np

FRAMERATE = 20  # rasterize.py:455
OUTPUT_FRAMERATE = 10  # rasterize.py:465
SNAPSHOT_STRIDE = 1000  # rasterize.py:448
TAIL_SECONDS = 2  # rasterize.py:456-457


def save_frame(path: str, image: np.ndarray) -> None:
    from PIL import Image

    arr = (np.clip(np.asarray(image), 0.0, 1.0) * 255.0).astype(np.uint8)
    Image.fromarray(arr).save(path)


def write_frames(output_path: str, frames: List[np.ndarray]) -> List[str]:
    """Write frames (plus the 2s freeze tail) as image_iter_*.png files."""
    image_dir = os.path.join(output_path, "images")
    os.makedirs(image_dir, exist_ok=True)
    paths = []
    seq = list(frames) + [frames[-1]] * (TAIL_SECONDS * FRAMERATE)
    for i, frame in enumerate(seq):
        p = os.path.join(image_dir, f"image_iter_{str(i * SNAPSHOT_STRIDE).zfill(7)}.png")
        save_frame(p, frame)
        paths.append(p)
    return paths


def encode_video(output_path: str, width: int, height: int) -> str:
    """Encode images/image_iter_*.png into video_render.mp4 via ffmpeg
    (libx264/yuv420p/even-dims, rasterize.py:462-466). Falls back to a
    dependency-free MJPEG AVI when ffmpeg is unavailable."""
    import shutil

    if shutil.which("ffmpeg") is None:
        return encode_mjpeg_avi(output_path)
    video_path = os.path.join(output_path, "video_render.mp4")
    if os.path.exists(video_path):
        os.remove(video_path)
    pattern = os.path.join(output_path, "images", "image_iter_*.png")
    cmd = [
        "ffmpeg", "-y",
        "-framerate", str(FRAMERATE),
        "-pattern_type", "glob", "-i", pattern,
        "-r", str(OUTPUT_FRAMERATE),
        "-vcodec", "libx264",
        "-s", f"{width - width % 2}x{height - height % 2}",
        "-pix_fmt", "yuv420p",
        video_path,
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return video_path


def encode_mjpeg_avi(output_path: str) -> str:
    """Pure-Python video encoder: pack the PNG frames as a Motion-JPEG AVI
    (RIFF 'AVI ' + 'MJPG' fourcc — playable by every mainstream player).
    Used when ffmpeg is not on PATH."""
    import glob
    import struct

    from PIL import Image
    import io as _io

    frame_paths = sorted(glob.glob(os.path.join(output_path, "images", "image_iter_*.png")))
    if not frame_paths:
        raise FileNotFoundError(f"no frames under {output_path}/images")

    jpegs = []
    with Image.open(frame_paths[0]) as first:
        width, height = first.size
    for p in frame_paths:
        buf = _io.BytesIO()
        with Image.open(p) as im:
            im.convert("RGB").save(buf, "JPEG", quality=92)
        data = buf.getvalue()
        jpegs.append(data + (b"\x00" if len(data) % 2 else b""))

    fps = OUTPUT_FRAMERATE
    n = len(jpegs)

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        return fourcc + struct.pack("<I", len(payload)) + payload

    def lst(fourcc: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", fourcc + payload)

    avih = struct.pack(
        "<14I", 1_000_000 // fps, 0, 0, 0x10, n, 0, 1, 0, width, height, 0, 0, 0, 0
    )
    strh = (
        b"vids" + b"MJPG"
        # flags, priority, language, initialFrames, scale, rate, start,
        # length, suggestedBufferSize, quality, sampleSize
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n, 0, 0xFFFFFFFF, 0)
        + struct.pack("<4H", 0, 0, width, height)
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG", width * height * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))

    movi_payload = b"".join(chunk(b"00dc", j) for j in jpegs)
    movi = lst(b"movi", movi_payload)

    # idx1 index (offsets relative to the start of 'movi' fourcc + 4)
    idx = b""
    off = 4
    for j in jpegs:
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(j))
        off += 8 + len(j)
    idx1 = chunk(b"idx1", idx)

    riff_payload = b"AVI " + hdrl + movi + idx1
    video_path = os.path.join(output_path, "video_render.avi")
    with open(video_path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", len(riff_payload)) + riff_payload)
    return video_path


def progressive_frames(
    model, camera, cfg, num_frames: Optional[int] = None, stride: Optional[int] = None
):
    """Render progressive build-up frames: frame k shows the k*stride
    nearest gaussians (the reference's every-1000-gaussians snapshots,
    rasterize.py:448-450). ``stride`` defaults to that 1000-gaussian cadence
    when ``num_frames`` is not given.

    Front-to-back compositing factorizes: given the accumulated frame
    (C, T) and the next depth slab's standalone composite (C_s, T_s),
    the extended frame is exactly (C + T*C_s, T*T_s). So each frame only
    rasterizes its *own* slab's pairs (gaussians outside the slab are
    opacity-collapsed, which empties their alpha-cull rect so they emit no
    pairs at all) and total raster work over the whole video equals ONE
    full render — not O(frames x full render). Returns numpy [H, W, 3]
    frames."""
    import jax.numpy as jnp

    from gsplat_tpu.models.gaussians import GaussianModel
    from gsplat_tpu.render.pipeline import preprocess, render
    from gsplat_tpu.utils.progress import progress

    n = model.num_gaussians
    if stride is None:
        stride = SNAPSHOT_STRIDE if num_frames is None else max(1, n // num_frames)
    prep = preprocess(model, camera, cfg)
    # Stable ranks: the renderer breaks depth ties by gaussian id (stable
    # sort in ops/binning.py), so slab partitioning must too — otherwise
    # tied-depth gaussians could composite across slabs in the wrong order.
    order = np.argsort(np.asarray(prep.depth), kind="stable")
    depth_rank = np.empty_like(order)
    depth_rank[order] = np.arange(order.size)
    logits = np.asarray(model.opacity_logits)

    frames = []
    color = None
    trans = None
    bounds = list(range(0, n, stride))
    for k0 in progress(bounds, desc="progressive frames"):
        in_slab = (depth_rank >= k0) & (depth_rank < k0 + stride)
        masked = np.where(in_slab, logits, -30.0).astype(logits.dtype)
        sub = GaussianModel(
            means=model.means,
            log_scales=model.log_scales,
            quats=model.quats,
            opacity_logits=jnp.asarray(masked),
            sh=model.sh,
        )
        c_slab, t_slab = render(sub, camera, cfg)
        if color is None:
            color, trans = c_slab, t_slab
        else:
            color = color + trans[:, :, None] * c_slab
            trans = trans * t_slab
        frames.append(np.asarray(color))
    return frames
