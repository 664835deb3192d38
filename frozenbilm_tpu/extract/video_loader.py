"""Video frame decoding via ffmpeg subprocesses (torch-free).

Behavioral spec: reference extract/video_loader.py —
  - ffprobe for dims/avg fps (:27-37); fps < 1 or probe failure -> skip with
    a placeholder (:54-68)
  - decode filter graph: fps=<framerate> -> bilinear scale shortest side to
    `size` -> centercrop size x size -> rawvideo rgb24 on a pipe (:71-95)

Binaries are resolved from $FFMPEG_BINARY / $FFPROBE_BINARY (default
"ffmpeg"/"ffprobe") so tests can substitute stub decoders and deployments
can point at a hermetic ffmpeg build. The hot multi-video path runs through
the native C++ prefetch service (native_decoder.py); this module provides
the command construction + a synchronous fallback.
"""

from __future__ import annotations

import json
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

FFMPEG = os.environ.get("FFMPEG_BINARY", "ffmpeg")
FFPROBE = os.environ.get("FFPROBE_BINARY", "ffprobe")


def probe_video(video_path: str) -> Optional[Tuple[int, int, float]]:
    """(height, width, fps) or None on failure (video_loader.py:27-37)."""
    try:
        out = subprocess.run(
            [FFPROBE, "-v", "error", "-print_format", "json", "-show_streams",
             video_path],
            capture_output=True, timeout=120, check=True,
        ).stdout
        info = json.loads(out)
        stream = next(s for s in info["streams"] if s.get("codec_type") == "video")
        num, denum = stream["avg_frame_rate"].split("/")
        fps = int(num) / int(denum)
        return int(stream["height"]), int(stream["width"]), fps
    except Exception:
        return None


def output_dims(h: int, w: int, size: int) -> Tuple[int, int]:
    """Scale shortest side to `size`, keep aspect (video_loader.py:38-45)."""
    if h >= w:
        return int(h * size / w), size
    return size, int(w * size / h)


def decode_command(video_path: str, height: int, width: int, size: int,
                   framerate: int = 1, centercrop: bool = True) -> List[str]:
    """ffmpeg argv reproducing the reference filter graph (video_loader.py:71-83)."""
    filters = [f"fps={framerate}", f"scale={width}:{height}"]
    if centercrop:
        x = int((width - size) / 2.0)
        y = int((height - size) / 2.0)
        filters.append(f"crop={size}:{size}:{x}:{y}")
    return [
        FFMPEG, "-nostdin", "-v", "error", "-i", video_path,
        "-vf", ",".join(filters),
        "-f", "rawvideo", "-pix_fmt", "rgb24", "pipe:1",
    ]


def decode_video(video_path: str, size: int = 224, framerate: int = 1,
                 centercrop: bool = True) -> Optional[np.ndarray]:
    """Synchronous decode -> (n_frames, size, size, 3) uint8 or None.

    Mirrors the reference's skip-on-failure semantics (zeros placeholder is
    the caller's decision, like video_loader.py:54-90).
    """
    dims = probe_video(video_path)
    if dims is None:
        return None
    h, w, fps = dims
    if fps < 1:
        return None
    height, width = output_dims(h, w, size)
    cmd = decode_command(video_path, height, width, size, framerate, centercrop)
    try:
        raw = subprocess.run(cmd, capture_output=True, timeout=1800, check=True).stdout
    except Exception:
        return None
    out_h, out_w = (size, size) if centercrop else (height, width)
    n = len(raw) // (out_h * out_w * 3)
    if n == 0:
        return None
    return np.frombuffer(raw[: n * out_h * out_w * 3], np.uint8).reshape(n, out_h, out_w, 3)


def decode_image_frames(path: str, size: int = 224) -> Optional[np.ndarray]:
    """PIL fallback for images/GIFs (demo path when ffmpeg is unavailable):
    bilinear shortest-side resize + centercrop, 1 frame/s equivalent for
    stills (single frame)."""
    try:
        from PIL import Image

        img = Image.open(path)
        frames = []
        n = getattr(img, "n_frames", 1)
        for i in range(n):
            if n > 1:
                img.seek(i)
            f = img.convert("RGB")
            w, h = f.size
            oh, ow = output_dims(h, w, size)
            f = f.resize((ow, oh), Image.BILINEAR)
            left = int((ow - size) / 2.0)
            top = int((oh - size) / 2.0)
            f = f.crop((left, top, left + size, top + size))
            frames.append(np.asarray(f, np.uint8))
        return np.stack(frames)
    except Exception:
        return None


def block_shuffled_indices(n: int, block: int = 10, seed: Optional[int] = None) -> np.ndarray:
    """Shuffle fixed-size blocks of indices to balance decode load across
    workers (reference random_sequence_shuffler.py:5-25). Unlike the
    reference, padding duplicates are dropped instead of re-yielding item 0."""
    idx = np.arange(n)
    if n % block:
        idx = np.concatenate([idx, np.full(block - n % block, -1)])
    blocks = idx.reshape(-1, block)
    rng = np.random.default_rng(seed)
    rng.shuffle(blocks)
    flat = blocks.reshape(-1)
    return flat[flat >= 0]
