"""Torch-free video-feature stores + temporal subsampling.

The reference stores CLIP ViT-L/14 frame features either as a monolithic
torch-pickled dict video_id -> (n_frames, 768) (`clipvitl14.pth`,
videoqa_dataset.py:29) or as per-video .npy files for WebVid streaming
(videotext_dataset.py:22-25). At TPU training speed, torch pickles are the
wrong format: we provide
  - DirNpyFeatureStore: the per-video .npy directory layout (bit-compatible)
  - PackedFeatureStore: one memory-mapped (N_total, dim) array + a JSON
    index {video_id: [start, end]} — zero-copy reads, no unpickling;
    produced offline by scripts/convert_features.py from .pth dicts
  - DictFeatureStore: in-memory dict (tests; .pth via gated torch import)

Temporal rule (videoqa_dataset.py:86-99): >max_feats frames -> uniform
stride sample `video[(j*len)//max_feats]`; fewer -> zero-pad, report true
length. Missing/corrupt -> zeros with video_len 0 (videotext) or a single
zero frame (videoqa/mc), matching reference fallbacks.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Tuple

import numpy as np


def subsample_or_pad(video: np.ndarray, max_feats: int) -> Tuple[np.ndarray, int]:
    """Uniform temporal subsample to max_feats, or zero-pad (keeps dtype)."""
    n = len(video)
    dim = video.shape[-1]
    if n > max_feats:
        idx = (np.arange(max_feats) * n) // max_feats
        return np.ascontiguousarray(video[idx]), max_feats
    if n < max_feats:
        pad = np.zeros((max_feats - n, dim), dtype=video.dtype)
        return np.concatenate([video, pad], axis=0), n
    return video, max_feats


class DictFeatureStore:
    """In-memory mapping video_id -> (n_frames, dim) float array."""

    def __init__(self, mapping: Dict[str, np.ndarray], dim: int = 768):
        self._d = mapping
        self.dim = dim

    def __contains__(self, vid) -> bool:
        return vid in self._d

    def get(self, vid) -> Optional[np.ndarray]:
        v = self._d.get(vid)
        return None if v is None else np.asarray(v, dtype=np.float32)

    @classmethod
    def from_pth(cls, path: str, dim: int = 768) -> "DictFeatureStore":
        """Offline loader for the reference's clipvitl14.pth dicts."""
        import torch

        d = torch.load(path, map_location="cpu", weights_only=False)
        return cls({k: v.float().numpy() for k, v in d.items()}, dim=dim)


class DirNpyFeatureStore:
    """Per-video `<dir>/<video_id>.mp4.npy` layout (webvid streaming).

    Reference: videotext_dataset.py:22-25 (`<features_path>/<id>.mp4.npy`).
    """

    def __init__(self, root: str, dim: int = 768, suffix: str = ".mp4.npy"):
        self.root = root
        self.dim = dim
        self.suffix = suffix

    def _path(self, vid) -> str:
        return os.path.join(self.root, f"{vid}{self.suffix}")

    def __contains__(self, vid) -> bool:
        return os.path.exists(self._path(vid))

    def get(self, vid) -> Optional[np.ndarray]:
        path = self._path(vid)
        try:
            return np.load(path).astype(np.float32)
        except Exception:
            return None  # corrupted file -> caller substitutes zeros


class PackedFeatureStore:
    """Memory-mapped packed features: `<base>.bin` (N, dim) + `<base>.idx.json`.

    Index maps video_id -> [start_row, end_row). The .bin file is raw
    little-endian float16/float32; mmap gives zero-copy row slices that feed
    the host->TPU transfer path without deserialization.
    """

    def __init__(self, base: str):
        with open(base + ".idx.json") as f:
            meta = json.load(f)
        self.index: Dict[str, list] = meta["index"]
        self.dim: int = meta["dim"]
        dtype = np.dtype(meta.get("dtype", "float16"))
        n_rows = meta["n_rows"]
        self._data = np.memmap(base + ".bin", dtype=dtype, mode="r", shape=(n_rows, self.dim))

    def __contains__(self, vid) -> bool:
        return str(vid) in self.index

    def get(self, vid) -> Optional[np.ndarray]:
        span = self.index.get(str(vid))
        if span is None:
            return None
        s, e = span
        return np.asarray(self._data[s:e], dtype=np.float32)

    @staticmethod
    def write(base: str, mapping, dim: int = 768, dtype: str = "float16") -> None:
        """Pack a {video_id: (n, dim) array} mapping into .bin + .idx.json."""
        index = {}
        n_rows = 0
        for vid, arr in mapping.items():
            arr = np.asarray(arr)
            index[str(vid)] = [n_rows, n_rows + len(arr)]
            n_rows += len(arr)
        buf = np.memmap(base + ".bin", dtype=np.dtype(dtype), mode="w+", shape=(max(n_rows, 1), dim))
        for vid, arr in mapping.items():
            s, e = index[str(vid)]
            buf[s:e] = np.asarray(arr, dtype=dtype)
        buf.flush()
        with open(base + ".idx.json", "w") as f:
            json.dump({"index": index, "dim": dim, "dtype": dtype, "n_rows": max(n_rows, 1)}, f)


def open_feature_store(path: str, dim: int = 768):
    """Dispatch on path: packed base, .pth (offline torch), or directory."""
    if os.path.isdir(path):
        return DirNpyFeatureStore(path, dim=dim)
    if os.path.exists(path + ".idx.json") or path.endswith(".bin"):
        base = path[:-4] if path.endswith(".bin") else path
        return PackedFeatureStore(base)
    if path.endswith((".pth", ".pt", ".pkl")):
        return DictFeatureStore.from_pth(path, dim=dim)
    raise FileNotFoundError(f"no feature store at {path}")
