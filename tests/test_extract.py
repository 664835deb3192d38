"""Extraction subsystem tests: C++ decode service (with stub decoder
commands), preprocessing constants, frame geometry, merge CLI, and the
end-to-end extract CLI over fake videos."""

import json
import os
import stat
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest

from frozenbilm_tpu.extract.preprocessing import CLIP_MEAN, CLIP_STD, preprocess_frames
from frozenbilm_tpu.extract.video_loader import (
    block_shuffled_indices,
    decode_command,
    output_dims,
)


def test_output_dims_shortest_side():
    # reference video_loader.py:38-45
    assert output_dims(480, 640, 224) == (224, int(640 * 224 / 480))
    assert output_dims(720, 480, 224) == (int(720 * 224 / 480), 224)
    assert output_dims(224, 224, 224) == (224, 224)


def test_decode_command_filtergraph():
    cmd = decode_command("/v.mp4", 224, 298, 224, framerate=1, centercrop=True)
    vf = cmd[cmd.index("-vf") + 1]
    assert vf == "fps=1,scale=298:224,crop=224:224:37:0"
    assert "rawvideo" in cmd and "rgb24" in cmd


def test_preprocess_matches_reference_constants():
    import torch

    frames = np.random.default_rng(0).integers(0, 256, size=(3, 8, 8, 3)).astype(np.uint8)
    ours = preprocess_frames(frames)
    # reference Preprocessing works in NCHW (extract/preprocessing.py:14-24)
    t = torch.tensor(frames.astype(np.float32)).permute(0, 3, 1, 2) / 255.0
    mean = torch.tensor(CLIP_MEAN).view(1, 3, 1, 1)
    std = torch.tensor(CLIP_STD).view(1, 3, 1, 1)
    ref = ((t - mean) / (std + 1e-8)).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ref, ours, atol=1e-6)


def test_block_shuffle_covers_all():
    idx = block_shuffled_indices(23, 10, seed=0)
    assert sorted(idx.tolist()) == list(range(23))


def test_native_decode_service_stub_commands(tmp_path):
    from frozenbilm_tpu.extract.native_decoder import DecodeService, frames_from_raw

    # stub decoder: writes job-dependent deterministic bytes to stdout
    payloads = {i: bytes([i]) * (4 * 4 * 3 * (i + 1)) for i in range(5)}
    files = {}
    for i, payload in payloads.items():
        p = tmp_path / f"raw_{i}.bin"
        p.write_bytes(payload)
        files[i] = str(p)

    with DecodeService(n_workers=3, capacity=2) as ds:
        for i in range(5):
            ds.submit(i, ["cat", files[i]])
        ds.submit(99, ["false"])  # failing command -> empty result
        ds.submit(98, ["definitely-not-a-binary-xyz"])  # exec failure
        ds.finish()
        got = dict(ds)
    assert set(got) == {0, 1, 2, 3, 4, 98, 99}
    for i in range(5):
        assert got[i] == payloads[i]
        frames = frames_from_raw(got[i], 4, 4)
        assert frames.shape == (i + 1, 4, 4, 3)
        assert (frames == i).all()
    assert got[99] is None and got[98] is None
    assert frames_from_raw(got[99], 4, 4) is None


def test_extract_cli_end_to_end(tmp_path, monkeypatch):
    """Full extract run with a stub ffmpeg/ffprobe pair over 3 'videos'."""
    size = 28
    # stub ffprobe: emits fixed dims; stub ffmpeg: emits N deterministic frames
    ffprobe = tmp_path / "ffprobe"
    ffprobe.write_text(
        "#!/bin/sh\n"
        'echo \'{"streams": [{"codec_type": "video", "width": 56, '
        '"height": 42, "avg_frame_rate": "25/1"}]}\'\n'
    )
    ffmpeg = tmp_path / "ffmpeg"
    ffmpeg.write_text(
        "#!/bin/sh\n"
        "# last path-ish arg before -vf is the input; derive frame count from name\n"
        f"python3 -c \"import sys; sys.stdout.buffer.write(bytes([7]) * ({size}*{size}*3*2))\"\n"
    )
    for f in (ffprobe, ffmpeg):
        f.chmod(f.stat().st_mode | stat.S_IEXEC)

    videos = []
    for i in range(3):
        v = tmp_path / f"video{i}.mp4"
        v.write_bytes(b"fake")
        videos.append(str(v))
    out_dir = tmp_path / "feats"
    out_dir.mkdir()
    csv = tmp_path / "videos.csv"
    pd.DataFrame({
        "video_path": videos,
        "feature_path": [str(out_dir / f"video{i}.mp4.npy") for i in range(3)],
    }).to_csv(csv, index=False)

    monkeypatch.setenv("FFMPEG_BINARY", str(ffmpeg))
    monkeypatch.setenv("FFPROBE_BINARY", str(ffprobe))
    # video_loader caches binary paths at import; reload with the env set
    import importlib

    import frozenbilm_tpu.extract.video_loader as vl

    importlib.reload(vl)
    import frozenbilm_tpu.extract.extract as ex

    importlib.reload(ex)

    args = ex.get_parser().parse_args([
        "--csv", str(csv), "--batch_size", "4", "--size", str(size),
        "--feature_dim", "24", "--num_decoding_thread", "2",
    ])
    # shrink the CLIP tower for CPU speed
    from frozenbilm_tpu.config import CLIPVisionConfig

    monkeypatch.setattr(
        ex, "CLIPVisionConfig",
        lambda image_size, projection_dim: CLIPVisionConfig(
            image_size=image_size, patch_size=7, hidden_size=32, num_layers=2,
            num_heads=4, projection_dim=projection_dim),
    )
    ex.main(args)
    for i in range(3):
        feats = np.load(out_dir / f"video{i}.mp4.npy")
        assert feats.shape == (2, 24)  # 2 frames per stub video
        assert feats.dtype == np.float16
        assert np.isfinite(feats).all()
    # restartable: second run skips everything
    ex.main(args)


def test_merge_features_cli(tmp_path):
    from frozenbilm_tpu.extract.merge_features import get_parser, main

    folder = tmp_path / "raw"
    folder.mkdir()
    rng = np.random.default_rng(0)
    for vid in (3, 17):
        np.save(folder / f"video{vid}.mp4.npy",
                rng.normal(size=(vid % 7 + 1, 8)).astype(np.float16))
    out = tmp_path / "merged"
    main(get_parser().parse_args([
        "--folder", str(folder), "--output_path", str(out),
        "--dataset", "msrvtt", "--pad", "5",
    ]))
    from frozenbilm_tpu.data.features import PackedFeatureStore

    store = PackedFeatureStore(str(out))
    assert 3 in [int(k) for k in store.index]
    feats = store.get(3)
    assert feats.shape == (5, 8)  # padded to 5 seconds
