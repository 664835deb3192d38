"""CLIP ViT-L/14 frame-feature extraction service (TPU).

Mirrors reference extract/extract.py: csv with columns video_path /
feature_path; 1 fps decode at 224 centercrop; CLIP-normalize; batched
encode_image; fp16 .npy per video; skips existing outputs (restartable,
video_loader.py:51); 10-video block shuffle balances decode load.

TPU-first architecture: the C++ decode service (native/decode_service.cc)
keeps N ffmpeg pipelines ahead of the accelerator; frames are packed into a
fixed-size batch (pad + mask) so XLA compiles ONE encode program; features
come back bf16->fp16.

Run: python -m frozenbilm_tpu.extract.extract --csv videos.csv \
       --clip_weights /path/to/clip.{pth,safetensors,npz-dir}
"""

from __future__ import annotations

import argparse
import math
import os
from functools import partial

import numpy as np

from frozenbilm_tpu.config import CLIPVisionConfig
from frozenbilm_tpu.extract.preprocessing import preprocess_frames
from frozenbilm_tpu.extract.video_loader import (
    block_shuffled_indices,
    decode_command,
    output_dims,
    probe_video,
)


def get_parser():
    parser = argparse.ArgumentParser("CLIP video feature extractor")
    parser.add_argument("--csv", type=str, required=True,
                        help="csv with columns video_path, feature_path")
    parser.add_argument("--batch_size", type=int, default=128)
    parser.add_argument("--half_precision", type=int, default=1)
    parser.add_argument("--num_decoding_thread", type=int, default=3)
    parser.add_argument("--l2_normalize", type=int, default=0)
    parser.add_argument("--feature_dim", type=int, default=768)
    parser.add_argument("--framerate", type=int, default=1)
    parser.add_argument("--size", type=int, default=224)
    parser.add_argument("--clip_weights", type=str, default="",
                        help="CLIP weights: OpenAI/HF .pt(h)/.bin or empty "
                             "for random init (smoke tests)")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--quantize", default="none", choices=["none", "w8a8"],
                        help="int8-quantize the CLIP tower's linear layers "
                             "(W8A8 on the MXU; ops/quant.py)")
    parser.add_argument("--compile_cache", default="",
                        help="persistent XLA compilation-cache dir (restarted "
                             "extraction jobs skip the CLIP compile)")
    return parser


def load_clip_vision(weights_path: str, cfg: CLIPVisionConfig):
    import jax

    from frozenbilm_tpu.config import CLIPTextConfig
    from frozenbilm_tpu.models.clip import (
        clip_params_from_hf,
        clip_params_from_openai,
        init_clip_vision_params,
    )

    if not weights_path:
        return init_clip_vision_params(jax.random.PRNGKey(0), cfg)
    from frozenbilm_tpu.utils.hf_import import load_pth_state_dict

    sd = load_pth_state_dict(weights_path)
    tcfg = CLIPTextConfig()
    if any(k.startswith("visual.") for k in sd):
        vision, _ = clip_params_from_openai(sd, cfg, tcfg)
    else:
        vision, _ = clip_params_from_hf(sd, cfg, tcfg)
    return vision


def make_encoder(cfg: CLIPVisionConfig, params, batch_size: int, l2_normalize: bool):
    import jax
    import jax.numpy as jnp

    from frozenbilm_tpu.models.clip import clip_encode_image

    params = jax.tree.map(
        lambda x: jnp.asarray(x, jnp.bfloat16)
        if np.asarray(x).dtype == np.float32 else jnp.asarray(x),
        params,
    )

    @jax.jit
    def encode(pixels):
        feats = clip_encode_image(params, cfg, pixels.astype(jnp.bfloat16))
        feats = feats.astype(jnp.float32)
        if l2_normalize:
            feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
        return feats

    def encode_video(frames_normalized: np.ndarray) -> np.ndarray:
        n = len(frames_normalized)
        from frozenbilm_tpu.data.loader import OneAhead

        chunks = []
        pipe = OneAhead()  # dispatch batch k+1 before fetching batch k
        for s in range(0, n, batch_size):
            chunk = frames_normalized[s: s + batch_size]
            pad = batch_size - len(chunk)
            if pad:  # fixed batch shape -> one compiled program
                chunk = np.concatenate([chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)])
            prev = pipe.submit((encode(chunk),
                                batch_size - pad if pad else batch_size))
            if prev is not None:
                chunks.append(np.asarray(prev[0])[:prev[1]])
        last = pipe.drain()
        if last is not None:
            chunks.append(np.asarray(last[0])[:last[1]])
        return np.concatenate(chunks)[:n]

    return encode_video


def main(args):
    import pandas as pd

    from frozenbilm_tpu.utils.platform import setup_runtime

    setup_runtime(args)
    csv = pd.read_csv(args.csv)
    cfg = CLIPVisionConfig(image_size=args.size, projection_dim=args.feature_dim)
    params = load_clip_vision(args.clip_weights, cfg)
    if args.quantize != "none":
        import jax

        from frozenbilm_tpu.ops.quant import quantize_tree

        # extraction is pure frozen inference: quantize every eligible linear
        # (patch_embed / final proj are excluded inside quantize_tree)
        params = jax.jit(quantize_tree)(params)
    encode_video = make_encoder(cfg, params, args.batch_size, bool(args.l2_normalize))

    todo = []
    for i in range(len(csv)):
        video_path = csv["video_path"].values[i]
        feature_path = csv["feature_path"].values[i]
        if os.path.isfile(feature_path):
            print(f"Video {video_path} already processed.")
        elif not os.path.isfile(video_path):
            print(f"Missing video: {video_path}")
        else:
            todo.append((video_path, feature_path))

    order = block_shuffled_indices(len(todo), 10, args.seed) if len(todo) > 10 \
        else np.arange(len(todo))

    # probe first (cheap, host-only), then stream decodes through the service
    jobs = []
    for idx in order:
        video_path, feature_path = todo[idx]
        dims = probe_video(video_path)
        if dims is None:
            print(f"ffprobe failed at: {video_path}")
            continue
        h, w, fps = dims
        if fps < 1:
            print(f"Corrupted Frame Rate: {video_path}")
            continue
        height, width = output_dims(h, w, args.size)
        cmd = decode_command(video_path, height, width, args.size, args.framerate)
        jobs.append((video_path, feature_path, cmd))

    from frozenbilm_tpu.extract.native_decoder import DecodeService, frames_from_raw

    n_done = 0
    with DecodeService(n_workers=args.num_decoding_thread, capacity=8) as ds:
        for j, (_, _, cmd) in enumerate(jobs):
            ds.submit(j, cmd)
        ds.finish()
        for job_id, raw in ds:
            video_path, feature_path, _ = jobs[job_id]
            frames = frames_from_raw(raw, args.size, args.size)
            if frames is None:
                print(f"ffmpeg error at: {video_path}")
                continue
            print(f"Computing features of video {n_done + 1}/{len(jobs)}: {video_path}")
            feats = encode_video(preprocess_frames(frames))
            if args.half_precision:
                feats = feats.astype(np.float16)
            os.makedirs(os.path.dirname(feature_path) or ".", exist_ok=True)
            np.save(feature_path, feats)
            n_done += 1
    print(f"extracted {n_done}/{len(jobs)} videos")


if __name__ == "__main__":
    main(get_parser().parse_args())
