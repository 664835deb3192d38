"""Single-video VideoQA demo: decode -> CLIP encode -> FrozenBiLM -> top-5.

Mirrors reference demo_videoqa.py:17-170: ffmpeg decode at 1 fps / 224
centercrop, CLIP ViT-L/14 frame features, subsample/pad to max_feats,
"Question: {q} Answer: [MASK]" prompt, answer-vocab scoring, top-5 answers
with probabilities. A PIL fallback decodes images/GIFs when ffmpeg is
unavailable. CPU-capable like the reference (README.md:275).

Run: python -m frozenbilm_tpu.tasks.demo --combine_datasets none \
       --combine_datasets_val none --question_example "what is happening?" \
       --video_example video.mp4 --load ckpt --clip_weights clip.pth
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from frozenbilm_tpu.config import CLIPVisionConfig, get_args_parser
from frozenbilm_tpu.data.prompts import normalize_question, videoqa_prompt
from frozenbilm_tpu.data.tokenization import answers_to_token_ids, encode_batch, get_tokenizer, strip_sep_tokens
from frozenbilm_tpu.extract.preprocessing import preprocess_frames
from frozenbilm_tpu.extract.video_loader import decode_image_frames, decode_video
from frozenbilm_tpu.data.features import subsample_or_pad
from frozenbilm_tpu.models import build_model
from frozenbilm_tpu.tasks.videoqa import mask_logits
from frozenbilm_tpu.utils.checkpoint import load_any_checkpoint


def extract_demo_features(video_path: str, clip_weights: str, args,
                          vision_cfg=None) -> np.ndarray:
    """Decode + CLIP-encode one video -> (n_frames, features_dim) float32."""
    from frozenbilm_tpu.extract.extract import load_clip_vision, make_encoder

    frames = decode_video(video_path, size=224, framerate=1, centercrop=True)
    if frames is None:
        frames = decode_image_frames(video_path, size=224)
    if frames is None:
        raise RuntimeError(f"could not decode {video_path}")
    cfg = vision_cfg or CLIPVisionConfig(projection_dim=args.features_dim)
    params = load_clip_vision(clip_weights, cfg)
    encode_video = make_encoder(cfg, params, batch_size=min(128, len(frames)),
                                l2_normalize=False)
    return encode_video(preprocess_frames(frames))


def main(args, vision_cfg=None):
    from frozenbilm_tpu.utils.platform import setup_runtime

    setup_runtime(args)
    assert args.question_example and args.video_example

    print("building model")
    tokenizer = get_tokenizer(args)
    vocab = json.load(open(args.msrvtt_vocab_path))
    id2a = {y: x for x, y in vocab.items()}
    args.n_ans = len(vocab)
    bundle = build_model(args)
    params = bundle.init_params(jax.random.PRNGKey(args.seed))
    base_dir = args.tokenizer_path or os.path.join(
        os.environ.get("TRANSFORMERS_CACHE", ""), args.model_name)
    if os.path.isdir(base_dir):
        try:
            params = load_any_checkpoint(base_dir, params, bundle.cfg, bundle.family)
        except FileNotFoundError:
            print(f"no base weights under {base_dir}; using random init")
    if args.load:
        print("loading from", args.load)
        params = load_any_checkpoint(args.load, params, bundle.cfg, bundle.family)

    answers = [a for a, _ in sorted(vocab.items(), key=lambda kv: kv[1])]
    a2tok = answers_to_token_ids(tokenizer, answers, args.max_atokens)
    params = jax.tree.map(jnp.asarray, bundle.set_answer_embeddings(params, a2tok))
    if args.quantize != "none":
        from frozenbilm_tpu.train.partition import apply_quantization

        params = apply_quantization(params, bundle.vt, args.quantize)

    print("extracting visual features")
    feats = extract_demo_features(
        args.video_example, getattr(args, "clip_weights", ""), args, vision_cfg)
    video, video_len = subsample_or_pad(feats, args.max_feats)
    video = jnp.asarray(video)[None]
    video_mask = jnp.asarray(
        (np.arange(args.max_feats) < video_len).astype(np.int32))[None]

    question = normalize_question(args.question_example)
    text = videoqa_prompt(question, tokenizer.mask_token, args.prefix, args.suffix)
    enc = encode_batch(tokenizer, [text], args.max_tokens)
    if not args.suffix:
        enc = strip_sep_tokens(enc, tokenizer.sep_token_id, tokenizer.pad_token_id)

    out = bundle.forward(
        params, bundle.cfg, bundle.vt,
        jnp.asarray(enc["input_ids"]), jnp.asarray(enc["attention_mask"]),
        video, video_mask, mlm=False,
    )
    delay = args.max_feats if args.use_video else 0
    logits = mask_logits(out.logits, jnp.asarray(enc["input_ids"]),
                         tokenizer.mask_token_id, delay)
    probs = np.asarray(jax.nn.softmax(logits, -1))[0]
    k = min(5, len(probs))
    top = np.argsort(-probs)[:k]
    topk_all = [f"{id2a[int(i)]}({probs[i]:.2f})" for i in top]
    print(f"Top 5 answers and scores: {topk_all}")
    return topk_all


def get_demo_parser():
    import argparse

    parser = argparse.ArgumentParser(parents=[get_args_parser()])
    parser.add_argument("--clip_weights", default="",
                        help="CLIP weights for the visual backbone")
    return parser


if __name__ == "__main__":
    main(get_demo_parser().parse_args())
