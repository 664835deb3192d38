"""Input-pipeline benchmark at pretraining scale (VERDICT r1 #7).

Builds a synthetic WebVid-scale corpus — 200k caption rows over 20k unique
videos in one memory-mapped PackedFeatureStore — and drives the REAL
tasks/pretrain machinery (loader thread -> tokenize -> MLM train_step on
DeBERTa-v2-xlarge bf16) on the default backend, measuring how much wall
time the accelerator spends waiting on the host.

Loader occupancy = (time the train loop blocks on batch fetch + host
encode + device_put) / total wall time. The target is <10%: the background
prefetch thread and in-jit MLM corruption should hide the host entirely.

Prints ONE JSON line with steps/sec, samples/sec, loader_occupancy, and the
extrapolated 200k-sample epoch time.

Usage: python scripts/pipeline_bench.py [--steps 200] [--batch_size 128]
       [--small]   (tiny model/corpus; used by tests)
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
import time


def build_corpus(root: str, n_samples: int, n_videos: int, features_dim: int,
                 frames_per_video: int = 15):
    """Synthetic captions CSV + packed fp16 feature store + wordpiece vocab."""
    import numpy as np
    import pandas as pd

    from frozenbilm_tpu.data.features import PackedFeatureStore

    rng = np.random.default_rng(0)
    words = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + [
        f"word{i:03d}" for i in range(400)]
    vocab_dir = os.path.join(root, "model")
    os.makedirs(vocab_dir, exist_ok=True)
    with open(os.path.join(vocab_dir, "vocab.txt"), "w") as f:
        f.write("\n".join(words))

    captions = [" ".join(rng.choice(words[5:], size=rng.integers(8, 16)))
                for _ in range(2048)]  # sample pool; rows draw from it
    vids = [f"v{i}" for i in range(n_videos)]
    pd.DataFrame({
        "video_id": rng.choice(vids, size=n_samples),
        "text": rng.choice(captions, size=n_samples),
    }).to_csv(os.path.join(root, "train.csv"), index=False)

    # one packed store: n_videos x frames x dim fp16, written in chunks
    feats = {v: rng.normal(size=(frames_per_video, features_dim)
                           ).astype(np.float16) for v in vids}
    PackedFeatureStore.write(os.path.join(root, "feats"), feats,
                             dim=features_dim, dtype="float16")
    return os.path.join(root, "train.csv"), os.path.join(root, "feats"), vocab_dir


def main(argv=None):
    parser = argparse.ArgumentParser("pipeline_bench")
    parser.add_argument("--steps", type=int, default=200)
    parser.add_argument("--batch_size", type=int, default=128)
    parser.add_argument("--n_samples", type=int, default=200_000)
    parser.add_argument("--n_videos", type=int, default=20_000)
    parser.add_argument("--small", action="store_true",
                        help="tiny model + corpus (CI)")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from transformers import BertTokenizer

    from frozenbilm_tpu.config import DebertaV2Config, VideoTextConfig
    from frozenbilm_tpu.data.loader import DataLoader
    from frozenbilm_tpu.data.tokenization import encode_batch
    from frozenbilm_tpu.data.videotext import VideoTextDataset, videotext_collate
    from frozenbilm_tpu.data.features import PackedFeatureStore
    from frozenbilm_tpu.models.deberta import deberta_forward, init_deberta_params
    from frozenbilm_tpu.ops.masking import get_mask
    from frozenbilm_tpu.train.optim import make_optimizer, make_schedule
    from frozenbilm_tpu.train.trainer import Trainer, create_train_state, make_mlm_loss_fn

    if args.small:
        args.steps = min(args.steps, 4)
        args.batch_size = min(args.batch_size, 8)
        args.n_samples = min(args.n_samples, 512)
        args.n_videos = min(args.n_videos, 32)
        cfg = DebertaV2Config(
            vocab_size=512, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=128,
            max_position_embeddings=64, position_buckets=16)
        feat_dim, max_feats, max_tokens = 32, 4, 24
    else:
        cfg = DebertaV2Config()  # 0.9B xlarge
        feat_dim, max_feats, max_tokens = 768, 10, 64

    tmp = tempfile.mkdtemp(prefix="pipe_bench_")
    t_build0 = time.perf_counter()
    csv_path, feats_base, vocab_dir = build_corpus(
        tmp, args.n_samples, args.n_videos, feat_dim)
    build_s = time.perf_counter() - t_build0

    tokenizer = BertTokenizer.from_pretrained(vocab_dir, local_files_only=True)
    store = PackedFeatureStore(feats_base)
    ds = VideoTextDataset(csv_path, store, max_feats, feat_dim)

    def transform(batch):
        # tokenize in the prefetch thread so host text work overlaps device
        enc = encode_batch(tokenizer, batch["text"], max_tokens)
        return {
            "input_ids": enc["input_ids"],
            "attention_mask": enc["attention_mask"],
            "special_tokens_mask": enc["special_tokens_mask"],
            "video": batch["video"],
            "video_len": batch["video_len"],
        }

    loader = DataLoader(ds, args.batch_size, collate_fn=videotext_collate,
                        shuffle=True, drop_last=True, transform=transform,
                        prefetch=4)

    vt = VideoTextConfig(features_dim=feat_dim, max_feats=max_feats,
                         ds_factor_attn=8, ds_factor_ff=8, n_ans=0)
    params = jax.jit(lambda k: init_deberta_params(k, cfg, vt))(jax.random.PRNGKey(0))
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params)
    tx = make_optimizer(make_schedule(3e-4, args.steps, "", 0.1))
    loss_fn = make_mlm_loss_fn(
        deberta_forward, cfg, vt, mask_token_id=4, vocab_size=cfg.vocab_size,
        pad_token_id=0, mlm_probability=0.15)
    trainer = Trainer(loss_fn, tx)
    state, frozen = create_train_state(params, vt, tx)

    rng = jax.random.PRNGKey(0)
    wait_s = 0.0
    done = 0
    warmup = 2
    it = iter(loader)
    t_total0 = None
    while done < args.steps + warmup:
        t0 = time.perf_counter()
        try:
            batch = next(it)
        except StopIteration:
            it = iter(loader)
            batch = next(it)
        db = {
            "input_ids": jnp.asarray(batch["input_ids"]),
            "attention_mask": jnp.asarray(batch["attention_mask"]),
            "special_tokens_mask": jnp.asarray(batch["special_tokens_mask"]),
            "video": jnp.asarray(batch["video"]),
            "video_mask": jnp.asarray(get_mask(jnp.asarray(batch["video_len"]),
                                               batch["video"].shape[1])),
        }
        t1 = time.perf_counter()
        state, metrics = trainer.train_step(state, frozen, db, rng)
        loss = float(metrics["loss"])  # host fetch = real completion barrier
        assert np.isfinite(loss)
        done += 1
        if done == warmup:
            t_total0 = time.perf_counter()
            wait_s = 0.0
        elif done > warmup:
            wait_s += t1 - t0

    total_s = time.perf_counter() - t_total0
    steps_per_sec = args.steps / total_s
    samples_per_sec = steps_per_sec * args.batch_size
    occupancy = wait_s / total_s
    print(json.dumps({
        "metric": "pretrain_input_pipeline",
        "steps_per_sec": round(steps_per_sec, 3),
        "samples_per_sec": round(samples_per_sec, 1),
        "loader_occupancy": round(occupancy, 4),
        "epoch_200k_minutes": round(200_000 / samples_per_sec / 60, 2),
        "corpus_build_s": round(build_s, 1),
        "batch_size": args.batch_size,
        "steps_measured": args.steps,
        "device_kind": jax.devices()[0].device_kind,
    }))


if __name__ == "__main__":
    main()
