"""End-to-end tests for the multiple-choice and MLM-pretraining drivers."""

import json
import os
import pickle

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp("mc_env")
    rng = np.random.default_rng(0)

    model_dir = root / "bert-tiny"
    model_dir.mkdir()
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "question", "answer", "is", "it", "yes", "no", "what", "a", "the",
             "cat", "dog", "bird", "fish", "runs", "sleeps", "?", ".", "'",
             "subtitles", "happens", "speech"]
    (model_dir / "vocab.txt").write_text("\n".join(vocab))
    json.dump({
        "vocab_size": len(vocab), "hidden_size": 32, "num_hidden_layers": 2,
        "num_attention_heads": 4, "intermediate_size": 64,
        "max_position_embeddings": 96, "type_vocab_size": 2, "pad_token_id": 0,
    }, open(model_dir / "config.json", "w"))

    data = root / "How2QA"
    data.mkdir()
    n = 8
    for split, name in [("train", "train.csv"), ("val", "public_val.csv")]:
        pd.DataFrame({
            "video_id": [f"v{i % 3}" for i in range(n)],
            "start": [0.0] * n,
            "end": [10.0] * n,
            "question": ["what happens"] * n,
            "a0": ["a cat runs"] * n,
            "a1": ["a dog sleeps"] * n,
            "a2": ["a bird"] * n,
            "a3": ["a fish"] * n,
            "answer_id": [i % 4 for i in range(n)],
            "qid": list(range(n)),
        }).to_csv(data / name, index=False)
    feats = {f"v{i}": rng.normal(size=(12, 16)).astype(np.float32) for i in range(3)}
    from frozenbilm_tpu.data.features import PackedFeatureStore

    PackedFeatureStore.write(str(data / "clipvitl14_split"), feats, dim=16)
    pickle.dump({f"v{i}": [{"start": 0.0, "end": 5.0, "text": "the speech"}]
                 for i in range(3)}, open(data / "subtitles.pkl", "wb"))

    webvid = root / "WebVid"
    webvid.mkdir()
    for split in ("train", "val"):
        pd.DataFrame({
            "video_id": [f"v{i % 3}" for i in range(8)],
            "text": ["a cat runs"] * 4 + ["the dog sleeps"] * 4,
        }).to_csv(webvid / f"{split}_captions.csv", index=False)
    feat_dir = root / "webvid_feats"
    feat_dir.mkdir()
    for i in range(3):
        np.save(feat_dir / f"v{i}.mp4.npy", rng.normal(size=(7, 16)).astype(np.float32))
    return root, model_dir, data, webvid, feat_dir


def _common(model_dir):
    return [
        "--model_name", "bert-base-uncased",
        "--tokenizer_path", str(model_dir),
        "--features_dim", "16", "--max_feats", "5", "--max_tokens", "32",
        "--batch_size", "4", "--batch_size_val", "4", "--print_freq", "1",
    ]


def test_mc_eval_and_train(env, tmp_path):
    from frozenbilm_tpu.config import get_args_parser
    from frozenbilm_tpu.tasks.mc import main

    root, model_dir, data, _, _ = env
    save = tmp_path / "mc_out"
    args = get_args_parser().parse_args([
        "--combine_datasets", "how2qa", "--combine_datasets_val", "how2qa",
        "--how2qa_train_csv_path", str(data / "train.csv"),
        "--how2qa_val_csv_path", str(data / "public_val.csv"),
        "--how2qa_features_path", str(data / "clipvitl14_split"),
        "--how2qa_subtitles_path", str(data / "subtitles.pkl"),
        "--eval", "--save_dir", str(save),
    ] + _common(model_dir))
    main(args)
    results = json.load(open(save / "how2qa.json"))
    assert len(results) == 8
    acc = json.load(open(save / "acc_val.json"))["acc"]
    assert 0.0 <= acc <= 1.0
    preds = [r["pred"] for r in results.values()]
    assert all(0 <= p < 4 for p in preds)


def test_mc_train_step(env, tmp_path):
    from frozenbilm_tpu.config import get_args_parser
    from frozenbilm_tpu.tasks.mc import main

    root, model_dir, data, _, _ = env
    save = tmp_path / "mc_train"
    args = get_args_parser().parse_args([
        "--combine_datasets", "how2qa", "--combine_datasets_val", "how2qa",
        "--how2qa_train_csv_path", str(data / "train.csv"),
        "--how2qa_val_csv_path", str(data / "public_val.csv"),
        "--how2qa_features_path", str(data / "clipvitl14_split"),
        "--how2qa_subtitles_path", str(data / "subtitles.pkl"),
        "--epochs", "1", "--lr", "1e-3", "--save_dir", str(save),
    ] + _common(model_dir))
    main(args)
    assert os.path.isdir(save / "best_model")


def test_pretrain_train_and_eval(env, tmp_path):
    from frozenbilm_tpu.config import get_args_parser
    from frozenbilm_tpu.tasks.pretrain import main

    root, model_dir, _, webvid, feat_dir = env
    save = tmp_path / "pt_out"
    args = get_args_parser().parse_args(_common(model_dir) + [
        "--combine_datasets", "webvid", "--combine_datasets_val", "webvid",
        "--webvid_train_csv_path", str(webvid / "train_captions.csv"),
        "--webvid_val_csv_path", str(webvid / "val_captions.csv"),
        "--webvid_features_path", str(feat_dir),
        "--epochs", "1", "--lr", "1e-3", "--save_dir", str(save),
        "--batch_size", "8", "--batch_size_val", "8",  # divisible by the 8-dev mesh
    ])
    log = main(args)
    assert len(log) == 1
    assert np.isfinite(log[0]["train_loss"])
    assert "val_loss" in log[0]
    assert os.path.isdir(save / "checkpoint0000")
    assert os.path.exists(save / "log.txt")


def test_pretrain_sequence_parallel(env, tmp_path):
    """--sequence_parallel: MLM pretrain with the token axis sharded over a
    2-way model axis (BERT family), end-to-end through the CLI."""
    from frozenbilm_tpu.config import get_args_parser
    from frozenbilm_tpu.tasks.pretrain import main

    root, model_dir, _, webvid, feat_dir = env
    save = tmp_path / "pt_sp"
    args = get_args_parser().parse_args(_common(model_dir) + [
        "--combine_datasets", "webvid", "--combine_datasets_val", "webvid",
        "--webvid_train_csv_path", str(webvid / "train_captions.csv"),
        "--webvid_val_csv_path", str(webvid / "val_captions.csv"),
        "--webvid_features_path", str(feat_dir),
        "--epochs", "1", "--lr", "1e-3", "--save_dir", str(save),
        "--batch_size", "8", "--batch_size_val", "8",
        "--mesh_model", "2", "--sequence_parallel",
    ])
    log = main(args)
    assert np.isfinite(log[0]["train_loss"])
    assert "val_loss" in log[0]


def test_mc_train_uses_dropout(env):
    """MC fine-tuning must train under dropout like the reference (mc.py:35
    model.train()): the loss_fn threads the step rng into the forward, so
    different rngs give different losses and rng=None is deterministic."""
    import jax
    import jax.numpy as jnp

    from frozenbilm_tpu.config import get_args_parser
    from frozenbilm_tpu.models import build_model
    from frozenbilm_tpu.tasks.mc import make_mc_steps

    root, model_dir, data, _, _ = env
    args = get_args_parser().parse_args(_common(model_dir) + [
        "--combine_datasets", "how2qa", "--combine_datasets_val", "how2qa",
    ])
    args.n_ans = 2
    bundle = build_model(args)
    params = bundle.init_params(jax.random.PRNGKey(0))

    mc, B, L, F = 2, 2, 10, 5
    rng = np.random.default_rng(0)
    ids = rng.integers(5, 20, size=(mc, B, L))
    ids[:, :, 4] = 4  # one [MASK] per row (vocab id 4 in the fixture)
    batch = {
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.ones((mc, B, L), jnp.int32),
        "video": jnp.asarray(rng.normal(size=(B, F, 16)), jnp.float32),
        "video_mask": jnp.ones((B, F), jnp.int32),
        "answer_id": jnp.asarray([0, 1]),
    }
    loss_fn, _ = make_mc_steps(bundle, mask_token_id=4, n_cand=4)
    l1 = float(loss_fn(params, batch, jax.random.PRNGKey(1))[0])
    l2 = float(loss_fn(params, batch, jax.random.PRNGKey(2))[0])
    d1 = float(loss_fn(params, batch, None)[0])
    d2 = float(loss_fn(params, batch, None)[0])
    assert l1 != l2, "dropout rng not threaded into the MC forward"
    assert d1 == d2, "deterministic path must be rng-free"
    assert np.isfinite([l1, l2, d1]).all()


def test_mc_hidden_test_dumps_predictions_only(env, tmp_path):
    """TVQA-style hidden test set (answer_id == -1): the driver dumps
    {qid: pred} with no accuracy (reference mc.py:180, 205-207)."""
    import numpy as np
    import pandas as pd
    import pickle

    from frozenbilm_tpu.config import get_args_parser
    from frozenbilm_tpu.data.features import PackedFeatureStore
    from frozenbilm_tpu.tasks.mc import main

    root, model_dir, _, _, _ = env
    data = tmp_path / "TVQA"
    data.mkdir()
    n = 6
    rng = np.random.default_rng(0)
    base = {
        "video_id": [f"t{i % 2}" for i in range(n)],
        "start": [0.0] * n,
        "end": [8.0] * n,
        "question": ["what happens"] * n,
        **{f"a{k}": [f"a cat runs {k}"] * n for k in range(5)},
        "qid": list(range(n)),
    }
    pd.DataFrame({**base, "answer_id": [i % 5 for i in range(n)]}).to_csv(
        data / "val.csv", index=False)
    pd.DataFrame({**base, "answer_id": [-1] * n}).to_csv(
        data / "test.csv", index=False)
    feats = {f"t{i}": rng.normal(size=(10, 16)).astype(np.float32) for i in range(2)}
    PackedFeatureStore.write(str(data / "feats"), feats, dim=16)
    pickle.dump({f"t{i}": [{"start": 0.0, "end": 4.0, "text": "the speech"}]
                 for i in range(2)}, open(data / "subtitles.pkl", "wb"))

    save = tmp_path / "out"
    args = get_args_parser().parse_args(_common(model_dir) + [
        "--combine_datasets", "tvqa", "--combine_datasets_val", "tvqa",
        "--tvqa_train_csv_path", str(data / "val.csv"),
        "--tvqa_val_csv_path", str(data / "val.csv"),
        "--tvqa_test_csv_path", str(data / "test.csv"),
        "--tvqa_features_path", str(data / "feats"),
        "--tvqa_subtitles_path", str(data / "subtitles.pkl"),
        "--eval", "--test", "--save_dir", str(save),
    ])
    main(args)
    results = json.load(open(save / "tvqa.json"))
    assert len(results) == n
    assert all(isinstance(v, int) and 0 <= v < 5 for v in results.values())
