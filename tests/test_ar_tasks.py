"""End-to-end tests for the autoregressive drivers (videoqa_ar, pretrain_ar)
with a tiny GPT-Neo and a byte-level GPT-2 tokenizer built offline."""

import json
import os
import pickle

import numpy as np
import pandas as pd
import pytest


def _make_gpt2_tokenizer_files(d):
    """Byte-level GPT-2 tokenizer with no merges: every token = one byte."""
    from transformers.models.gpt2.tokenization_gpt2 import bytes_to_unicode

    symbols = list(bytes_to_unicode().values())
    vocab = {s: i for i, s in enumerate(symbols)}
    vocab["<|endoftext|>"] = len(vocab)
    json.dump(vocab, open(d / "vocab.json", "w"))
    (d / "merges.txt").write_text("#version: 0.2\n")
    return len(vocab)


@pytest.fixture(scope="module")
def ar_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("ar_env")
    rng = np.random.default_rng(0)

    model_dir = root / "gpt-neo-tiny"
    model_dir.mkdir()
    vocab_size = _make_gpt2_tokenizer_files(model_dir)
    json.dump({
        "vocab_size": vocab_size, "hidden_size": 32, "num_layers": 2,
        "num_heads": 4, "window_size": 8, "max_position_embeddings": 128,
        "attention_dropout": 0.0, "resid_dropout": 0.0, "embed_dropout": 0.0,
    }, open(model_dir / "config.json", "w"))

    data = root / "MSVD-QA"
    data.mkdir()
    answers = ["cat", "dog", "owl"]
    n = 4
    pd.DataFrame({
        "video_id": [f"v{i % 2}" for i in range(n)],
        "question": ["what is it"] * n,
        "answer": [answers[i % 3] for i in range(n)],
        "type": [0] * n,
    }).to_csv(data / "val.csv", index=False)
    json.dump({a: i for i, a in enumerate(answers)}, open(data / "vocab.json", "w"))
    feats = {f"v{i}": rng.normal(size=(6, 8)).astype(np.float32) for i in range(2)}
    from frozenbilm_tpu.data.features import PackedFeatureStore

    PackedFeatureStore.write(str(data / "clipvitl14"), feats, dim=8)
    pickle.dump({}, open(data / "subtitles.pkl", "wb"))

    webvid = root / "WebVid"
    webvid.mkdir()
    for split in ("train", "val"):
        pd.DataFrame({"video_id": ["v0", "v1"] * 2,
                      "text": ["a cat", "a dog", "an owl", "a bat"]}).to_csv(
            webvid / f"{split}_captions.csv", index=False)
    feat_dir = root / "webvid_feats"
    feat_dir.mkdir()
    for i in range(2):
        np.save(feat_dir / f"v{i}.mp4.npy", rng.normal(size=(5, 8)).astype(np.float32))
    return root, model_dir, data, webvid, feat_dir


def test_videoqa_ar_eval(ar_env, tmp_path):
    from frozenbilm_tpu.config import get_args_parser
    from frozenbilm_tpu.tasks.videoqa_ar import main

    root, model_dir, data, _, _ = ar_env
    save = tmp_path / "ar_out"
    args = get_args_parser().parse_args([
        "--combine_datasets", "msvd", "--combine_datasets_val", "msvd",
        "--model_name", "gpt-neo-1p3b", "--tokenizer_path", str(model_dir),
        "--msvd_features_path", str(data / "clipvitl14"),
        "--msvd_val_csv_path", str(data / "val.csv"),
        "--msvd_test_csv_path", str(data / "val.csv"),
        "--msvd_train_csv_path", str(data / "val.csv"),
        "--msvd_vocab_path", str(data / "vocab.json"),
        "--msvd_subtitles_path", str(data / "subtitles.pkl"),
        "--features_dim", "8", "--max_feats", "4", "--max_tokens", "48",
        "--max_atokens", "8",  # byte-level: 'cat'+eos = 4 tokens
        "--batch_size_val", "2", "--print_freq", "1",
        "--eval", "--save_dir", str(save),
    ])
    main(args)
    summary = json.load(open(save / "msvdsummary.json"))
    assert 0.0 <= summary["acc1"] <= 1.0
    results = json.load(open(save / "msvd.json"))
    assert len(results) == 4
    assert all(0 <= r["pred"] < 3 for r in results.values())


def test_videoqa_ar_eval_tensor_parallel(ar_env, tmp_path):
    """Same AR eval through the CLI TP path (--mesh_model 2 on the 8-dev mesh)."""
    from frozenbilm_tpu.config import get_args_parser
    from frozenbilm_tpu.tasks.videoqa_ar import main

    root, model_dir, data, _, _ = ar_env
    save = tmp_path / "ar_tp"
    args = get_args_parser().parse_args([
        "--combine_datasets", "msvd", "--combine_datasets_val", "msvd",
        "--model_name", "gpt-neo-1p3b", "--tokenizer_path", str(model_dir),
        "--msvd_features_path", str(data / "clipvitl14"),
        "--msvd_val_csv_path", str(data / "val.csv"),
        "--msvd_test_csv_path", str(data / "val.csv"),
        "--msvd_train_csv_path", str(data / "val.csv"),
        "--msvd_vocab_path", str(data / "vocab.json"),
        "--msvd_subtitles_path", str(data / "subtitles.pkl"),
        "--features_dim", "8", "--max_feats", "4", "--max_tokens", "48",
        "--max_atokens", "8", "--batch_size_val", "2", "--print_freq", "1",
        "--eval", "--save_dir", str(save), "--mesh_model", "2",
    ])
    main(args)
    assert 0.0 <= json.load(open(save / "msvdsummary.json"))["acc1"] <= 1.0


def test_pretrain_ar(ar_env, tmp_path):
    from frozenbilm_tpu.config import get_args_parser
    from frozenbilm_tpu.tasks.pretrain_ar import main

    root, model_dir, _, webvid, feat_dir = ar_env
    save = tmp_path / "ar_pt"
    args = get_args_parser().parse_args([
        "--combine_datasets", "webvid", "--combine_datasets_val", "webvid",
        "--model_name", "gpt-neo-1p3b", "--tokenizer_path", str(model_dir),
        "--webvid_train_csv_path", str(webvid / "train_captions.csv"),
        "--webvid_val_csv_path", str(webvid / "val_captions.csv"),
        "--webvid_features_path", str(feat_dir),
        "--features_dim", "8", "--max_feats", "4", "--max_tokens", "16",
        "--batch_size", "4", "--batch_size_val", "4", "--print_freq", "1",
        "--epochs", "1", "--lr", "1e-3", "--save_dir", str(save),
    ])
    log = main(args)
    assert np.isfinite(log[0]["train_loss"]) and "val_loss" in log[0]
    assert os.path.isdir(save / "checkpoint0000")


def test_videoqa_ar_prefix_equals_tiled(ar_env, tmp_path, monkeypatch):
    """The default prefix-cached scorer and the full-recompute tiled scorer
    produce identical per-qid predictions through the whole driver."""
    import json as _json

    from frozenbilm_tpu.config import get_args_parser
    from frozenbilm_tpu.tasks.videoqa_ar import main

    root, model_dir, data, _, _ = ar_env
    outs = {}
    for mode in ("prefix", "tiled"):
        save = tmp_path / f"ar_{mode}"
        monkeypatch.setenv("FROZENBILM_AR_SCORE", mode)
        args = get_args_parser().parse_args([
            "--combine_datasets", "msvd", "--combine_datasets_val", "msvd",
            "--model_name", "gpt-neo-1p3b", "--tokenizer_path", str(model_dir),
            "--msvd_features_path", str(data / "clipvitl14"),
            "--msvd_val_csv_path", str(data / "val.csv"),
            "--msvd_test_csv_path", str(data / "val.csv"),
            "--msvd_train_csv_path", str(data / "val.csv"),
            "--msvd_vocab_path", str(data / "vocab.json"),
            "--msvd_subtitles_path", str(data / "subtitles.pkl"),
            "--features_dim", "8", "--max_feats", "4", "--max_tokens", "48",
            "--max_atokens", "8",
            "--batch_size_val", "2", "--print_freq", "1",
            "--eval", "--save_dir", str(save),
        ])
        main(args)
        outs[mode] = _json.load(open(save / "msvd.json"))
    assert {k: v["pred"] for k, v in outs["prefix"].items()} == \
           {k: v["pred"] for k, v in outs["tiled"].items()}


def test_videoqa_ar_chunking_invariance(ar_env, tmp_path):
    """Predictions must not depend on batch_size_val: a length group larger
    than the chunk spans several chunks, and each chunk's argmax column c
    maps to answer aids[s+c] (regression: aids[c] attributed the win to the
    wrong answer for every chunk after the first)."""
    import json as _json

    from frozenbilm_tpu.config import get_args_parser
    from frozenbilm_tpu.tasks.videoqa_ar import main

    root, model_dir, data, _, _ = ar_env
    preds = {}
    for chunk in ("8", "1"):  # one chunk per group vs several
        save = tmp_path / f"ar_chunk{chunk}"
        args = get_args_parser().parse_args([
            "--combine_datasets", "msvd", "--combine_datasets_val", "msvd",
            "--model_name", "gpt-neo-1p3b", "--tokenizer_path", str(model_dir),
            "--msvd_features_path", str(data / "clipvitl14"),
            "--msvd_val_csv_path", str(data / "val.csv"),
            "--msvd_test_csv_path", str(data / "val.csv"),
            "--msvd_train_csv_path", str(data / "val.csv"),
            "--msvd_vocab_path", str(data / "vocab.json"),
            "--msvd_subtitles_path", str(data / "subtitles.pkl"),
            "--features_dim", "8", "--max_feats", "4", "--max_tokens", "48",
            "--max_atokens", "8",
            "--batch_size_val", chunk, "--print_freq", "1",
            "--eval", "--save_dir", str(save),
        ])
        main(args)
        res = _json.load(open(save / "msvd.json"))
        preds[chunk] = {k: v["pred"] for k, v in res.items()}
    assert preds["8"] == preds["1"]


def test_videoqa_ar_quantized_prefix_path(ar_env, tmp_path):
    """--quantize w8a8 through the AR driver's default prefix-cached
    scoring: kernel_q dispatch inside prefill + score_with_prefix."""
    import json as _json

    from frozenbilm_tpu.config import get_args_parser
    from frozenbilm_tpu.tasks.videoqa_ar import main

    root, model_dir, data, _, _ = ar_env
    save = tmp_path / "ar_q"
    args = get_args_parser().parse_args([
        "--combine_datasets", "msvd", "--combine_datasets_val", "msvd",
        "--model_name", "gpt-neo-1p3b", "--tokenizer_path", str(model_dir),
        "--msvd_features_path", str(data / "clipvitl14"),
        "--msvd_val_csv_path", str(data / "val.csv"),
        "--msvd_test_csv_path", str(data / "val.csv"),
        "--msvd_train_csv_path", str(data / "val.csv"),
        "--msvd_vocab_path", str(data / "vocab.json"),
        "--msvd_subtitles_path", str(data / "subtitles.pkl"),
        "--features_dim", "8", "--max_feats", "4", "--max_tokens", "48",
        "--max_atokens", "8", "--batch_size_val", "2", "--print_freq", "1",
        "--eval", "--quantize", "w8a8", "--save_dir", str(save),
    ])
    main(args)
    results = _json.load(open(save / "msvd.json"))
    assert len(results) == 4
    assert all(0 <= r["pred"] < 3 for r in results.values())
