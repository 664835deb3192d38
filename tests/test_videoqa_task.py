"""End-to-end videoqa driver test on synthetic data: zero-shot eval and a
1-epoch fine-tune, exercising the full CLI -> dataset -> jitted step ->
metrics -> JSON artifact pipeline (SURVEY.md §4 'Integration')."""

import json
import os

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def task_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("videoqa_env")
    rng = np.random.default_rng(0)

    # tiny wordpiece tokenizer + tiny bert config in one "model dir"
    model_dir = root / "bert-tiny"
    model_dir.mkdir()
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "question", "answer", "what", "is", "this", "doing", "a", "the",
             "cat", "dog", "bird", "park", "run", "sleep", "?", ".", ":", "subtitles"]
    (model_dir / "vocab.txt").write_text("\n".join(vocab))
    json.dump({
        "vocab_size": len(vocab), "hidden_size": 32, "num_hidden_layers": 2,
        "num_attention_heads": 4, "intermediate_size": 64,
        "max_position_embeddings": 64, "type_vocab_size": 2, "pad_token_id": 0,
    }, open(model_dir / "config.json", "w"))

    data_dir = root / "MSVD-QA"
    data_dir.mkdir()
    n = 12
    answers = ["cat", "dog", "bird", "park"]
    rows = {
        "video_id": [f"v{i % 4}" for i in range(n)],
        "question": ["what is this"] * n,
        "answer": [answers[i % 4] for i in range(n)],
        "type": [i % 2 for i in range(n)],
    }
    for split in ("train", "val", "test"):
        pd.DataFrame(rows).to_csv(data_dir / f"{split}.csv", index=False)
    json.dump({a: i for i, a in enumerate(answers)}, open(data_dir / "vocab.json", "w"))

    feats = {f"v{i}": rng.normal(size=(rng.integers(3, 20), 16)).astype(np.float32)
             for i in range(4)}
    from frozenbilm_tpu.data.features import PackedFeatureStore

    PackedFeatureStore.write(str(data_dir / "clipvitl14"), feats, dim=16)

    import pickle
    pickle.dump({"v0": "the cat is doing a run"}, open(data_dir / "subtitles.pkl", "wb"))
    return root, model_dir, data_dir


def _args(task_env, extra):
    from frozenbilm_tpu.config import get_args_parser

    root, model_dir, data_dir = task_env
    base = [
        "--combine_datasets", "msvd", "--combine_datasets_val", "msvd",
        "--model_name", "bert-base-uncased",
        "--tokenizer_path", str(model_dir),
        "--msvd_features_path", str(data_dir / "clipvitl14"),
        "--msvd_train_csv_path", str(data_dir / "train.csv"),
        "--msvd_val_csv_path", str(data_dir / "val.csv"),
        "--msvd_test_csv_path", str(data_dir / "test.csv"),
        "--msvd_vocab_path", str(data_dir / "vocab.json"),
        "--msvd_subtitles_path", str(data_dir / "subtitles.pkl"),
        "--features_dim", "16", "--max_feats", "5", "--max_tokens", "24",
        "--batch_size", "4", "--batch_size_val", "6", "--print_freq", "1",
    ]
    return get_args_parser().parse_args(base + extra)


def test_zero_shot_eval(task_env, tmp_path):
    from frozenbilm_tpu.tasks.videoqa import main

    save = tmp_path / "out"
    args = _args(task_env, ["--eval", "--save_dir", str(save)])
    stats = main(args)
    summary = json.load(open(save / "msvdsummary.json"))
    assert 0.0 <= summary["acc1"] <= 1.0
    assert summary["acc1"] <= summary["acc10"] <= 1.0
    results = json.load(open(save / "msvd.json"))
    assert len(results) == 12
    first = next(iter(results.values()))
    assert set(first) >= {"pred", "gt", "type", "sub", "acc1", "acc10"}
    # with 4 answers, top-10 covers everything
    assert summary["acc10"] == 1.0
    # subtitle + type breakdowns present
    assert "acc_sub" in summary and "what" in summary


def test_finetune_one_epoch(task_env, tmp_path):
    from frozenbilm_tpu.tasks.videoqa import main

    save = tmp_path / "train_out"
    args = _args(task_env, ["--epochs", "2", "--lr", "5e-3",
                            "--save_dir", str(save), "--suffix", "."])
    stats = main(args)
    assert os.path.isdir(save / "best_model")
    assert os.path.exists(save / "log_stats.json")
    # trainable-only checkpoint stays small
    import numpy as np

    with np.load(save / "best_model" / "params.npz") as z:
        keys = list(z.files)
    assert all("word_embeddings" not in k for k in keys)
    assert any("linear_video" in k for k in keys)


def test_encode_rejects_prompts_without_mask():
    """Truncation that drops the [MASK] must fail loudly (the reference's
    boolean indexing crashes on a shape mismatch, videoqa.py:166; the argmax
    locator would otherwise silently score position 0)."""
    import pytest

    from frozenbilm_tpu.tasks.videoqa import _check_one_mask

    ids = np.array([[5, 6, 4, 7], [5, 6, 7, 8]])  # row 1 lost its mask (id 4)
    with pytest.raises(ValueError, match="row 1 has 0"):
        _check_one_mask(ids, mask_token_id=4)
    _check_one_mask(ids[:1], mask_token_id=4)  # one mask -> ok
    _check_one_mask(ids, mask_token_id=None)  # AR tokenizers have no mask
