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


def test_zero_shot_eval_w8a8_static(task_env, tmp_path):
    """--quantize w8a8_static calibrates activation scales on the first val
    batch, then evaluates with static int8 quant end to end."""
    from frozenbilm_tpu.tasks.videoqa import main

    save = tmp_path / "out_static"
    args = _args(task_env, ["--eval", "--save_dir", str(save),
                            "--quantize", "w8a8_static",
                            "--quant_calibration_batches", "1"])
    main(args)
    summary = json.load(open(save / "msvdsummary.json"))
    assert 0.0 <= summary["acc1"] <= summary["acc10"] <= 1.0
    assert len(json.load(open(save / "msvd.json"))) == 12


def test_finetune_one_epoch(task_env, tmp_path):
    from frozenbilm_tpu.tasks.videoqa import main

    save = tmp_path / "train_out"
    # orbax checkpoints through the driver (load side auto-detects, so the
    # best-model reload in main() exercises the orbax restore too)
    args = _args(task_env, ["--epochs", "2", "--lr", "5e-3",
                            "--save_dir", str(save), "--suffix", ".",
                            "--ckpt_format", "orbax"])
    stats = main(args)
    assert os.path.isdir(save / "best_model" / "params_orbax")
    assert os.path.isdir(save / "best_model")
    assert os.path.exists(save / "log_stats.json")
    # trainable-only checkpoint stays small
    from frozenbilm_tpu.utils.checkpoint import load_params

    tree, meta = load_params(str(save / "best_model"))
    assert "word_embeddings" not in tree.get("embeddings", {})
    assert "linear_video" in tree["embeddings"]
    assert "acc1" in meta


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


def test_ivqa_soft_label_eval(task_env, tmp_path):
    """iVQA 5-annotator soft labels through the full driver: soft gt vectors
    (counts/2 clamped to 1), acc = max agreement over top-k (reference
    videoqa.py:72-75, 178-195)."""
    import pickle

    from frozenbilm_tpu.config import get_args_parser
    from frozenbilm_tpu.data.features import PackedFeatureStore
    from frozenbilm_tpu.tasks.videoqa import main

    root, model_dir, _ = task_env
    data = tmp_path / "iVQA"
    data.mkdir()
    n = 8
    answers = ["cat", "dog", "bird", "park"]
    rows = {
        "video_id": [f"w{i % 2}" for i in range(n)],
        "question": ["what is this"] * n,
        # 2 annotators agree on one answer (double weight), others disagree
        "answer1": [answers[i % 4] for i in range(n)],
        "answer2": [answers[i % 4] for i in range(n)],
        "answer3": [answers[(i + 1) % 4] for i in range(n)],
        "answer4": [answers[(i + 2) % 4] for i in range(n)],
        "answer5": [answers[(i + 3) % 4] for i in range(n)],
    }
    import numpy as np
    import pandas as pd

    for split in ("train", "val", "test"):
        pd.DataFrame(rows).to_csv(data / f"{split}.csv", index=False)
    json.dump({a: i for i, a in enumerate(answers)}, open(data / "vocab.json", "w"))
    rng = np.random.default_rng(1)
    feats = {f"w{i}": rng.normal(size=(7, 16)).astype(np.float32) for i in range(2)}
    PackedFeatureStore.write(str(data / "clipvitl14"), feats, dim=16)
    pickle.dump({}, open(data / "subtitles.pkl", "wb"))

    save = tmp_path / "ivqa_out"
    args = get_args_parser().parse_args([
        "--combine_datasets", "ivqa", "--combine_datasets_val", "ivqa",
        "--model_name", "bert-base-uncased",
        "--tokenizer_path", str(model_dir),
        "--ivqa_features_path", str(data / "clipvitl14"),
        "--ivqa_train_csv_path", str(data / "train.csv"),
        "--ivqa_val_csv_path", str(data / "val.csv"),
        "--ivqa_test_csv_path", str(data / "test.csv"),
        "--ivqa_vocab_path", str(data / "vocab.json"),
        "--ivqa_subtitles_path", str(data / "subtitles.pkl"),
        "--features_dim", "16", "--max_feats", "5", "--max_tokens", "24",
        "--batch_size_val", "4", "--print_freq", "1",
        "--eval", "--test", "--save_dir", str(save),
    ])
    main(args)
    results = json.load(open(save / "ivqa.json"))
    assert len(results) == n
    first = next(iter(results.values()))
    # soft gt: a count vector over the 4-answer vocab, double-weighted answer
    assert isinstance(first["gt"], list) and len(first["gt"]) == 4
    assert max(first["gt"]) == 1.0  # 2 annotators -> count 2/2 clamped to 1
    summary = json.load(open(save / "ivqasummary.json"))
    # every question's gt covers 4 distinct answers; top-10 == all 4 -> acc10
    # equals the max agreement value (1.0 for the double-weighted answer)
    assert summary["acc10"] == 1.0
    assert 0.0 <= summary["acc1"] <= 1.0
