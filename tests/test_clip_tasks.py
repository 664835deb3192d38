"""End-to-end tests for the CLIP baselines and the single-video demo."""

import json
import pickle

import numpy as np
import pandas as pd
import pytest


def _make_clip_tokenizer_files(d):
    """Tiny byte-level CLIP tokenizer; EOT has the highest id (argmax pool)."""
    from transformers.models.gpt2.tokenization_gpt2 import bytes_to_unicode

    symbols = list(bytes_to_unicode().values())
    vocab = {}
    for s in symbols:
        vocab[s] = len(vocab)
    for s in symbols:
        vocab[s + "</w>"] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    json.dump(vocab, open(d / "vocab.json", "w"))
    (d / "merges.txt").write_text("#version: 0.2\n")


@pytest.fixture(scope="module")
def clip_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("clip_env")
    rng = np.random.default_rng(0)
    tok_dir = root / "clip-tok"
    tok_dir.mkdir()
    _make_clip_tokenizer_files(tok_dir)

    data = root / "MSVD-QA"
    data.mkdir()
    answers = ["cat", "dog", "owl"]
    pd.DataFrame({
        "video_id": [f"v{i % 2}" for i in range(4)],
        "question": ["what is it"] * 4,
        "answer": [answers[i % 3] for i in range(4)],
        "type": [0] * 4,
    }).to_csv(data / "val.csv", index=False)
    json.dump({a: i for i, a in enumerate(answers)}, open(data / "vocab.json", "w"))
    feats = {f"v{i}": rng.normal(size=(1, 24)).astype(np.float32) for i in range(2)}
    from frozenbilm_tpu.data.features import PackedFeatureStore

    PackedFeatureStore.write(str(data / "clipvitl14"), feats, dim=24)
    pickle.dump({}, open(data / "subtitles.pkl", "wb"))

    # MC data for mc_clip
    pd.DataFrame({
        "video_id": ["v0", "v1"],
        "start": [0.0, 0.0], "end": [5.0, 5.0],
        "question": ["what happens", "who is it"],
        "a0": ["a cat", "alice"], "a1": ["a dog", "bob"],
        "a2": ["an owl", "carol"], "a3": ["a bat", "dave"],
        "answer_id": [0, 1], "qid": [0, 1],
    }).to_csv(data / "mc_val.csv", index=False)
    pickle.dump({"v0": [], "v1": []}, open(data / "mc_subs.pkl", "wb"))
    return root, tok_dir, data


def _clip_args(tok_dir, data, extra):
    from frozenbilm_tpu.config import get_args_parser

    return get_args_parser().parse_args([
        "--combine_datasets", "msvd", "--combine_datasets_val", "msvd",
        "--tokenizer_path", str(tok_dir),
        "--msvd_features_path", str(data / "clipvitl14"),
        "--msvd_val_csv_path", str(data / "val.csv"),
        "--msvd_test_csv_path", str(data / "val.csv"),
        "--msvd_train_csv_path", str(data / "val.csv"),
        "--msvd_vocab_path", str(data / "vocab.json"),
        "--msvd_subtitles_path", str(data / "subtitles.pkl"),
        "--features_dim", "24", "--max_feats", "1", "--batch_size_val", "2",
        "--print_freq", "1", "--eval",
    ] + extra)


def test_videoqa_clip_baseline(clip_env, tmp_path, monkeypatch):
    import frozenbilm_tpu.tasks.videoqa_clip as task

    root, tok_dir, data = clip_env
    # shrink the random text tower
    from frozenbilm_tpu.config import CLIPTextConfig

    monkeypatch.setattr(
        task, "CLIPTextConfig",
        lambda projection_dim: CLIPTextConfig(
            vocab_size=515, context_length=77, hidden_size=32, num_layers=2,
            num_heads=4, projection_dim=projection_dim),
    )
    save = tmp_path / "out"
    args = _clip_args(tok_dir, data, ["--save_dir", str(save)])
    task.main(args)
    summary = json.load(open(save / "msvdsummary.json"))
    assert 0.0 <= summary["acc1"] <= summary["acc10"] <= 1.0
    assert len(json.load(open(save / "msvd.json"))) == 4

    # quantized text tower rides the same driver (--quantize w8a8)
    save_q = tmp_path / "out_q"
    args_q = _clip_args(tok_dir, data, ["--save_dir", str(save_q),
                                        "--quantize", "w8a8"])
    task.main(args_q)
    assert 0.0 <= json.load(open(save_q / "msvdsummary.json"))["acc1"] <= 1.0


def test_mc_clip_baseline(clip_env, tmp_path, monkeypatch):
    import frozenbilm_tpu.tasks.mc_clip as task
    import frozenbilm_tpu.tasks.videoqa_clip as vq

    root, tok_dir, data = clip_env
    from frozenbilm_tpu.config import CLIPTextConfig

    monkeypatch.setattr(
        task, "CLIPTextConfig",
        lambda projection_dim: CLIPTextConfig(
            vocab_size=515, context_length=77, hidden_size=32, num_layers=2,
            num_heads=4, projection_dim=projection_dim),
    )
    save = tmp_path / "mc_out"
    args = _clip_args(tok_dir, data, [
        "--save_dir", str(save),
        "--how2qa_val_csv_path", str(data / "mc_val.csv"),
        "--how2qa_train_csv_path", str(data / "mc_val.csv"),
        "--how2qa_features_path", str(data / "clipvitl14"),
        "--how2qa_subtitles_path", str(data / "mc_subs.pkl"),
    ])
    args.combine_datasets_val = ["how2qa"]
    task.main(args)
    assert 0.0 <= json.load(open(save / "acc_val.json"))["acc"] <= 1.0
    preds = json.load(open(save / "how2qa.json"))
    assert len(preds) == 2 and all(0 <= r["pred"] < 4 for r in preds.values())


def test_demo_end_to_end(clip_env, tmp_path):
    """Full demo: GIF decode (PIL fallback) -> tiny CLIP -> tiny BERT -> top-5."""
    from PIL import Image

    import frozenbilm_tpu.tasks.demo as demo
    from frozenbilm_tpu.config import CLIPVisionConfig

    root, _, data = clip_env
    # a small animated gif as the "video"
    gif = tmp_path / "clip.gif"
    rng = np.random.default_rng(0)
    frames = [Image.fromarray(rng.integers(0, 255, size=(64, 80, 3), dtype=np.uint8))
              for _ in range(3)]
    frames[0].save(gif, save_all=True, append_images=frames[1:])

    # tiny bert model dir (tokenizer + config)
    model_dir = tmp_path / "bert-tiny"
    model_dir.mkdir()
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "question", "answer", "what", "is", "it", "cat", "dog", "owl", "?", "."]
    (model_dir / "vocab.txt").write_text("\n".join(vocab))
    json.dump({
        "vocab_size": len(vocab), "hidden_size": 32, "num_hidden_layers": 2,
        "num_attention_heads": 4, "intermediate_size": 64,
        "max_position_embeddings": 64, "type_vocab_size": 2, "pad_token_id": 0,
    }, open(model_dir / "config.json", "w"))

    parser = demo.get_demo_parser()
    args = parser.parse_args([
        "--combine_datasets", "msvd", "--combine_datasets_val", "msvd",
        "--model_name", "bert-base-uncased", "--tokenizer_path", str(model_dir),
        "--msvtt_vocab_path" if False else "--msrvtt_vocab_path", str(data / "vocab.json"),
        "--features_dim", "24", "--max_feats", "2", "--max_tokens", "24",
        "--question_example", "what is it", "--video_example", str(gif),
    ])
    small_vision = CLIPVisionConfig(image_size=224, patch_size=32, hidden_size=32,
                                    num_layers=2, num_heads=4, projection_dim=24)
    top = demo.main(args, vision_cfg=small_vision)
    assert len(top) == 3  # vocab has only 3 answers
    assert all("(" in t for t in top)
