"""End-to-end runs of the how2qa / tvqa / webvid / tgifqa preproc CLIs on
synthetic raw annotation files."""

import json
import os

import numpy as np
import pandas as pd
import pytest


def test_preproc_tvqa_cli(tmp_path):
    from frozenbilm_tpu.preproc.preproc_tvqa import main

    rows = [
        {"qid": i, "vid_name": f"show_clip_{i % 2}", "ts": "1.2-8.4",
         "q": "what?", "a0": "x.", "a1": "y", "a2": "z.", "a3": "w", "a4": "v",
         "answer_idx": i % 5}
        for i in range(6)
    ]
    (tmp_path / "tvqa_train.jsonl").write_text("\n".join(json.dumps(r) for r in rows))
    (tmp_path / "tvqa_test_public.jsonl").write_text(
        "\n".join(json.dumps({k: v for k, v in r.items() if k != "answer_idx"})
                  for r in rows))
    (tmp_path / "tv_subtitles.jsonl").write_text(
        json.dumps({"vid_name": "show_clip_0", "sub": [{"text": "hi"}]}))

    class A:
        data_dir = str(tmp_path)

    main(A())
    train = pd.read_csv(tmp_path / "train.csv")
    assert list(train.columns[:5]) == ["qid", "video_id", "start", "end", "question"]
    assert "a4" in train and "answer_id" in train
    test = pd.read_csv(tmp_path / "test_public.csv")
    assert "answer_id" not in test
    assert os.path.exists(tmp_path / "subtitles.pkl")


def test_preproc_how2qa_cli(tmp_path):
    import torch

    from frozenbilm_tpu.preproc.preproc_how2qa import main

    subs = [{"vid_name": "yt1_0_60", "sub": [{"text": "a"}]},
            {"vid_name": "yt1_60_120", "sub": [{"text": "b"}]}]
    (tmp_path / "subtitles.jsonl").write_text("\n".join(json.dumps(s) for s in subs))
    torch.save({"yt1": torch.randn(120, 8)}, tmp_path / "clipvitl14.pth")
    rows = [{"qid": 0, "vid_name": "yt1_0_60", "ts": "3-9", "q": "q?",
             "a0": "a.", "a1": "b", "a2": "c", "a3": "d", "answer_idx": 1}]
    (tmp_path / "how2qa_train_release.jsonl").write_text(
        "\n".join(json.dumps(r) for r in rows))
    pd.DataFrame({
        "vid_id": ["yt1"], "timesteps": ["[63.0:70.0]"],
        "a1": ["b1"], "a2": ["c2."], "a3": ["d3"], "question": ["why?"], "a0": ["a0"],
    }).to_csv(tmp_path / "how2QA_val_release.csv", index=False)

    class A:
        data_dir = str(tmp_path)
        features_path = ""
        release_dir = ""

    main(A())
    from frozenbilm_tpu.data.features import PackedFeatureStore

    store = PackedFeatureStore(str(tmp_path / "clipvitl14_split"))
    assert store.get("yt1_0_60").shape == (61, 8)
    val = pd.read_csv(tmp_path / "public_val.csv")
    # timestamp 63-70s remaps into the 60-120s clip as 3-10
    assert val["video_id"][0] == "yt1_60_120"
    assert val["start"][0] == 3 and val["end"][0] == 10
    assert val["answer_id"][0] == 0
    train = pd.read_csv(tmp_path / "train.csv")
    assert train["a0"][0] == "a"  # trailing period stripped


def test_preproc_webvid_cli(tmp_path):
    from frozenbilm_tpu.preproc.preproc_webvid import main

    for raw in ("results_10M_train.csv", "results_2M_val.csv"):
        pd.DataFrame({"name": ["a cat", "a dog"], "videoid": [11, 22]}).to_csv(
            tmp_path / raw, index=False)

    class A:
        data_dir = str(tmp_path)

    main(A())
    out = pd.read_csv(tmp_path / "train_captions.csv")
    assert list(out["text"]) == ["a cat", "a dog"]
    assert list(out["video_id"]) == [11, 22]


def test_preproc_tgifqa_cli(tmp_path):
    from frozenbilm_tpu.data.features import PackedFeatureStore
    from frozenbilm_tpu.preproc.preproc_tgifqa import main

    d = tmp_path / "dataset"
    d.mkdir()
    train = pd.DataFrame({"gif_name": ["g1", "g2", "g3"],
                          "question": ["q?"] * 3,
                          "answer": ["cat", "dog", "cat"]})
    train.to_csv(d / "Train_frameqa_question.csv", sep="\t", index=False)
    train.to_csv(d / "Test_frameqa_question.csv", sep="\t", index=False)
    PackedFeatureStore.write(str(tmp_path / "clipvitl14"),
                             {"g1": np.zeros((3, 4), np.float16),
                              "g2": np.zeros((2, 4), np.float16)}, dim=4)

    class A:
        data_dir = str(tmp_path)
        features_path = str(tmp_path / "clipvitl14")

    main(A())
    vocab = json.load(open(tmp_path / "vocab.json"))
    assert vocab == {"cat": 0, "dog": 1}
    # written to the data root, where args.py's tgif_frameqa_*_csv_path
    # defaults point (the reference preproc writes under dataset/ while its
    # own args defaults read the root — we follow the args defaults)
    out = pd.read_csv(tmp_path / "train_frameqa.csv")
    assert set(out["gif_name"]) == {"g1", "g2"}  # g3 has no features
