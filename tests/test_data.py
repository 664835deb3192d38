"""Data-layer parity vs the reference dataset classes on shared synthetic
fixtures, plus loader/feature-store/tokenization unit tests."""

import json
import os
import pickle

import numpy as np
import pandas as pd
import pytest

from frozenbilm_tpu.data.features import (
    DictFeatureStore,
    PackedFeatureStore,
    subsample_or_pad,
)
from frozenbilm_tpu.data.loader import DataLoader
from frozenbilm_tpu.data.mc import MCDataset, mc_collate
from frozenbilm_tpu.data.videoqa import VideoQADataset, videoqa_collate
from frozenbilm_tpu.data.videotext import VideoTextDataset


class FakeTok:
    mask_token = "[MASK]"


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("qa_fixtures")
    rng = np.random.default_rng(0)

    feats = {
        "vidA": rng.normal(size=(25, 8)).astype(np.float32),  # > max_feats
        "vidB": rng.normal(size=(3, 8)).astype(np.float32),  # < max_feats
        "vidC": rng.normal(size=(10, 8)).astype(np.float32),  # == max_feats
    }
    import torch

    torch.save({k: torch.tensor(v) for k, v in feats.items()}, root / "feats.pth")
    np.save(root / "dir_feats" / "w1.mp4.npy" if False else root / "unused.npy", feats["vidA"])

    pd.DataFrame({
        "video_id": ["vidA", "vidB", "vidC", "missing"],
        "question": ["what is this", "Who runs?", "where", "how many"],
        "answer": ["cat", "dog", "park", "two"],
        "type": [0, 4, 3, 1],
    }).to_csv(root / "qa.csv", index=False)

    pd.DataFrame({
        "video_id": ["vidA", "vidB"],
        "question": ["He did _____ today", "She _____ fast"],
        "answer": ["run", "ran"],
    }).to_csv(root / "fib.csv", index=False)

    json.dump({"cat": 0, "dog": 1, "park": 2, "two": 3, "run": 4, "ran": 5},
              open(root / "vocab.json", "w"))
    pickle.dump({"vidA": "hello world", "vidC": "speech here"},
                open(root / "subs.pkl", "wb"))

    pd.DataFrame({
        "video_id": ["vidA", "vidC"],
        "start": [2.0, float("nan")],
        "end": [14.0, float("nan")],
        "question": ["what happens", "who speaks"],
        "a0": ["a cat", "alice"],
        "a1": ["a dog", "bob"],
        "a2": ["a bird", "carol"],
        "a3": ["a fish", "dave"],
        "answer_id": [1, 3],
        "qid": [101, 102],
    }).to_csv(root / "mc.csv", index=False)
    pickle.dump(
        {"vidA": [
            {"start": 0.0, "end": 3.0, "text": "first part"},
            {"start": 5.0, "end": 9.0, "text": "middle part"},
            {"start": 20.0, "end": 30.0, "text": "late part"},
        ],
         # the reference KeyErrors on videos absent from the pkl
         # (mc_dataset.py:46-50); ours tolerates them — keep parity fixtures
         # within the reference's assumptions
         "vidC": []},
        open(root / "mc_subs.pkl", "wb"),
    )
    return root, feats


def _ref_videoqa(root, fib=False, use_context=False):
    from tests.reference_loader import load_reference_datasets

    ref_vqa, _, _ = load_reference_datasets()
    return ref_vqa.VideoQA_Dataset(
        csv_path=str(root / ("fib.csv" if fib else "qa.csv")),
        features_path=str(root / "feats.pth"),
        max_feats=10, features_dim=8,
        vocab_path=str(root / "vocab.json"),
        train=False, prefix="", suffix=".", tokenizer=FakeTok(),
        fib=fib, type_map=None,
        subtitles_path=str(root / "subs.pkl") if use_context else None,
        use_context=use_context,
    )


def _our_videoqa(root, feats, fib=False, use_context=False):
    return VideoQADataset(
        str(root / ("fib.csv" if fib else "qa.csv")),
        DictFeatureStore(feats, dim=8),
        max_feats=10, features_dim=8,
        vocab_path=str(root / "vocab.json"),
        train=False, prefix="", suffix=".", mask_token="[MASK]",
        fib=fib,
        subtitles_path=str(root / "subs.pkl") if use_context else None,
        use_context=use_context,
    )


@pytest.mark.parametrize("fib,use_context", [(False, False), (False, True), (True, False)])
def test_videoqa_dataset_parity(fixture_dir, fib, use_context):
    root, feats = fixture_dir
    ref = _ref_videoqa(root, fib, use_context)
    ours = _our_videoqa(root, feats, fib, use_context)
    assert len(ref) == len(ours)
    for i in range(len(ref)):
        r, o = ref[i], ours[i]
        assert r["text"] == o["text"], (i, r["text"], o["text"])
        assert r["video_len"] == o["video_len"]
        np.testing.assert_allclose(r["video"].numpy(), o["video"], atol=1e-6)
        assert r["answer_id"] == o["answer_id"]
        assert int(r["type"]) == o["type"]
        if use_context:
            assert r["sub"] == o["sub"]


def test_mc_dataset_parity(fixture_dir):
    root, feats = fixture_dir
    from tests.reference_loader import load_reference_datasets

    _, ref_mc, _ = load_reference_datasets()
    ref = ref_mc.MC_Dataset(
        csv_path=str(root / "mc.csv"),
        subtitles_path=str(root / "mc_subs.pkl"),
        features_path=str(root / "feats.pth"),
        max_feats=10, features_dim=8, tokenizer=FakeTok(),
        use_context=True, prefix="", suffix="",
    )
    ours = MCDataset(
        str(root / "mc.csv"), DictFeatureStore(feats, dim=8),
        subtitles_path=str(root / "mc_subs.pkl"),
        max_feats=10, features_dim=8, mask_token="[MASK]",
        use_context=True, prefix="", suffix="",
    )
    assert ref.mc == ours.mc == 4
    for i in range(len(ref)):
        r, o = ref[i], ours[i]
        assert r["text"] == o["text"]
        assert r["video_len"] == o["video_len"]
        np.testing.assert_allclose(r["video"].numpy(), o["video"], atol=1e-6)
        assert r["answer_id"] == o["answer_id"]
        assert r["qid"] == o["qid"]
    # candidate-major collate like the reference (mc_dataset.py:142-144)
    batch = mc_collate([ours[0], ours[1]])
    assert len(batch["text"]) == 4 and len(batch["text"][0]) == 2


def test_subsample_rule_matches_reference_formula(fixture_dir):
    for n in [1, 3, 9, 10, 11, 25, 100]:
        video = np.arange(n * 2, dtype=np.float32).reshape(n, 2)
        out, vlen = subsample_or_pad(video, 10)
        assert out.shape == (10, 2)
        if n >= 10:
            expected = np.stack([video[(j * n) // 10] for j in range(10)])
            np.testing.assert_array_equal(out, expected)
            assert vlen == 10
        else:
            np.testing.assert_array_equal(out[:n], video)
            assert (out[n:] == 0).all()
            assert vlen == n


def test_packed_store_roundtrip(fixture_dir, tmp_path):
    _, feats = fixture_dir
    base = str(tmp_path / "packed")
    PackedFeatureStore.write(base, feats, dim=8, dtype="float32")
    store = PackedFeatureStore(base)
    for k, v in feats.items():
        np.testing.assert_allclose(store.get(k), v, atol=1e-6)
    assert store.get("nope") is None
    assert "vidA" in store and "nope" not in store


def test_loader_sharding_covers_dataset(fixture_dir):
    root, feats = fixture_dir
    ds = _our_videoqa(root, feats)
    loaders = [
        DataLoader(ds, 2, collate_fn=videoqa_collate, shuffle=True, seed=1,
                   num_shards=2, shard_index=i, prefetch=0)
        for i in range(2)
    ]
    seen = []
    for dl in loaders:
        dl.set_epoch(0)
        for b in dl:
            seen.extend(b["qid"])
    assert set(seen) == set(range(len(ds)))
    assert len(loaders[0]) == len(loaders[1])


def test_loader_prefetch_matches_sync(fixture_dir):
    root, feats = fixture_dir
    ds = _our_videoqa(root, feats)
    a = list(DataLoader(ds, 2, collate_fn=videoqa_collate, prefetch=0))
    b = list(DataLoader(ds, 2, collate_fn=videoqa_collate, prefetch=2))
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x["video"], y["video"])
        assert x["text"] == y["text"]


def test_videotext_missing_video(fixture_dir, tmp_path):
    root, feats = fixture_dir
    pd.DataFrame({"video_id": ["vidA", "nope"], "text": ["a cat", "a dog"]}).to_csv(
        tmp_path / "cap.csv", index=False)
    ds = VideoTextDataset(str(tmp_path / "cap.csv"), DictFeatureStore(feats, dim=8),
                          max_feats=10, features_dim=8)
    ok = ds[0]
    assert ok["video_len"] == 10
    missing = ds[1]
    assert missing["video_len"] == 0 and (missing["video"] == 0).all()


def test_tokenization_static_shapes(tmp_path):
    from transformers import BertTokenizer

    from frozenbilm_tpu.data.tokenization import answers_to_token_ids, encode_batch

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "what", "is", "this", "a", "cat", "dog", "?", "."]
    vf = tmp_path / "vocab.txt"
    vf.write_text("\n".join(vocab))
    tok = BertTokenizer(str(vf))

    batch = encode_batch(tok, ["what is this ? [MASK]", "a cat"], 16)
    assert batch["input_ids"].shape == (2, 16)
    assert batch["attention_mask"].sum(1).tolist() == [7, 4]
    # CLS/SEP/PAD are special; [MASK] is content
    row = batch["input_ids"][0]
    mask_pos = np.where(row == tok.mask_token_id)[0]
    assert batch["special_tokens_mask"][0][mask_pos] == 0
    assert batch["special_tokens_mask"][0][0] == 1  # CLS
    assert batch["special_tokens_mask"][:, -1].tolist() == [1, 1]  # PAD

    left = encode_batch(tok, ["a cat"], 8, left_pad=True)
    assert left["attention_mask"][0][:4].sum() == 0
    assert left["attention_mask"][0][4:].sum() == 4

    a2tok = answers_to_token_ids(tok, ["cat", "a cat dog"], max_atokens=2)
    assert a2tok.shape == (2, 2)
    assert a2tok[0, 1] == tok.pad_token_id


def test_bucketed_padding(tmp_path):
    from transformers import BertTokenizer

    from frozenbilm_tpu.data.tokenization import encode_batch

    vf = tmp_path / "v.txt"
    vf.write_text("\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "a"]))
    tok = BertTokenizer(str(vf))
    out = encode_batch(tok, ["a a a"], 64, buckets=[8, 16, 32])
    assert out["input_ids"].shape[1] == 8
    out = encode_batch(tok, ["a " * 20], 64, buckets=[8, 16, 32])
    assert out["input_ids"].shape[1] == 32


def test_loader_multiworker_matches_single():
    """num_workers>1 yields identical batches in identical order (the
    order-preserving thread-pool handoff)."""
    from frozenbilm_tpu.data.loader import DataLoader

    data = list(range(23))
    collate = lambda b: np.asarray(b)  # noqa: E731
    kw = dict(collate_fn=collate, shuffle=True, seed=7)
    single = [b.tolist() for b in DataLoader(data, 4, **kw)]
    multi = [b.tolist() for b in DataLoader(data, 4, num_workers=4, **kw)]
    assert single == multi and len(single) == 6


def test_device_prefetch_order_and_errors():
    """device_prefetch preserves order, applies place_fn, and re-raises
    worker exceptions on the consumer thread."""
    from frozenbilm_tpu.data.loader import device_prefetch

    got = list(device_prefetch(iter(range(9)), lambda x: x * 2, depth=3))
    assert got == [x * 2 for x in range(9)]

    def boom(x):
        if x == 3:
            raise RuntimeError("bad batch")
        return x

    out = []
    try:
        for v in device_prefetch(iter(range(9)), boom, depth=2):
            out.append(v)
        raise AssertionError("expected RuntimeError")
    except RuntimeError as e:
        assert "bad batch" in str(e)
    assert out == [0, 1, 2]


def _write_deberta_fast_tokenizer(d):
    """Minimal tokenizer.json dir loadable by DebertaV2TokenizerFast — the
    code path get_tokenizer takes for deberta when no sentencepiece model
    is present (data/tokenization.py)."""
    import json as _json

    from tokenizers import Tokenizer, models, pre_tokenizers, processors

    words = ["question", "what", "is", "a", "cat", "dog", "answer", "the"]
    vocab = {"[PAD]": 0, "[CLS]": 1, "[SEP]": 2, "[UNK]": 3, "[MASK]": 4,
             **{w: i + 5 for i, w in enumerate(words)}}
    tok = Tokenizer(models.WordLevel(vocab=vocab, unk_token="[UNK]"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    tok.post_processor = processors.TemplateProcessing(
        single="[CLS] $A [SEP]", pair="[CLS] $A [SEP] $B [SEP]",
        special_tokens=[("[CLS]", 1), ("[SEP]", 2)])
    tok.save(os.path.join(d, "tokenizer.json"))
    _json.dump({"pad_token": "[PAD]", "cls_token": "[CLS]", "sep_token": "[SEP]",
                "unk_token": "[UNK]", "mask_token": "[MASK]"},
               open(os.path.join(d, "special_tokens_map.json"), "w"))


def test_deberta_fast_tokenizer_path(tmp_path):
    """get_tokenizer's deberta branch (fast fallback) feeds encode_batch,
    strip_sep_tokens and answers_to_token_ids correctly — the same plumbing
    the released deberta-v2-xlarge tokenizer.json would go through."""
    import argparse

    from frozenbilm_tpu.data.tokenization import (
        answers_to_token_ids,
        encode_batch,
        get_tokenizer,
        strip_sep_tokens,
    )

    _write_deberta_fast_tokenizer(str(tmp_path))
    args = argparse.Namespace(model_name="deberta-v2-xlarge",
                              tokenizer_path=str(tmp_path))
    tok = get_tokenizer(args)
    assert tok.mask_token_id == 4 and tok.pad_token_id == 0

    enc = encode_batch(tok, ["question what is a cat [MASK]",
                             "what is [MASK]"], max_tokens=12)
    assert enc["input_ids"].shape[1] <= 12
    assert (enc["input_ids"] == 4).sum(1).tolist() == [1, 1]
    # [CLS]/[SEP] flagged special, real words not
    row = enc["special_tokens_mask"][0]
    assert row[0] == 1 and row[1] == 0

    stripped = strip_sep_tokens(enc, tok.sep_token_id, tok.pad_token_id)
    assert (stripped["input_ids"] == tok.sep_token_id).sum() == 0

    a2tok = answers_to_token_ids(tok, ["cat", "the dog"], max_atokens=3)
    assert a2tok.shape == (2, 3)
    assert a2tok[0, 0] == 9 and a2tok[1, 1] == 10  # no specials, padded


def test_one_ahead_pipeline():
    """OneAhead hands items back exactly one submission late, in order."""
    from frozenbilm_tpu.data.loader import OneAhead

    pipe = OneAhead()
    seen = [pipe.submit(i) for i in range(4)]
    assert seen == [None, 0, 1, 2]
    assert pipe.drain() == 3
    assert pipe.drain() is None  # idempotent when empty
