"""Autoregressive VideoQA dataset (eval-only, like the reference:
datasets/videoqa_dataset_ar.py asserts not train at :30).

Prompt: "Subtitles: {sub} {prefix} Question: {q} Answer:" — subtitles
prefixed, trailing space stripped (:43-52).
"""

from __future__ import annotations

import json
import pickle
from typing import Optional

import numpy as np
import pandas as pd

from frozenbilm_tpu.data.features import subsample_or_pad
from frozenbilm_tpu.data.prompts import ar_prompt, normalize_question
from frozenbilm_tpu.data.videoqa import TYPE_MAPS, _DATASET_SPLITS


class VideoQAARDataset:
    def __init__(
        self,
        csv_path: str,
        features,
        *,
        max_feats: int = 10,
        features_dim: int = 768,
        vocab_path: Optional[str] = None,
        train: bool = False,
        prefix: str = "",
        fib: bool = False,
        type_map=None,
        subtitles_path: Optional[str] = None,
        use_context: bool = False,
    ):
        assert not train, "AR path is eval-only (reference videoqa_ar.py:194-195)"
        self.data = pd.read_csv(csv_path)
        self.features = features
        self.max_feats = max_feats
        self.features_dim = features_dim
        self.a2id = json.load(open(vocab_path)) if vocab_path else {}
        self.prefix = prefix
        self.fib = fib
        self.type_map = type_map
        self.use_context = use_context
        self.subs = pickle.load(open(subtitles_path, "rb")) if subtitles_path else None

    def __len__(self):
        return len(self.data)

    def __getitem__(self, idx):
        question = normalize_question(self.data["question"].values[idx], self.fib)
        qtype = int(self.data["type"].values[idx]) if "type" in self.data else 0
        answer = self.data["answer"].values[idx] if "answer" in self.data else None
        answer_id = self.a2id.get(answer, -1)
        video_id = self.data["video_id"].values[idx]

        sub = ""
        if self.subs is not None and video_id in self.subs:
            sub = self.subs[video_id]
        sub_bool = bool(sub)
        if not self.use_context:
            sub = ""

        text = ar_prompt(question, self.prefix, sub, self.fib)
        raw = self.features.get(video_id)
        if raw is None:
            raw = np.zeros((1, self.features_dim), np.float32)
        video, video_len = subsample_or_pad(raw, self.max_feats)
        return {
            "video": video,
            "video_len": video_len,
            "text": text,
            "qid": idx,
            "answer_id": answer_id,
            "type": qtype,
            "sub": sub_bool,
            "answer": answer,
        }


def videoqa_ar_collate(batch):
    return {
        "video": np.stack([b["video"] for b in batch]).astype(np.float32),
        "video_len": np.asarray([b["video_len"] for b in batch], np.int32),
        "text": [b["text"] for b in batch],
        "qid": [b["qid"] for b in batch],
        "answer_id": np.asarray([b["answer_id"] for b in batch], np.int64),
        "type": [b["type"] for b in batch],
        "sub": [b["sub"] for b in batch],
        "answer": [b["answer"] for b in batch],
    }


def build_videoqa_ar_dataset(dataset_name: str, split: str, args, features=None):
    from frozenbilm_tpu.data.features import open_feature_store

    if dataset_name == "tgif":
        csv_path = args.tgif_frameqa_test_csv_path
        features_path, vocab_path, subtitles_path = (
            args.tgif_features_path, args.tgif_vocab_path, None)
    elif dataset_name in _DATASET_SPLITS:
        csv_attr, feat_attr, vocab_attr, subs_attr = _DATASET_SPLITS[dataset_name]
        csv_path = getattr(args, csv_attr.format(split=split))
        features_path = getattr(args, feat_attr)
        vocab_path = getattr(args, vocab_attr)
        subtitles_path = getattr(args, subs_attr)
    else:
        raise NotImplementedError(dataset_name)
    if features is None:
        features = open_feature_store(features_path, dim=args.features_dim)
    return VideoQAARDataset(
        csv_path,
        features,
        max_feats=args.max_feats,
        features_dim=args.features_dim,
        vocab_path=vocab_path,
        train=split == "train",
        prefix=args.prefix,
        fib=dataset_name == "lsmdc",
        type_map=TYPE_MAPS.get(dataset_name),
        subtitles_path=subtitles_path,
        use_context=args.use_context and dataset_name != "tgif",
    )
