"""CLIP-baseline open-ended VideoQA dataset.

Behavioral spec: reference datasets/videoqa_dataset_clip.py — per sample,
one "Question: {q} Answer: {candidate}" string for EVERY vocabulary answer
(:124); video features must be single-frame (max_feats == 1 asserted by the
driver, videoqa_clip.py:200).

The reference references an undeclared args.n_shots (latent bug,
SURVEY.md §5.6); we declare --n_shots properly (default 0 = full train csv).
"""

from __future__ import annotations

import json
import pickle
from typing import Optional

import numpy as np
import pandas as pd

from frozenbilm_tpu.data.features import subsample_or_pad
from frozenbilm_tpu.data.prompts import normalize_question, videoqa_prompt
from frozenbilm_tpu.data.videoqa import TYPE_MAPS, _DATASET_SPLITS


class VideoQACLIPDataset:
    def __init__(
        self,
        csv_path: str,
        features,
        *,
        max_feats: int = 1,
        features_dim: int = 768,
        vocab_path: Optional[str] = None,
        prefix: str = "",
        suffix: str = "",
        fib: bool = False,
        type_map=None,
        subtitles_path: Optional[str] = None,
        use_context: bool = False,
    ):
        self.data = pd.read_csv(csv_path)
        self.features = features
        self.max_feats = max_feats
        self.features_dim = features_dim
        self.a2id = json.load(open(vocab_path)) if vocab_path else {}
        self.answers = [a for a, _ in sorted(self.a2id.items(), key=lambda kv: kv[1])]
        self.prefix = prefix
        self.suffix = suffix
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

        # one prompt per vocabulary answer (videoqa_dataset_clip.py:124)
        text = [videoqa_prompt(question, a, self.prefix, self.suffix, sub, self.fib)
                for a in self.answers]

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
        }


def videoqa_clip_collate(batch):
    return {
        "video": np.stack([b["video"] for b in batch]).astype(np.float32),
        "video_len": np.asarray([b["video_len"] for b in batch], np.int32),
        "text": [b["text"] for b in batch],  # list (B) of lists (n_ans)
        "qid": [b["qid"] for b in batch],
        "answer_id": np.asarray([b["answer_id"] for b in batch], np.int64),
        "type": [b["type"] for b in batch],
        "sub": [b["sub"] for b in batch],
    }


def build_videoqa_clip_dataset(dataset_name: str, split: str, args, features=None):
    from frozenbilm_tpu.data.features import open_feature_store

    if dataset_name == "tgif":
        csv_path = args.tgif_frameqa_test_csv_path
        features_path, vocab_path, subtitles_path = (
            args.tgif_features_path, args.tgif_vocab_path, None)
    elif dataset_name in _DATASET_SPLITS:
        csv_attr, feat_attr, vocab_attr, subs_attr = _DATASET_SPLITS[dataset_name]
        csv_path = getattr(args, csv_attr.format(split=split))
        if split == "train" and getattr(args, "n_shots", 0):
            csv_path = csv_path.replace(".csv", f"{args.n_shots}p.csv")
        features_path = getattr(args, feat_attr)
        vocab_path = getattr(args, vocab_attr)
        subtitles_path = getattr(args, subs_attr)
    else:
        raise NotImplementedError(dataset_name)
    if features is None:
        features = open_feature_store(features_path, dim=args.features_dim)
    return VideoQACLIPDataset(
        csv_path,
        features,
        max_feats=args.max_feats,
        features_dim=args.features_dim,
        vocab_path=vocab_path,
        prefix=args.prefix,
        suffix=args.suffix,
        fib=dataset_name == "lsmdc",
        type_map=TYPE_MAPS.get(dataset_name),
        subtitles_path=subtitles_path,
        use_context=args.use_context and dataset_name != "tgif",
    )
