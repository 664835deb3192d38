"""Open-ended VideoQA dataset (torch-free).

Behavioral spec: reference datasets/videoqa_dataset.py —
  - CSV rows + vocab.json answer->id + feature store + subtitles.pkl
  - prompt "{prefix} Question: {q} Answer: [MASK]{suffix}" or LSMDC
    fill-in-blank; " Subtitles: {sub}" appended (:69-78)
  - train split filters answers outside the vocab (:39-59)
  - iVQA: 5 annotator answers -> soft count vector over the vocab (:115-135)
  - per-dataset question-type maps (:196-305); TGIF has no subtitles (:297-299)
"""

from __future__ import annotations

import collections
import json
import pickle
from typing import Optional

import numpy as np
import pandas as pd

from frozenbilm_tpu.data.features import subsample_or_pad
from frozenbilm_tpu.data.prompts import normalize_question, videoqa_prompt

TYPE_MAPS = {
    "msvd": {0: "what", 1: "how", 2: "color", 3: "where", 4: "who", 5: "when"},
    "msrvtt": {0: "what", 1: "how", 2: "color", 3: "where", 4: "who", 5: "when"},
    "activitynet": {0: "motion", 1: "spatial", 2: "temporal", 3: "yesno", 4: "color",
                    5: "object", 6: "location", 7: "number", 8: "other"},
    "tgif": {0: "what", 1: "how", 2: "color", 3: "where"},
    "ivqa": None,
    "lsmdc": None,
}


class VideoQADataset:
    def __init__(
        self,
        csv_path: str,
        features,  # a feature store (data/features.py)
        *,
        max_feats: int = 10,
        features_dim: int = 768,
        vocab_path: Optional[str] = None,
        train: bool = False,
        prefix: str = "",
        suffix: str = ".",
        mask_token: str = "[MASK]",
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
        self.train = train
        self.prefix = prefix
        self.suffix = suffix
        self.mask = mask_token
        self.fib = fib
        self.type_map = type_map
        self.use_context = use_context
        self.multi_answer = "answer" not in self.data  # iVQA-style 5 annotators
        if train:
            self.data = self.data[self.data.apply(self._row_answer_in_vocab, axis=1)]
        if subtitles_path:
            with open(subtitles_path, "rb") as f:
                self.subs = pickle.load(f)
        else:
            self.subs = None

    def _row_answer_in_vocab(self, row) -> bool:
        if not self.multi_answer:
            return row["answer"] in self.a2id
        counts = collections.Counter(
            row[f"answer{i}"] for i in range(1, 6)
        )
        return counts.most_common(1)[0][0] in self.a2id

    def __len__(self):
        return len(self.data)

    def _answer_fields(self, idx):
        if not self.multi_answer:
            answer = self.data["answer"].values[idx]
            return self.a2id.get(answer, -1), answer
        counts = collections.Counter(
            self.data[f"answer{i}"].values[idx] for i in range(1, 6)
        )
        soft = np.zeros(len(self.a2id), dtype=np.float32)
        for ans, c in counts.items():
            if ans in self.a2id:
                soft[self.a2id[ans]] = c
        # text answers, double-weighted when >= 2 annotators agree (:129-135)
        final = []
        for ans, c in counts.items():
            final.extend([ans] * (2 if c >= 2 else 1))
        return soft, final

    def __getitem__(self, idx):
        question = normalize_question(self.data["question"].values[idx], self.fib)
        qtype = int(self.data["type"].values[idx]) if "type" in self.data else 0
        answer_id, answer = self._answer_fields(idx)
        video_id = self.data["video_id"].values[idx]

        sub = ""
        if self.subs is not None and video_id in self.subs:
            sub = self.subs[video_id]
        sub_bool = bool(sub)
        if not self.use_context:
            sub = ""

        text = videoqa_prompt(question, self.mask, self.prefix, self.suffix, sub, self.fib)

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


def videoqa_collate(batch):
    """Stack into numpy arrays + python lists (reference :165-193)."""
    out = {
        "video": np.stack([b["video"] for b in batch]).astype(np.float32),
        "video_len": np.asarray([b["video_len"] for b in batch], np.int32),
        "text": [b["text"] for b in batch],
        "qid": [b["qid"] for b in batch],
        "type": [b["type"] for b in batch],
        "answer": [b["answer"] for b in batch],
        "sub": [b["sub"] for b in batch],
    }
    a0 = batch[0]["answer_id"]
    if isinstance(a0, np.ndarray):
        out["answer_id"] = np.stack([b["answer_id"] for b in batch])
    else:
        out["answer_id"] = np.asarray([b["answer_id"] for b in batch], np.int64)
    return out


_DATASET_SPLITS = {
    "msvd": ("msvd_{split}_csv_path", "msvd_features_path", "msvd_vocab_path", "msvd_subtitles_path"),
    "msrvtt": ("msrvtt_{split}_csv_path", "msrvtt_features_path", "msrvtt_vocab_path", "msrvtt_subtitles_path"),
    "activitynet": ("activitynet_{split}_csv_path", "activitynet_features_path",
                    "activitynet_vocab_path", "activitynet_subtitles_path"),
    "ivqa": ("ivqa_{split}_csv_path", "ivqa_features_path", "ivqa_vocab_path", "ivqa_subtitles_path"),
    "lsmdc": ("lsmdc_{split}_csv_path", "lsmdc_features_path", "lsmdc_vocab_path", "lsmdc_subtitles_path"),
}


def build_videoqa_dataset(dataset_name: str, split: str, args, mask_token: str,
                          features=None):
    """Factory mirroring reference build_videoqa_dataset (:196-305).

    `features` may be passed to share one store across splits.
    """
    from frozenbilm_tpu.data.features import open_feature_store

    if dataset_name == "tgif":
        csv_path = (args.tgif_frameqa_train_csv_path if split == "train"
                    else args.tgif_frameqa_test_csv_path)  # no val set in TGIF
        features_path, vocab_path, subtitles_path = (
            args.tgif_features_path, args.tgif_vocab_path, None)
    elif dataset_name in _DATASET_SPLITS:
        csv_attr, feat_attr, vocab_attr, subs_attr = _DATASET_SPLITS[dataset_name]
        csv_path = getattr(args, csv_attr.format(split=split))
        features_path = getattr(args, feat_attr)
        vocab_path = getattr(args, vocab_attr)
        subtitles_path = getattr(args, subs_attr)
    elif dataset_name == "vqa":
        from frozenbilm_tpu.data.vqa import build_vqa_dataset

        return build_vqa_dataset(split, args, mask_token)
    else:
        raise NotImplementedError(dataset_name)

    if features is None:
        features = open_feature_store(features_path, dim=args.features_dim)
    return VideoQADataset(
        csv_path,
        features,
        max_feats=args.max_feats,
        features_dim=args.features_dim,
        vocab_path=vocab_path,
        train=split == "train",
        prefix=args.prefix,
        suffix=args.suffix,
        mask_token=mask_token,
        fib=dataset_name == "lsmdc",
        type_map=TYPE_MAPS.get(dataset_name),
        subtitles_path=subtitles_path,
        use_context=args.use_context and dataset_name != "tgif",  # no speech in GIFs
    )
