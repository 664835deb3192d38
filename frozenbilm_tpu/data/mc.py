"""Multiple-choice VideoQA dataset: How2QA (4 candidates) / TVQA (5).

Behavioral spec: reference datasets/mc_dataset.py —
  - candidate count discovered from CSV columns a0..aN (:33-36)
  - subtitles time-windowed to the clip [start, end] (:44-51)
  - video features sliced to [start, end] seconds then subsampled (:62-88)
  - template "Question: {q} Is it '{ai}'? [MASK]{suffix} Subtitles: {subs}" (:53-60)
  - answer_id -1 marks hidden test sets (:115-117)
"""

from __future__ import annotations

import math
import pickle
from typing import Optional

import numpy as np
import pandas as pd

from frozenbilm_tpu.data.features import subsample_or_pad
from frozenbilm_tpu.data.prompts import mc_prompt, normalize_question, window_subtitles


class MCDataset:
    def __init__(
        self,
        csv_path: str,
        features,
        *,
        subtitles_path: Optional[str] = None,
        max_feats: int = 10,
        features_dim: int = 768,
        mask_token: str = "[MASK]",
        use_context: bool = True,
        type_map=None,
        prefix: str = "",
        suffix: str = "",
    ):
        self.data = pd.read_csv(csv_path)
        self.subs = pickle.load(open(subtitles_path, "rb")) if subtitles_path else None
        self.features = features
        self.max_feats = max_feats
        self.features_dim = features_dim
        self.mask = mask_token
        self.use_context = use_context
        mc = 0
        while f"a{mc}" in self.data:
            mc += 1
        self.mc = mc
        self.type_map = type_map
        self.prefix = prefix
        self.suffix = suffix

    def __len__(self):
        return len(self.data)

    def _get_video(self, video_id, start, end):
        raw = self.features.get(video_id)
        if raw is not None and start is not None and not (isinstance(start, float) and math.isnan(start)):
            raw = raw[int(start): int(end) + 1]
        if raw is None or len(raw) == 0:
            raw = np.zeros((1, self.features_dim), np.float32)
        return subsample_or_pad(raw, self.max_feats)

    def __getitem__(self, idx):
        video_id = self.data["video_id"].values[idx]
        start = self.data["start"].values[idx] if "start" in self.data else None
        end = self.data["end"].values[idx] if "end" in self.data else None
        question = normalize_question(self.data["question"].values[idx])
        qtype = int(self.data["type"].values[idx]) if "type" in self.data else 0

        subs = ""
        if self.subs is not None and video_id in self.subs:
            subs = window_subtitles(self.subs[video_id], start, end)

        video, video_len = self._get_video(video_id, start, end)

        answer_id = -1  # hidden test sets keep -1 (predictions are dumped only)
        if "answer_id" in self.data:
            answer_id = int(self.data["answer_id"].values[idx])

        text = [
            mc_prompt(
                question,
                str(self.data[f"a{i}"].values[idx]).capitalize().strip(),
                self.mask, self.prefix, self.suffix, subs, self.use_context,
            )
            for i in range(self.mc)
        ]
        qid = int(self.data["qid"].values[idx]) if "qid" in self.data else idx
        return {
            "video": video,
            "video_len": video_len,
            "text": text,  # list of mc candidate prompts
            "qid": qid,
            "answer_id": answer_id,
            "type": qtype,
        }


def mc_collate(batch):
    """Candidate-major text layout: text[j] = list over batch of candidate j
    (reference mc_collate_fn :138-156)."""
    n_cand = len(batch[0]["text"])
    return {
        "video": np.stack([b["video"] for b in batch]).astype(np.float32),
        "video_len": np.asarray([b["video_len"] for b in batch], np.int32),
        "text": [[b["text"][j] for b in batch] for j in range(n_cand)],
        "qid": [b["qid"] for b in batch],
        "answer_id": np.asarray([b["answer_id"] for b in batch], np.int64),
        "type": [b["type"] for b in batch],
    }


def build_mc_dataset(dataset_name: str, split: str, args, mask_token: str, features=None):
    from frozenbilm_tpu.data.features import open_feature_store

    if dataset_name == "how2qa":
        csv_path = {"train": args.how2qa_train_csv_path,
                    "val": args.how2qa_val_csv_path,
                    "test": args.how2qa_val_csv_path}[split]  # public val = test
        features_path, subtitles_path = args.how2qa_features_path, args.how2qa_subtitles_path
    elif dataset_name == "tvqa":
        csv_path = {"train": args.tvqa_train_csv_path,
                    "val": args.tvqa_val_csv_path,
                    "test": args.tvqa_test_csv_path}[split]
        features_path, subtitles_path = args.tvqa_features_path, args.tvqa_subtitles_path
    else:
        raise NotImplementedError(dataset_name)
    if features is None:
        features = open_feature_store(features_path, dim=args.features_dim)
    return MCDataset(
        csv_path,
        features,
        subtitles_path=subtitles_path,
        max_feats=args.max_feats,
        features_dim=args.features_dim,
        mask_token=mask_token,
        use_context=args.use_context,
        prefix=args.prefix,
        suffix=args.suffix,
    )
