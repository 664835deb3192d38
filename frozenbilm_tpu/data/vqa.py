"""VQA (image QA) dataset: image features repeated max_feats times as a
fake video (reference datasets/vqa_dataset.py:76-80).

Fixes the reference's latent filter bug (vqa_dataset.py:29-37 loops over the
just-emptied list, so filtering never runs and the dataset stays empty); we
apply the intended soft-score>=3 in-vocab filter to the loaded rows.
"""

from __future__ import annotations

import json
import pickle

import numpy as np

from frozenbilm_tpu.data.prompts import normalize_question, videoqa_prompt


class VQADataset:
    def __init__(
        self,
        pkl_path: str,
        features,
        *,
        max_feats: int = 10,
        features_dim: int = 768,
        vocab_path=None,
        train: bool = False,
        prefix: str = "",
        suffix: str = "",
        mask_token: str = "[MASK]",
        type_map=None,
    ):
        with open(pkl_path, "rb") as f:
            raw = pickle.load(f)
        self.features = features
        self.max_feats = max_feats
        self.features_dim = features_dim
        self.a2id = json.load(open(vocab_path)) if vocab_path else {}
        # intended filter (reference's loop is a no-op bug; see module docstring)
        self.data = [
            row for row in raw
            if any(a in self.a2id and s >= 3 for a, s in row["answer"])
        ]
        self.train = train
        self.prefix = prefix
        self.suffix = suffix
        self.mask = mask_token
        self.type_map = type_map

    def __len__(self):
        return len(self.data)

    def __getitem__(self, idx):
        row = self.data[idx]
        question = normalize_question(row["question"])
        soft = np.zeros(len(self.a2id), np.float32)
        for a, s in row["answer"]:
            if a in self.a2id:
                soft[self.a2id[a]] = s
        final = []
        for a, s in row["answer"]:
            final.extend([a] * 3 if s >= 3 else [a])
        text = videoqa_prompt(question, self.mask, self.prefix, self.suffix)
        feat = self.features.get(row["image_id"])
        if feat is None:
            feat = np.zeros((self.features_dim,), np.float32)
        feat = np.asarray(feat, np.float32).reshape(-1)[: self.features_dim]
        video = np.tile(feat[None, :], (self.max_feats, 1))
        return {
            "video": video,
            "video_len": self.max_feats,
            "text": text,
            "qid": idx,
            "answer_id": soft,
            "answer": final,
            "type": row.get("type", 0),
            "sub": False,
        }


def build_vqa_dataset(split: str, args, mask_token: str, features=None):
    from frozenbilm_tpu.data.features import open_feature_store

    pkl_path = args.vqa_train_pkl_path if split == "train" else args.vqa_val_pkl_path
    if features is None:
        features = open_feature_store(args.vqa_features_path, dim=args.features_dim)
    return VQADataset(
        pkl_path,
        features,
        max_feats=args.max_feats,
        features_dim=args.features_dim,
        vocab_path=args.vqa_vocab_path,
        train=split == "train",
        prefix=args.prefix,
        suffix=args.suffix,
        mask_token=mask_token,
        type_map={0: "yesno", 1: "number", 2: "other"},
    )
