"""WebVid video-caption dataset for cross-modal MLM pretraining (torch-free).

Behavioral spec: reference datasets/videotext_dataset.py — per-video feature
file streamed from a directory; missing/corrupt file -> zero features with
video_len 0, training continues (:39-41).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from frozenbilm_tpu.data.features import subsample_or_pad


class VideoTextDataset:
    def __init__(self, csv_path: str, features, max_feats: int = 10, features_dim: int = 768):
        self.data = pd.read_csv(csv_path)
        self.features = features
        self.max_feats = max_feats
        self.features_dim = features_dim

    def __len__(self):
        return len(self.data)

    def __getitem__(self, idx):
        text = self.data["text"].values[idx]
        video_id = self.data["video_id"].values[idx]
        raw = self.features.get(video_id)
        if raw is None or len(raw) == 0:
            video = np.zeros((self.max_feats, self.features_dim), np.float32)
            video_len = 0
        else:
            video, video_len = subsample_or_pad(raw, self.max_feats)
        return {"video": video, "video_len": video_len, "text": text}


def videotext_collate(batch):
    return {
        "video": np.stack([b["video"] for b in batch]).astype(np.float32),
        "video_len": np.asarray([b["video_len"] for b in batch], np.int32),
        "text": [b["text"] for b in batch],
    }


def build_videotext_dataset(split: str, args, features=None):
    from frozenbilm_tpu.data.features import open_feature_store

    if split == "train":
        csv_path = args.webvid_train_csv_path
    elif split == "val":
        csv_path = args.webvid_val_csv_path
    else:
        raise NotImplementedError(split)
    if features is None:
        features = open_feature_store(args.webvid_features_path, dim=args.features_dim)
    return VideoTextDataset(csv_path, features, args.max_feats, args.features_dim)
