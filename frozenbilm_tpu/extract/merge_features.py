"""Merge per-video .npy feature files into one feature store.

Mirrors reference extract/merge_features.py: per-dataset filename ->
video_id mapping (:42-72), optional pad/truncate to a fixed number of
seconds (:79-83), fp16 values. Output is the memory-mapped packed store
(data/features.py) instead of a torch pickle; pass --format pth for a
reference-compatible torch dict.

Run: python -m frozenbilm_tpu.extract.merge_features --folder feats/ \
       --output_path data/clipvitl14 --dataset msrvtt
"""

from __future__ import annotations

import argparse
import os

import numpy as np

DATASETS = ["lsmdc", "ivqa", "msrvtt", "msvd", "activitynet", "tgif", "how2qa", "tvqa"]


def get_parser():
    parser = argparse.ArgumentParser("Feature merger")
    parser.add_argument("--folder", type=str, required=True)
    parser.add_argument("--output_path", type=str, required=True)
    parser.add_argument("--dataset", type=str, required=True, choices=DATASETS)
    parser.add_argument("--pad", type=int, default=0,
                        help="truncate/zero-pad to this many seconds (0 = off)")
    parser.add_argument("--format", default="packed", choices=["packed", "pth"])
    parser.add_argument("--msvd_mapping_path", default="",
                        help="youtube_mapping.txt for MSVD (reference :47-52)")
    parser.add_argument("--tvqa_mapping_path", default="",
                        help="feat_mapping.csv for TVQA (reference :60-70)")
    return parser


def filename_mapping(files, dataset: str, msvd_mapping_path: str = "",
                     tvqa_mapping_path: str = ""):
    """Feature filename -> dataset video_id (reference merge_features.py:42-72)."""
    if dataset == "msrvtt":
        return {x: int(x.split(".")[0][5:]) for x in files}  # videoNNN.mp4.npy
    if dataset == "msvd":
        mapping = {}
        with open(msvd_mapping_path) as f:
            for line in f:
                parts = line.split(" ")
                idx = parts[1].strip()[3:]
                mapping[parts[0] + ".avi.npy"] = int(idx)
        return {x: mapping[x] for x in files if x in mapping}
    if dataset in ("ivqa", "activitynet"):
        return {x: x[:11] for x in files}  # 11-char YouTube ids
    if dataset in ("lsmdc", "tgif", "how2qa"):
        return {x: x[:-8] for x in files}  # strip ".mp4.npy"/".gif.npy"
    if dataset == "tvqa":
        import pandas as pd

        mapping = {}
        for _, row in pd.read_csv(tvqa_mapping_path).iterrows():
            show = row["video_path"].split("/")[-2]
            prefix = "" if show == "bbt" else show + "_"
            name = row["video_path"].split("/")[-1]
            mapping[name + ".npy"] = prefix + name[:-4]
        return {x: mapping[x] for x in files if x in mapping}
    raise NotImplementedError(dataset)


def main(args):
    files = [x for x in os.listdir(args.folder) if x.endswith(".npy")]
    mapping = filename_mapping(files, args.dataset, args.msvd_mapping_path,
                               args.tvqa_mapping_path)

    features = {}
    dim = None
    for x in files:
        if x not in mapping:
            continue
        feat = np.load(os.path.join(args.folder, x)).astype(np.float16)
        dim = feat.shape[1]
        if args.pad and len(feat) < args.pad:
            feat = np.concatenate([feat, np.zeros((args.pad - len(feat), dim), np.float16)])
        elif args.pad:
            feat = feat[: args.pad]
        features[mapping[x]] = feat

    if args.format == "pth":
        import torch

        torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in features.items()},
                   args.output_path)
    else:
        from frozenbilm_tpu.data.features import PackedFeatureStore

        PackedFeatureStore.write(args.output_path, features, dim=dim or 768)
    print(f"merged {len(features)} videos -> {args.output_path} ({args.format})")


if __name__ == "__main__":
    main(get_parser().parse_args())
