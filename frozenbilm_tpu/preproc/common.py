"""Shared annotation-preprocessing helpers (torch-free).

Behavioral spec: reference preproc/*.py — top-K answer vocabularies from
train-split counts, trailing-period stripping of MC candidates, jsonlines
subtitles -> pickle, MC jsonl -> csv with a0..aN columns.
"""

from __future__ import annotations

import collections
import json
import pickle
from typing import Dict, Optional


def build_top_k_vocab(answers, k: int = 1000) -> Dict[str, int]:
    """Most-common-K answer -> id map (preproc_lsmdc.py:27-33)."""
    return {x[0]: i for i, x in enumerate(collections.Counter(answers).most_common(k))}


def strip_period(s: str) -> str:
    """Strip, drop a single trailing '.' (preproc_how2qa.py:38-55)."""
    s = str(s).strip()
    return s[:-1] if s and s[-1] == "." else s


def jsonl_subtitles_to_pkl(jsonl_path: str, pkl_path: str) -> Dict:
    """{vid_name: sub} pickle from a subtitles jsonl (preproc_how2qa.py:10-14)."""
    with open(jsonl_path) as f:
        data = [json.loads(line) for line in f]
    subs = {x["vid_name"]: x["sub"] for x in data}
    with open(pkl_path, "wb") as f:
        pickle.dump(subs, f)
    return subs


def mc_jsonl_to_csv(jsonl_path: str, csv_path: str, n_candidates: int,
                    with_answers: bool, id_map: Optional[Dict[str, str]] = None):
    """MC jsonl -> csv with qid/video_id/start/end/question/a0..aN[/answer_id]
    (preproc_how2qa.py:31-115, preproc_tvqa.py:15-102)."""
    import pandas as pd

    with open(jsonl_path) as f:
        data = [json.loads(line) for line in f]
    cols = {
        "qid": [x["qid"] for x in data],
        "video_id": [(id_map or {}).get(x["vid_name"], x["vid_name"]) for x in data],
        "start": [float(x["ts"].split("-")[0]) for x in data],
        "end": [float(x["ts"].split("-")[1]) for x in data],
        "question": [x["q"] for x in data],
    }
    for i in range(n_candidates):
        cols[f"a{i}"] = [strip_period(x[f"a{i}"]) for x in data]
    if with_answers:
        cols["answer_id"] = [x["answer_idx"] for x in data]
    df = pd.DataFrame(cols)
    df.to_csv(csv_path, index=False)
    return df


def resplit_features_per_clip(features, clip_names, get) -> Dict:
    """Re-split per-YouTube-video features into per-clip features using
    '<vid>_<start>_<end>' clip names (preproc_how2qa.py:16-29)."""
    out = {}
    for name in clip_names:
        base = "_".join(name.split("_")[:-2])
        feat = get(base)
        if feat is not None:
            start, end = int(name.split("_")[-2]), int(name.split("_")[-1])
            out[name] = feat[start: end + 1].copy()
        else:
            feat = get(name)
            if feat is not None:
                out[name] = feat
    return out
