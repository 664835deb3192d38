"""How2QA preproc (reference preproc/preproc_how2qa.py):
  - subtitles jsonl -> pkl (:10-14)
  - per-YouTube-video features re-split per 60s clip (:16-29)
  - train jsonl -> csv with 4 candidates (:31-115)
  - public val csv: timestamps remapped into the per-minute clips (:118-183)

Run: python -m frozenbilm_tpu.preproc.preproc_how2qa --data_dir $DATA_DIR/How2QA
"""

import argparse
import json
import os

import pandas as pd

from frozenbilm_tpu.data.features import PackedFeatureStore, open_feature_store
from frozenbilm_tpu.preproc.common import (
    jsonl_subtitles_to_pkl,
    mc_jsonl_to_csv,
    resplit_features_per_clip,
    strip_period,
)


def main(args):
    d = args.data_dir
    id2vid = {}
    map_path = os.path.join(d, "how2_vid_mapping.json")
    if os.path.exists(map_path):
        id2vid = json.load(open(map_path))

    subs = jsonl_subtitles_to_pkl(os.path.join(d, "subtitles.jsonl"),
                                  os.path.join(d, "subtitles.pkl"))

    store = open_feature_store(args.features_path or os.path.join(d, "clipvitl14.pth"))
    new_feats = resplit_features_per_clip(store, list(subs), store.get)
    print(len(new_feats), len(subs))
    PackedFeatureStore.write(os.path.join(d, "clipvitl14_split"), new_feats,
                             dim=next(iter(new_feats.values())).shape[1] if new_feats else 768)

    train_jsonl = os.path.join(args.release_dir or d, "how2qa_train_release.jsonl")
    mc_jsonl_to_csv(train_jsonl, os.path.join(d, "train.csv"), 4,
                    with_answers=True, id_map=id2vid)

    # public val: remap absolute timestamps into per-minute clip windows
    df = pd.read_csv(os.path.join(d, "how2QA_val_release.csv"))
    df.columns = ["vid_id", "timesteps", "a1", "a2", "a3", "question", "a0"]
    rows = []
    for i, row in df.iterrows():
        start = int(float(row["timesteps"].split(":")[0][1:]))
        sixty = start // 60
        end = int(float(row["timesteps"].split(":")[1][:-1]))
        rows.append({
            "qid": i,
            "question": row["question"],
            "answer_id": 0,  # a0 is always the correct candidate here
            "video_id": f"{row['vid_id']}_{sixty * 60}_{(sixty + 1) * 60}",
            "a0": strip_period(row["a0"]), "a1": strip_period(row["a1"]),
            "a2": strip_period(row["a2"]), "a3": strip_period(row["a3"]),
            "start": start - sixty * 60, "end": end - sixty * 60,
        })
    val_df = pd.DataFrame(rows)
    val_df.to_csv(os.path.join(d, "public_val.csv"), index=False)
    print(len(val_df))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--data_dir", required=True)
    p.add_argument("--features_path", default="")
    p.add_argument("--release_dir", default="")
    main(p.parse_args())
