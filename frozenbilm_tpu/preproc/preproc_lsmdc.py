"""LSMDC fill-in-blank preproc: tab-separated annotation files -> csvs +
top-1000 answer vocabulary; rows without a blank are dropped
(reference preproc/preproc_lsmdc.py:7-38).

Run: python -m frozenbilm_tpu.preproc.preproc_lsmdc --data_dir $DATA_DIR/LSMDC
"""

import argparse
import json
import os

import pandas as pd

from frozenbilm_tpu.preproc.common import build_top_k_vocab

COLUMNS = ["video_id", "start_aligned", "end_aligned", "start_extracted",
           "end_extracted", "sentence", "question", "answer"]


def main(args):
    for split in ["training", "val", "test"]:
        data = pd.read_csv(
            os.path.join(args.data_dir, f"LSMDC16_annos_{split}_FIB.csv"), sep="\t")
        data.columns = COLUMNS
        df = pd.DataFrame({
            "video_id": list(data["video_id"]),
            "question": list(data["question"]),
            "answer": list(data["answer"]),
        })
        if split == "training":
            vocab = build_top_k_vocab(data["answer"], 1000)
            df = df[df["answer"].isin(vocab)]
            json.dump(vocab, open(os.path.join(args.data_dir, "vocab.json"), "w"))
        df = df[df["question"].str.contains("_____")]
        df.to_csv(os.path.join(args.data_dir, f"{split}.csv"), index=False)
        print(split, len(df))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--data_dir", required=True)
    main(p.parse_args())
