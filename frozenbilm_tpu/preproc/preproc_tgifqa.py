"""TGIF-QA (FrameQA) preproc: top-1000 vocabulary from train answers,
feature-availability + in-vocab filtering of the train split
(reference preproc/preproc_tgifqa.py:10-64).

Run: python -m frozenbilm_tpu.preproc.preproc_tgifqa --data_dir $DATA_DIR/TGIF-QA \
       --features_path $DATA_DIR/TGIF-QA/clipvitl14
"""

import argparse
import json
import os

import pandas as pd

from frozenbilm_tpu.data.features import open_feature_store
from frozenbilm_tpu.preproc.common import build_top_k_vocab


def main(args):
    train = pd.read_csv(os.path.join(args.data_dir, "dataset", "Train_frameqa_question.csv"),
                        delimiter="\t")
    test = pd.read_csv(os.path.join(args.data_dir, "dataset", "Test_frameqa_question.csv"),
                       delimiter="\t")
    vocab = build_top_k_vocab(train["answer"].values, 1000)
    json.dump(vocab, open(os.path.join(args.data_dir, "vocab.json"), "w"))

    store = open_feature_store(args.features_path)
    train["video_id"] = train["gif_name"]
    test["video_id"] = test["gif_name"]
    train = train[train["gif_name"].apply(lambda v: v in store)]
    train = train[train["answer"].isin(vocab)]
    train.to_csv(os.path.join(args.data_dir, "train_frameqa.csv"), index=False)
    test.to_csv(os.path.join(args.data_dir, "test_frameqa.csv"), index=False)
    print(len(train), len(test))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--data_dir", required=True)
    p.add_argument("--features_path", required=True)
    main(p.parse_args())
