"""TVQA preproc (reference preproc/preproc_tvqa.py): subtitles jsonl -> pkl,
per-split jsonl -> csv with 5 candidates (test splits have no answers).

Run: python -m frozenbilm_tpu.preproc.preproc_tvqa --data_dir $DATA_DIR/TVQA
"""

import argparse
import os

from frozenbilm_tpu.preproc.common import jsonl_subtitles_to_pkl, mc_jsonl_to_csv


def main(args):
    d = args.data_dir
    jsonl_subtitles_to_pkl(os.path.join(d, "tv_subtitles.jsonl"),
                           os.path.join(d, "subtitles.pkl"))
    for split in ["train", "val", "test_public", "test_release"]:
        path = os.path.join(d, f"tvqa_{split}.jsonl")
        if not os.path.exists(path):
            continue
        df = mc_jsonl_to_csv(
            path, os.path.join(d, f"{split}.csv"), 5,
            with_answers=split not in ("test_public", "test_release"),
        )
        print(split, len(df))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--data_dir", required=True)
    main(p.parse_args())
