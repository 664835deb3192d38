"""WebVid annotation preproc: raw results csvs -> (text, video_id) caption
csvs (reference preproc/preproc_webvid.py:4-21).

Run: python -m frozenbilm_tpu.preproc.preproc_webvid --data_dir $DATA_DIR/WebVid
"""

import argparse
import os

import pandas as pd


def main(args):
    for raw, out in [("results_10M_train.csv", "train_captions.csv"),
                     ("results_2M_val.csv", "val_captions.csv")]:
        df = pd.read_csv(os.path.join(args.data_dir, raw))
        pd.DataFrame({"text": list(df["name"]), "video_id": list(df["videoid"])},
                     columns=["text", "video_id"]).to_csv(
            os.path.join(args.data_dir, out))
        print(out, len(df))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--data_dir", required=True)
    main(p.parse_args())
