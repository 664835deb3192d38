"""Full-scale TPU smoke test: the real videoqa driver with the actual
deberta-v2-xlarge architecture (0.9B params, bf16 frozen weights) on
synthetic MSVD-style data. Random-init weights — verifies the end-to-end
driver (tokenizer -> datasets -> jitted eval -> metrics -> JSON artifacts)
at production scale, not accuracy.

An offline DebertaV2TokenizerFast (tokenizer.json WordPiece with the real
[MASK]=128000 id) stands in for the sentencepiece tokenizer, which cannot be
built in this image.

Run: python scripts/tpu_smoke.py [workdir]
"""

import json
import os
import pickle
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_fixtures(root: str) -> None:
    from tokenizers import Tokenizer, models, pre_tokenizers, processors

    tok_dir = os.path.join(root, "deberta-v2-xlarge")
    os.makedirs(tok_dir, exist_ok=True)
    words = ["question", "answer", "what", "is", "this", "doing", "a", "the",
             "cat", "dog", "bird", "park", "run", "sleep", "playing", "man",
             "woman", "?", ".", "subtitles"]
    vocab = {"[PAD]": 0, "[CLS]": 1, "[SEP]": 2, "[UNK]": 3}
    for i, w in enumerate(words):
        vocab[w] = 4 + i
    vocab["[MASK]"] = 128000  # the real deberta-v2 mask id
    tok = Tokenizer(models.WordPiece(vocab, unk_token="[UNK]"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    tok.post_processor = processors.TemplateProcessing(
        single="[CLS] $A [SEP]", pair="[CLS] $A [SEP] $B [SEP]",
        special_tokens=[("[CLS]", 1), ("[SEP]", 2)])
    tok.save(os.path.join(tok_dir, "tokenizer.json"))
    from transformers import DebertaV2TokenizerFast

    t = DebertaV2TokenizerFast(
        tokenizer_file=os.path.join(tok_dir, "tokenizer.json"),
        mask_token="[MASK]", pad_token="[PAD]", sep_token="[SEP]",
        cls_token="[CLS]", unk_token="[UNK]")
    t.save_pretrained(tok_dir)
    json.dump({
        "vocab_size": 128100, "hidden_size": 1536, "num_hidden_layers": 24,
        "num_attention_heads": 24, "intermediate_size": 6144,
        "max_position_embeddings": 512, "relative_attention": True,
        "position_buckets": 256, "norm_rel_ebd": "layer_norm",
        "share_att_key": True, "pos_att_type": "p2c|c2p",
        "position_biased_input": False, "conv_kernel_size": 3,
        "conv_act": "gelu", "type_vocab_size": 0, "layer_norm_eps": 1e-7,
        "pad_token_id": 0,
    }, open(os.path.join(tok_dir, "config.json"), "w"))

    data = os.path.join(root, "MSVD-QA")
    os.makedirs(data, exist_ok=True)
    rng = np.random.default_rng(0)
    answers = ["cat", "dog", "bird", "park", "run", "sleep"]
    n = 64
    rows = {"video_id": [f"v{i % 8}" for i in range(n)],
            "question": ["what is the man doing"] * n,
            "answer": [answers[i % 6] for i in range(n)],
            "type": [i % 3 for i in range(n)]}
    for s in ("train", "val", "test"):
        pd.DataFrame(rows).to_csv(os.path.join(data, f"{s}.csv"), index=False)
    json.dump({a: i for i, a in enumerate(answers)},
              open(os.path.join(data, "vocab.json"), "w"))
    from frozenbilm_tpu.data.features import PackedFeatureStore

    feats = {f"v{i}": rng.normal(size=(rng.integers(5, 30), 768)).astype(np.float16)
             for i in range(8)}
    PackedFeatureStore.write(os.path.join(data, "clipvitl14"), feats, dim=768)
    pickle.dump({"v0": "the man is playing", "v3": "a woman sleep"},
                open(os.path.join(data, "subtitles.pkl"), "wb"))


def main(root: str) -> None:
    build_fixtures(root)
    from frozenbilm_tpu.config import get_args_parser
    from frozenbilm_tpu.tasks.videoqa import main as videoqa_main

    args = get_args_parser().parse_args([
        "--combine_datasets", "msvd", "--combine_datasets_val", "msvd",
        "--model_name", "deberta-v2-xlarge",
        "--tokenizer_path", os.path.join(root, "deberta-v2-xlarge"),
        "--msvd_features_path", os.path.join(root, "MSVD-QA/clipvitl14"),
        "--msvd_train_csv_path", os.path.join(root, "MSVD-QA/train.csv"),
        "--msvd_val_csv_path", os.path.join(root, "MSVD-QA/val.csv"),
        "--msvd_test_csv_path", os.path.join(root, "MSVD-QA/test.csv"),
        "--msvd_vocab_path", os.path.join(root, "MSVD-QA/vocab.json"),
        "--msvd_subtitles_path", os.path.join(root, "MSVD-QA/subtitles.pkl"),
        "--ds_factor_attn", "8", "--ds_factor_ff", "8",
        "--max_feats", "10", "--max_tokens", "64", "--batch_size_val", "32",
        "--print_freq", "1", "--param_dtype", "bfloat16", "--suffix", ".",
        "--eval", "--save_dir", os.path.join(root, "out"),
    ])
    videoqa_main(args)
    summary = json.load(open(os.path.join(root, "out", "msvdsummary.json")))
    print("SMOKE OK:", summary)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/fullscale_smoke")
