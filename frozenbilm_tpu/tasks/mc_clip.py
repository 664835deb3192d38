"""CLIP zero-shot multiple-choice baseline (eval-only).

Mirrors reference mc_clip.py (evaluate :18, main :108): per candidate,
encode "Question: … Is it '{ai}'?"-style prompts with the CLIP text tower;
logit = dot(frame-0 visual feature, text feature) per sample (:40-47);
prediction = argmax over candidates.
"""

from __future__ import annotations

import json
import os
from collections import namedtuple
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from frozenbilm_tpu.config import CLIPTextConfig, get_args_parser
from frozenbilm_tpu.data.loader import DataLoader
from frozenbilm_tpu.data.mc import build_mc_dataset, mc_collate
from frozenbilm_tpu.models.clip import clip_encode_text
from frozenbilm_tpu.parallel.mesh import (
    host_gather_results,
    init_distributed,
    is_main_process,
    loader_shard_kwargs,
)
from frozenbilm_tpu.tasks.videoqa_clip import (
    clip_tokenize,
    get_clip_tokenizer,
    load_clip_text_params,
)
from frozenbilm_tpu.utils.metrics import MetricLogger


def evaluate(text_params, text_cfg, tokenizer, data_loader, dataset_name, args,
             split="test", type_map=None):
    encode = jax.jit(lambda ids: clip_encode_text(text_params, text_cfg, ids))
    metric_logger = MetricLogger()
    res: Dict = {}
    for batch_dict in metric_logger.log_every(data_loader, args.print_freq, f"{split}:"):
        video = np.asarray(batch_dict["video"], np.float32)
        n_cand = len(batch_dict["text"])
        B = len(video)
        logits = np.zeros((B, n_cand), np.float32)
        for aid in range(n_cand):
            ids = clip_tokenize(tokenizer, batch_dict["text"][aid])
            feats = np.asarray(encode(jnp.asarray(ids)))  # (B, D)
            logits[:, aid] = np.einsum("bd,bd->b", video[:, 0], feats)  # diag (:40-47)
        preds = logits.argmax(1) if n_cand > 1 else np.round(logits[:, 0]).astype(int)
        hidden = int(batch_dict["answer_id"][0]) == -1
        if not hidden:
            gt = np.asarray(batch_dict["answer_id"])
            agree = preds == gt
            for i, qid in enumerate(batch_dict["qid"]):
                res[qid] = {"pred": int(preds[i]), "gt": int(gt[i]),
                            "type": int(batch_dict["type"][i]), "acc": bool(agree[i])}
            metric_logger.update(acc=float(agree.mean()))
        else:
            for i, qid in enumerate(batch_dict["qid"]):
                res[str(qid)] = int(preds[i])

    results = host_gather_results(res)
    assert len(results) == len(data_loader.dataset)
    if results and isinstance(next(iter(results.values())), dict):
        acc = sum(int(r["acc"]) for r in results.values()) / len(results)
        if is_main_process():
            print(dataset_name)
            print(f"{split} acc: {acc: .2%}")
        return results, acc
    return results, 0


def main(args):
    from frozenbilm_tpu.utils.platform import setup_runtime

    setup_runtime(args)
    init_distributed()
    assert args.max_feats == 1, "CLIP baseline uses one frame"
    if is_main_process() and args.save_dir:
        os.makedirs(args.save_dir, exist_ok=True)

    tokenizer = get_clip_tokenizer(args)
    text_cfg = CLIPTextConfig(projection_dim=args.features_dim)
    text_params = load_clip_text_params(args, text_cfg)
    if args.quantize != "none":
        from frozenbilm_tpu.ops.quant import quantize_tree

        text_params = jax.jit(quantize_tree)(text_params)

    nt = namedtuple("data", ["dataset_name", "loader_test", "dataset"])
    tuples = []
    for dset_name in args.combine_datasets_val:
        split = "val" if (args.eval and not args.test) else "test"
        # the mc prompt for CLIP carries no [MASK]; pass an empty mask token
        ds = build_mc_dataset(dset_name, split, args, mask_token="")
        tuples.append(nt(dset_name, DataLoader(ds, args.batch_size_val,
                                               collate_fn=mc_collate,
                                               **loader_shard_kwargs()), ds))

    log = []
    for item in tuples:
        results, acc = evaluate(text_params, text_cfg, tokenizer, item.loader_test,
                                item.dataset_name, args,
                                split="val" if (args.eval and not args.test) else "test",
                                type_map=item.dataset.type_map)
        if args.save_dir and is_main_process():
            json.dump(results, open(os.path.join(args.save_dir, f"{item.dataset_name}.json"), "w"))
            json.dump({"acc": acc}, open(os.path.join(args.save_dir, "acc_val.json"), "w"))
        log.append({item.dataset_name: acc})
    return log


if __name__ == "__main__":
    import argparse

    parser = argparse.ArgumentParser(parents=[get_args_parser()])
    main(parser.parse_args())
