"""CLIP zero-shot open-ended VideoQA baseline (eval-only).

Mirrors reference videoqa_clip.py (evaluate :19, main :130): for each
question, every vocabulary answer is rendered as "Question: {q} Answer:
{candidate}", encoded by the CLIP text tower, and scored by the raw dot
product with the frame-0 CLIP visual feature (:42-52). max_feats must be 1.

Run: python -m frozenbilm_tpu.tasks.videoqa_clip --combine_datasets msrvtt \
       --combine_datasets_val msrvtt --eval --max_feats 1 ...
"""

from __future__ import annotations

import json
import os
from collections import namedtuple
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from frozenbilm_tpu.config import CLIPTextConfig, get_args_parser
from frozenbilm_tpu.data.loader import DataLoader
from frozenbilm_tpu.data.videoqa_clip import build_videoqa_clip_dataset, videoqa_clip_collate
from frozenbilm_tpu.models.clip import clip_encode_text, init_clip_text_params
from frozenbilm_tpu.parallel.mesh import (
    host_gather_results,
    init_distributed,
    is_main_process,
    loader_shard_kwargs,
)
from frozenbilm_tpu.utils.metrics import MetricLogger


def get_clip_tokenizer(args):
    from transformers import CLIPTokenizer

    path = args.tokenizer_path or os.path.join(
        os.environ.get("TRANSFORMERS_CACHE", ""), "clip-vit-large-patch14")
    return CLIPTokenizer.from_pretrained(path, local_files_only=True)


def clip_tokenize(tokenizer, texts: List[str], context_length: int = 77) -> np.ndarray:
    """OpenAI clip.tokenize semantics: [SOT] tokens [EOT], zero-padded to 77,
    truncated (truncate=True keeps EOT as last token)."""
    out = np.zeros((len(texts), context_length), np.int64)
    for i, t in enumerate(texts):
        ids = tokenizer(t, add_special_tokens=True)["input_ids"]
        if len(ids) > context_length:
            ids = ids[: context_length - 1] + [ids[-1]]  # keep EOT
        out[i, : len(ids)] = ids
    return out


def load_clip_text_params(args, cfg: CLIPTextConfig):
    if args.load:
        from frozenbilm_tpu.models.clip import clip_params_from_hf, clip_params_from_openai
        from frozenbilm_tpu.utils.hf_import import load_pth_state_dict

        sd = load_pth_state_dict(args.load)
        if any(k.startswith("visual.") for k in sd):
            _, text = clip_params_from_openai(sd, None, cfg)
        else:
            _, text = clip_params_from_hf(sd, None, cfg)
        return jax.tree.map(jnp.asarray, text)
    if is_main_process():
        print("no --load given: random CLIP text tower (smoke mode)")
    return init_clip_text_params(jax.random.PRNGKey(0), cfg)


def evaluate(text_params, text_cfg, tokenizer, data_loader, dataset_name, args,
             thresholds=(1, 10), split="test", type_map=None):
    encode = jax.jit(lambda ids: clip_encode_text(text_params, text_cfg, ids))
    metric_logger = MetricLogger()
    res: Dict = {}
    for batch_dict in metric_logger.log_every(data_loader, args.print_freq, f"{split}:"):
        video = np.asarray(batch_dict["video"], np.float32)  # (B, 1, D)
        flat_texts = [t for per_q in batch_dict["text"] for t in per_q]
        ids = clip_tokenize(tokenizer, flat_texts)
        # B * n_ans rows (tens of thousands for real vocabularies): encode in
        # fixed-size chunks so one compiled program covers every batch
        from frozenbilm_tpu.data.loader import OneAhead

        CHUNK = 1024
        feats = []
        pipe = OneAhead()  # dispatch chunk k+1 before fetching chunk k
        for s in range(0, len(ids), CHUNK):
            part = ids[s: s + CHUNK]
            n = len(part)
            if n < CHUNK and len(ids) > CHUNK:
                part = np.concatenate([part, np.tile(part[-1:], (CHUNK - n, 1))])
            prev = pipe.submit((encode(jnp.asarray(part)), n))
            if prev is not None:
                feats.append(np.asarray(prev[0])[:prev[1]])
        last = pipe.drain()
        if last is not None:
            feats.append(np.asarray(last[0])[:last[1]])
        text_feats = np.concatenate(feats)  # (B*n_ans, D)
        B = len(video)
        n_ans = len(batch_dict["text"][0])
        text_feats = text_feats.reshape(B, n_ans, -1)
        # raw dot product, no normalization (videoqa_clip.py:42-52)
        logits = np.einsum("bd,bad->ba", video[:, 0], text_feats)
        k = min(max(thresholds), n_ans)
        top_ids = np.argsort(-logits, axis=1)[:, :k]

        gt = np.asarray(batch_dict["answer_id"])
        for i, qid in enumerate(batch_dict["qid"]):
            entry = {"pred": top_ids[i].tolist(), "gt": int(gt[i]),
                     "type": int(batch_dict["type"][i]),
                     "sub": bool(batch_dict["sub"][i])}
            for x in thresholds:
                entry[f"acc{x}"] = float((top_ids[i, :x] == gt[i]).sum())
            res[qid] = entry
        metric_logger.update(acc=float((top_ids[:, 0] == gt).mean()))

    results = host_gather_results(res)
    assert len(results) == len(data_loader.dataset)
    out = {f"acc{x}": sum(r[f"acc{x}"] for r in results.values()) / len(results)
           for x in thresholds}
    if type_map is not None and len(type_map) > 1:
        for t, name in type_map.items():
            of_type = [r for r in results.values() if r["type"] == t]
            if of_type:
                out[name] = sum(r["acc1"] for r in of_type) / len(of_type)
    if is_main_process():
        print(dataset_name)
        for x in thresholds:
            print(f"{split} acc{x}: {out[f'acc{x}']: .2%}")
    return results, out


def main(args):
    from frozenbilm_tpu.utils.platform import setup_runtime

    setup_runtime(args)
    init_distributed()
    assert args.max_feats == 1, "CLIP baseline uses one frame (videoqa_clip.py:200)"
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
        ds = build_videoqa_clip_dataset(dset_name, split, args)
        tuples.append(nt(dset_name, DataLoader(ds, args.batch_size_val,
                                               collate_fn=videoqa_clip_collate,
                                               **loader_shard_kwargs()), ds))

    log = []
    for item in tuples:
        results, out = evaluate(text_params, text_cfg, tokenizer, item.loader_test,
                                item.dataset_name, args,
                                split="val" if (args.eval and not args.test) else "test",
                                type_map=item.dataset.type_map)
        if args.save_dir and is_main_process():
            json.dump(results, open(os.path.join(args.save_dir, f"{item.dataset_name}.json"), "w"))
            json.dump(out, open(os.path.join(args.save_dir, f"{item.dataset_name}summary.json"), "w"))
        log.append({item.dataset_name: out})
    return log


if __name__ == "__main__":
    import argparse

    parser = argparse.ArgumentParser(parents=[get_args_parser()])
    main(parser.parse_args())
