"""Tokenizer factory + static-shape batch encoding.

Mirrors reference model/__init__.py:94-112 (DeBERTa sentencepiece, BERT
WordPiece, GPT-2 BPE with pad=eos + right padding), loading local files only.

TPU-first: the reference pads each batch to its longest sequence
(main.py:50), which would retrigger XLA compilation on every new length.
We pad to a fixed max_tokens (or a small set of length buckets) and mask.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np


def get_tokenizer(args):
    """Build the HF tokenizer for args.model_name (local files only)."""
    from transformers import BertTokenizer, DebertaV2Tokenizer, GPT2Tokenizer

    path = getattr(args, "tokenizer_path", "") or os.path.join(
        os.environ.get("TRANSFORMERS_CACHE", ""), args.model_name
    )
    if "deberta" in args.model_name:
        try:
            tok = DebertaV2Tokenizer.from_pretrained(path, local_files_only=True)
        except Exception:
            # slow tokenizer needs sentencepiece; fall back to the fast
            # (tokenizers-json) implementation when only tokenizer.json exists
            from transformers import DebertaV2TokenizerFast

            tok = DebertaV2TokenizerFast.from_pretrained(path, local_files_only=True)
    elif "bert" in args.model_name:
        tok = BertTokenizer.from_pretrained(path, local_files_only=True)
    elif "gpt-neo" in args.model_name or "gpt-j" in args.model_name:
        tok = GPT2Tokenizer.from_pretrained(path, local_files_only=True)
        tok.pad_token = tok.eos_token
        tok.padding_side = "right"
        tok.truncation_side = "right"
    else:
        raise NotImplementedError(args.model_name)
    return tok


def pick_bucket(length: int, buckets: Optional[Sequence[int]], max_tokens: int) -> int:
    """Smallest bucket >= length, else max_tokens."""
    if buckets:
        for b in sorted(buckets):
            if length >= 1 and length <= b <= max_tokens:
                return b
    return max_tokens


def encode_batch(
    tokenizer,
    texts: List[str],
    max_tokens: int,
    *,
    buckets: Optional[Sequence[int]] = None,
    left_pad: bool = False,
):
    """Tokenize to fixed-length numpy arrays with a special-tokens mask.

    Returns dict(input_ids, attention_mask, special_tokens_mask) int32/int64.
    With `buckets`, pads to the smallest bucket that fits the batch (a few
    static shapes instead of one per batch). `left_pad` supports AR scoring
    (videoqa_ar.py:178-179 pads/truncates on the left).
    """
    enc = tokenizer(
        texts,
        add_special_tokens=True,
        max_length=max_tokens,
        padding=False,
        truncation=True,
        return_special_tokens_mask=True,
    )
    ids_list = enc["input_ids"]
    longest = max(len(x) for x in ids_list)
    target = pick_bucket(longest, buckets, max_tokens)
    target = max(target, longest)

    pad_id = tokenizer.pad_token_id if tokenizer.pad_token_id is not None else 0
    B = len(ids_list)
    input_ids = np.full((B, target), pad_id, np.int32)
    attention_mask = np.zeros((B, target), np.int32)
    special = np.ones((B, target), np.int32)  # padding counts as special
    for i, (ids, sp) in enumerate(zip(ids_list, enc["special_tokens_mask"])):
        L = len(ids)
        sl = slice(target - L, target) if left_pad else slice(0, L)
        input_ids[i, sl] = ids
        attention_mask[i, sl] = 1
        special[i, sl] = sp
    return {
        "input_ids": input_ids,
        "attention_mask": attention_mask,
        "special_tokens_mask": special,
    }


def strip_sep_tokens(batch: dict, sep_token_id: int, pad_token_id: int) -> dict:
    """Remove [SEP] when running without suffix/context (videoqa.py:151-155)."""
    ids = batch["input_ids"].copy()
    am = batch["attention_mask"].copy()
    is_sep = ids == sep_token_id
    am[is_sep] = 0
    ids[is_sep] = pad_token_id
    return {**batch, "input_ids": ids, "attention_mask": am}


def answers_to_token_ids(tokenizer, answers: List[str], max_atokens: int = 5) -> np.ndarray:
    """a2tok table: tokenize every vocab answer without special tokens, pad to
    max_atokens (reference videoqa.py:366-380)."""
    pad_id = tokenizer.pad_token_id if tokenizer.pad_token_id is not None else 0
    out = np.full((len(answers), max_atokens), pad_id, np.int64)
    for i, ans in enumerate(answers):
        ids = tokenizer(str(ans), add_special_tokens=False)["input_ids"][:max_atokens]
        out[i, : len(ids)] = ids
    return out


def parse_length_buckets(args) -> Optional[List[int]]:
    """--length_buckets "32,64,128" -> [32, 64, 128] (None when unset).

    Shared by every driver's encode path: batches pad to the smallest bucket
    that fits instead of always max_tokens, trading a handful of XLA
    compilations for less padded compute (SURVEY.md §7.1 'data/')."""
    raw = getattr(args, "length_buckets", "")
    return [int(x) for x in raw.split(",") if x.strip()] if raw else None
