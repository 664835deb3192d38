"""Model factory: dispatch on model_name like the reference
(model/__init__.py:14-91) but returning a functional ModelBundle
(config + init/forward/answer functions) instead of an nn.Module.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Callable, Optional

from frozenbilm_tpu.config import (
    VideoTextConfig,
    build_videotext_config,
    config_from_hf_dict,
    model_config_for,
)


@dataclass
class ModelBundle:
    family: str  # deberta | bert | gptneo | gptj
    cfg: object
    vt: VideoTextConfig
    init_params: Callable  # (rng) -> params
    forward: Callable  # (params, cfg, vt, ...) -> output
    set_answer_embeddings: Optional[Callable] = None  # (params, a2tok) -> params
    score: Optional[Callable] = None  # AR teacher-forced scoring
    answer_logits: Optional[Callable] = None  # (params, hidden) -> (.., n_ans)
    greedy: Optional[Callable] = None  # AR KV-cache greedy decoding
    beam: Optional[Callable] = None  # AR KV-cache beam-search decoding
    speculative: Optional[Callable] = None  # prompt-lookup greedy decoding
    prefill: Optional[Callable] = None  # prompt prefix -> KV cache dict
    score_with_prefix: Optional[Callable] = None  # (params, cfg, prefix, tgt)


def family_of(model_name: str) -> str:
    if "deberta" in model_name:
        return "deberta"
    if "bert" in model_name:
        return "bert"
    if "gpt-neo" in model_name:
        return "gptneo"
    if "gpt-j" in model_name:
        return "gptj"
    raise NotImplementedError(model_name)


def _resolve_cfg(args, family: str):
    """Read an HF config.json when a local model dir exists, else defaults."""
    path = getattr(args, "tokenizer_path", "") or os.path.join(
        os.environ.get("TRANSFORMERS_CACHE", ""), args.model_name
    )
    cfg_path = os.path.join(path, "config.json")
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            return config_from_hf_dict(family, json.load(f))
    return model_config_for(args.model_name)


def build_model(args) -> ModelBundle:
    family = family_of(args.model_name)
    vt = build_videotext_config(args)
    cfg = _resolve_cfg(args, family)

    if family == "deberta":
        from frozenbilm_tpu.models import deberta as m

        return ModelBundle(
            family, cfg, vt,
            init_params=lambda rng: m.init_deberta_params(rng, cfg, vt),
            forward=m.deberta_forward,
            set_answer_embeddings=lambda p, a2tok: m.set_answer_embeddings(
                p, a2tok, pad_token_id=cfg.pad_token_id),
            answer_logits=lambda p, h: m.deberta_answer_logits(p, cfg, h),
        )
    if family == "bert":
        # the reference asserts no adapters/scratch for BERT (model/__init__.py:49-51)
        assert not vt.ds_factor_attn and not vt.ds_factor_ff and not args.scratch
        from frozenbilm_tpu.models import bert as m

        return ModelBundle(
            family, cfg, vt,
            init_params=lambda rng: m.init_bert_params(rng, cfg, vt),
            forward=m.bert_forward,
            set_answer_embeddings=lambda p, a2tok: m.set_answer_embeddings_bert(
                p, a2tok, pad_token_id=cfg.pad_token_id),
            answer_logits=lambda p, h: m.bert_answer_logits(p, cfg, h),
        )
    if family in ("gptneo", "gptj"):
        assert not vt.ds_factor_attn and not vt.ds_factor_ff and not args.scratch
        if family == "gptneo":
            from frozenbilm_tpu.models import gptneo as m

            return ModelBundle(
                family, cfg, vt,
                init_params=lambda rng: m.init_gptneo_params(rng, cfg, vt),
                forward=m.gptneo_forward,
                score=m.gptneo_score,
                greedy=m.gptneo_greedy_cached,
                beam=m.gptneo_beam_cached,
                speculative=m.gptneo_speculative_cached,
                prefill=m.gptneo_prefill,
                score_with_prefix=m.gptneo_score_with_prefix,
            )
        from frozenbilm_tpu.models import gptj as m

        return ModelBundle(
            family, cfg, vt,
            init_params=lambda rng: m.init_gptj_params(rng, cfg, vt),
            forward=m.gptj_forward,
            score=m.gptj_score,
            greedy=m.gptj_greedy_cached,
            beam=m.gptj_beam_cached,
            speculative=m.gptj_speculative_cached,
            prefill=m.gptj_prefill,
            score_with_prefix=m.gptj_score_with_prefix,
        )
    raise NotImplementedError(family)
