"""BERT masked LM with visual prefix tokens (no adapters) — TPU-native.

Behavioral spec (reference model/bert.py):
  - video projection prepended to word embeddings          (bert.py:234-260)
  - attention mask extended by video_mask concat           (bert.py:628-633)
  - absolute position embeddings: video tokens consume
    position ids 0..max_feats-1, text follows              (bert.py:242-276)
  - MLM head transform + decoder tied to word embeddings,
    with answer-embedding override in downstream mode      (bert.py:74-107, 838-842)
  - answer module and set_answer_embeddings                (bert.py:754-790)

Padded *query* rows differ from torch at unused positions: our masked softmax
zeroes fully-masked rows (reference BERT adds finfo.min and yields uniform
attention there); every consumer reads only valid positions.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from frozenbilm_tpu.config import BertConfig, VideoTextConfig
from frozenbilm_tpu.models.common import (
    ACT2FN,
    RngStream,
    dropout,
    embedding_init,
    layer_norm,
    layer_norm_init,
    linear,
    linear_init,
    merge_heads,
    split_heads,
)
from frozenbilm_tpu.models.deberta import compute_answer_embeddings
from frozenbilm_tpu.ops.masking import cross_entropy_ignore_index, masked_softmax


class BertOutput(NamedTuple):
    logits: jax.Array
    loss: Optional[jax.Array]
    last_hidden_state: jax.Array


def _init_layer(key, cfg: BertConfig):
    keys = iter(jax.random.split(key, 8))
    std = cfg.initializer_range
    h, inter = cfg.hidden_size, cfg.intermediate_size
    return {
        "attention": {
            "self": {
                "query": linear_init(next(keys), h, h, std),
                "key": linear_init(next(keys), h, h, std),
                "value": linear_init(next(keys), h, h, std),
            },
            "output": {
                "dense": linear_init(next(keys), h, h, std),
                "LayerNorm": layer_norm_init(h),
            },
        },
        "intermediate": {"dense": linear_init(next(keys), h, inter, std)},
        "output": {
            "dense": linear_init(next(keys), inter, h, std),
            "LayerNorm": layer_norm_init(h),
        },
    }


def init_bert_params(key, cfg: BertConfig, vt: VideoTextConfig):
    keys = iter(jax.random.split(key, 12))
    std = cfg.initializer_range
    h = cfg.hidden_size
    embeddings = {
        "word_embeddings": embedding_init(next(keys), cfg.vocab_size, h, std, pad_idx=cfg.pad_token_id),
        "position_embeddings": embedding_init(next(keys), cfg.max_position_embeddings, h, std),
        "token_type_embeddings": embedding_init(next(keys), cfg.type_vocab_size, h, std),
        "LayerNorm": layer_norm_init(h),
    }
    if vt.features_dim:
        embeddings["linear_video"] = linear_init(next(keys), vt.features_dim, h, std)
    layer_keys = jax.random.split(next(keys), cfg.num_hidden_layers)
    layers = jax.vmap(lambda k: _init_layer(k, cfg))(layer_keys)
    # decoder weight is tied to word embeddings (HF tie_word_embeddings).
    lm_head = {
        "dense": linear_init(next(keys), h, h, std),
        "LayerNorm": layer_norm_init(h),
        "bias": jnp.zeros((cfg.vocab_size,)),
    }
    params = {"embeddings": embeddings, "encoder": {"layers": layers}, "lm_head": lm_head}
    if vt.n_ans:
        params["answers"] = {
            "embeddings": embedding_init(next(keys), vt.n_ans, h, std),
            "bias": jnp.zeros((vt.n_ans,)),
        }
    return params


def set_answer_embeddings_bert(params, a2tok, pad_token_id: int = 0):
    """Same mean-pooled answer embeddings as DeBERTa (bert.py:770-790),
    including the dead answer-bias write quirk (values stay init/ckpt)."""
    emb = compute_answer_embeddings(params["embeddings"]["word_embeddings"], a2tok, pad_token_id)
    n_ans = emb.shape[0]
    old = params.get("answers")
    bias = old["bias"] if old is not None and old["bias"].shape[0] == n_ans else jnp.zeros((n_ans,), emb.dtype)
    new = dict(params)
    new["answers"] = {"embeddings": emb, "bias": bias}
    return new


def _attention(lp_self, cfg, hidden, mask_2d, *, deterministic, rngs):
    nh = cfg.num_attention_heads
    q = split_heads(linear(lp_self["query"], hidden), nh)
    k = split_heads(linear(lp_self["key"], hidden), nh)
    v = split_heads(linear(lp_self["value"], hidden), nh)
    scores = jnp.einsum("bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32)
    scores = scores / math.sqrt(q.shape[-1])
    probs = masked_softmax(scores, mask_2d[:, None, None, :])
    probs = dropout(rngs.next(), probs, cfg.attention_probs_dropout_prob, deterministic)
    ctx = jnp.einsum(
        "bhij,bhjd->bhid", probs.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(v.dtype)
    return merge_heads(ctx)


def _add_norm(p, cfg, hidden, input_tensor, *, deterministic, rngs):
    hidden = linear(p["dense"], hidden)
    hidden = dropout(rngs.next(), hidden, cfg.hidden_dropout_prob, deterministic)
    return layer_norm(p["LayerNorm"], hidden + input_tensor, cfg.layer_norm_eps)


def _layer(lp, cfg, hidden, mask_2d, *, deterministic, rngs):
    ctx = _attention(lp["attention"]["self"], cfg, hidden, mask_2d, deterministic=deterministic, rngs=rngs)
    attn_out = _add_norm(lp["attention"]["output"], cfg, ctx, hidden, deterministic=deterministic, rngs=rngs)
    inter = ACT2FN[cfg.hidden_act](linear(lp["intermediate"]["dense"], attn_out))
    return _add_norm(lp["output"], cfg, inter, attn_out, deterministic=deterministic, rngs=rngs)


def bert_answer_logits(params, cfg: BertConfig, hidden: jax.Array) -> jax.Array:
    """Downstream answer head on arbitrary hidden states (see deberta.py:
    deberta_answer_logits for the rationale)."""
    h = linear(params["lm_head"]["dense"], hidden)
    h = ACT2FN[cfg.hidden_act](h)
    h = layer_norm(params["lm_head"]["LayerNorm"], h, cfg.layer_norm_eps)
    answers = params["answers"]
    return jnp.dot(h, answers["embeddings"].T.astype(h.dtype),
                   preferred_element_type=jnp.float32) + answers["bias"]


def bert_forward(
    params,
    cfg: BertConfig,
    vt: VideoTextConfig,
    input_ids: jax.Array,
    attention_mask: Optional[jax.Array] = None,
    video: Optional[jax.Array] = None,
    video_mask: Optional[jax.Array] = None,
    labels: Optional[jax.Array] = None,
    *,
    mlm: bool = False,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
    remat: bool = False,
    gather_loss_positions: int = 0,
    act_constraint=None,
) -> BertOutput:
    B, T = input_ids.shape
    if attention_mask is None:
        attention_mask = jnp.ones((B, T), dtype=jnp.int32)
    emb_p = params["embeddings"]
    use_video = vt.features_dim and video is not None
    if use_video:
        if video_mask is None:
            video_mask = jnp.ones(video.shape[:2], dtype=jnp.int32)
        attention_mask = jnp.concatenate(
            [video_mask.astype(attention_mask.dtype), attention_mask], axis=1
        )

    rngs = RngStream(rng)
    words = emb_p["word_embeddings"][input_ids]
    if use_video:
        video_emb = linear(emb_p["linear_video"], video.astype(words.dtype))
        x = jnp.concatenate([video_emb, words], axis=1)
    else:
        x = words
    L = x.shape[1]
    x = x + emb_p["position_embeddings"][:L][None]
    x = x + emb_p["token_type_embeddings"][0][None, None, :]
    x = layer_norm(emb_p["LayerNorm"], x, cfg.layer_norm_eps)
    x = dropout(rngs.next(), x, cfg.hidden_dropout_prob, deterministic)

    def step(carry, lp):
        h, key = carry
        if key is not None:
            key, sub = jax.random.split(key)
        else:
            sub = None
        out = _layer(lp, cfg, h, attention_mask, deterministic=deterministic, rngs=RngStream(sub))
        if act_constraint is not None:
            # sequence-parallel hook (parallel/sp.py) — see deberta_forward
            out = act_constraint(out)
        return (out, key), None

    if remat:
        step = jax.checkpoint(
            step, policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
    if act_constraint is not None:
        x = act_constraint(x)
    (hidden, _), _ = jax.lax.scan(step, (x, rngs.next()), params["encoder"]["layers"])

    if labels is not None and use_video:
        video_labels = jnp.full(video.shape[:2], -100, dtype=labels.dtype)
        labels = jnp.concatenate([video_labels, labels], axis=1)

    # per-row masked-position gather before the full-vocab head — same
    # TPU-BERT max_predictions_per_seq trick as deberta_forward (exact while
    # every row's label count <= K; see that docstring)
    head_in = hidden
    if labels is not None and gather_loss_positions and (
            params.get("answers") is None or mlm):
        L = hidden.shape[1]
        K = min(int(gather_loss_positions), L)
        prio = (labels != -100).astype(jnp.int32) * L - jnp.arange(L)[None, :]
        _, idx = jax.lax.top_k(prio, K)
        head_in = jnp.take_along_axis(hidden, idx[..., None], axis=1)
        labels = jnp.take_along_axis(labels, idx, axis=1)

    # MLM head (bert.py:74-107)
    h = linear(params["lm_head"]["dense"], head_in)
    h = ACT2FN[cfg.hidden_act](h)
    h = layer_norm(params["lm_head"]["LayerNorm"], h, cfg.layer_norm_eps)
    answers = params.get("answers")
    if answers is not None and not mlm:
        logits = jnp.dot(h, answers["embeddings"].T.astype(h.dtype),
                         preferred_element_type=jnp.float32) + answers["bias"]
    else:
        logits = jnp.dot(h, emb_p["word_embeddings"].T.astype(h.dtype),
                         preferred_element_type=jnp.float32) + params["lm_head"]["bias"]

    loss = None
    if labels is not None:
        loss = cross_entropy_ignore_index(logits, labels)

    return BertOutput(logits=logits, loss=loss, last_hidden_state=hidden)
