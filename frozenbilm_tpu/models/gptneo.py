"""GPT-Neo causal LM with visual prefix tokens — TPU-native.

Behavioral spec (reference model/gptneo.py):
  - learned absolute positions (wte + wpe)                      (:440-441, :580)
  - alternating global / local sliding-window attention layers;
    local mask = causal XOR tril(causal, -window)               (:159-176)
  - attention weights computed UNSCALED in fp32; causal fill -1e9 then
    additive padding mask                                        (:210-240)
  - serial pre-LN blocks: x += attn(ln_1(x)); x += mlp(ln_2(x)) (:320-360)
  - q/k/v projections bias-free, out_proj biased                (:186-191)
  - lm_head bias-free; video prefix + shifted CE like GPT-J     (:456, :716-760)
  - score(): teacher-forced next-token probs (:1727-1754), computed here as
    one forward over [prompt ‖ targets] (causal equivalence; see gptj.py)

The reference also vendors a full HF generate/greedy_search with a
synced-GPU loop (:850-1726); greedy generation here comes in two forms:
gptneo_greedy (full re-forward per token, the parity oracle) and
gptneo_greedy_cached (ONE prefill + KV-cache lax.scan decode — the
TPU-native incremental path, argmax-parity tested against the former).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from frozenbilm_tpu.config import GPTNeoConfig, VideoTextConfig
from frozenbilm_tpu.models.common import (
    ACT2FN,
    RngStream,
    dropout,
    embedding_init,
    layer_norm,
    layer_norm_init,
    linear,
    linear_init,
)
from frozenbilm_tpu.models.gptj import GPTOutput, NEG_BIAS, NEG_PAD, _score_from_forward
from frozenbilm_tpu.ops.masking import cross_entropy_ignore_index


def _init_layer(key, cfg: GPTNeoConfig):
    keys = iter(jax.random.split(key, 8))
    std = cfg.initializer_range
    h, inter = cfg.hidden_size, cfg.effective_intermediate_size
    return {
        "ln_1": layer_norm_init(h),
        "attn": {
            "q_proj": linear_init(next(keys), h, h, std, bias=False),
            "k_proj": linear_init(next(keys), h, h, std, bias=False),
            "v_proj": linear_init(next(keys), h, h, std, bias=False),
            "out_proj": linear_init(next(keys), h, h, std),  # bias=True
        },
        "ln_2": layer_norm_init(h),
        "mlp": {
            "c_fc": linear_init(next(keys), h, inter, std),
            "c_proj": linear_init(next(keys), inter, h, std),
        },
    }


def init_gptneo_params(key, cfg: GPTNeoConfig, vt: VideoTextConfig):
    keys = iter(jax.random.split(key, 8))
    std = cfg.initializer_range
    h = cfg.hidden_size
    layer_keys = jax.random.split(next(keys), cfg.num_layers)
    params = {
        "wte": embedding_init(next(keys), cfg.vocab_size, h, std),
        "wpe": embedding_init(next(keys), cfg.max_position_embeddings, h, std),
        "layers": jax.vmap(lambda k: _init_layer(k, cfg))(layer_keys),
        "ln_f": layer_norm_init(h),
        "lm_head": linear_init(next(keys), h, cfg.vocab_size, std, bias=False),
    }
    if vt.features_dim:
        params["linear_video"] = linear_init(next(keys), vt.features_dim, h, std)
    return params


def _causal_masks(L: int, window: int):
    """(global, local) boolean masks, numpy constants at trace time."""
    i = np.arange(L)[:, None]
    j = np.arange(L)[None, :]
    causal = j <= i
    local = causal & (j > i - window)  # attend to the last `window` positions
    return causal, local


def _attention(lp_attn, cfg, x, add_mask, allowed, *, deterministic, rngs,
               return_kv: bool = False):
    B, L, H = x.shape
    nh, hd = cfg.num_heads, cfg.head_dim
    q = linear(lp_attn["q_proj"], x).reshape(B, L, nh, hd).transpose(0, 2, 1, 3)
    k = linear(lp_attn["k_proj"], x).reshape(B, L, nh, hd).transpose(0, 2, 1, 3)
    v = linear(lp_attn["v_proj"], x).reshape(B, L, nh, hd).transpose(0, 2, 1, 3)

    # UNSCALED fp32 attention (gptneo.py:210-215)
    w = jnp.einsum("bhid,bhjd->bhij", q.astype(jnp.float32), k.astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    w = jnp.where(allowed[None, None], w, NEG_BIAS)
    if add_mask is not None:
        w = w + add_mask
    probs = jax.nn.softmax(w, axis=-1).astype(v.dtype)
    probs = dropout(rngs.next(), probs, cfg.attention_dropout, deterministic)
    ctx = jnp.einsum("bhij,bhjd->bhid", probs, v,
                     preferred_element_type=jnp.float32).astype(v.dtype)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(B, L, nh * hd)
    out = linear(lp_attn["out_proj"], ctx)
    out = dropout(rngs.next(), out, cfg.resid_dropout, deterministic)
    if return_kv:
        return out, (k, v)
    return out


def _block(lp, cfg, x, add_mask, allowed, *, deterministic, rngs,
           return_kv: bool = False):
    h = layer_norm(lp["ln_1"], x, cfg.layer_norm_epsilon)
    attn_out = _attention(lp["attn"], cfg, h, add_mask, allowed,
                          deterministic=deterministic, rngs=rngs,
                          return_kv=return_kv)
    if return_kv:
        attn_out, kv = attn_out
    x = x + attn_out
    h2 = layer_norm(lp["ln_2"], x, cfg.layer_norm_epsilon)
    ff = linear(lp["mlp"]["c_proj"], ACT2FN[cfg.hidden_act](linear(lp["mlp"]["c_fc"], h2)))
    ff = dropout(rngs.next(), ff, cfg.resid_dropout, deterministic)
    out = x + ff
    if return_kv:
        return out, kv
    return out


def gptneo_forward(
    params,
    cfg: GPTNeoConfig,
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
    position_ids: Optional[jax.Array] = None,
    remat: bool = False,
    return_kv: bool = False,
) -> GPTOutput:
    del mlm
    B, T = input_ids.shape
    if attention_mask is None:
        attention_mask = jnp.ones((B, T), jnp.int32)
    use_video = vt.features_dim and video is not None
    if use_video:
        if video_mask is None:
            video_mask = jnp.ones(video.shape[:2], jnp.int32)
        attention_mask = jnp.concatenate(
            [video_mask.astype(attention_mask.dtype), attention_mask], axis=1)

    rngs = RngStream(rng)
    x = params["wte"][input_ids]
    if use_video:
        v = linear(params["linear_video"], video.astype(x.dtype))
        x = jnp.concatenate([v, x], axis=1)
    L = x.shape[1]
    if position_ids is None:
        position_ids = jnp.arange(L)[None, :]
    x = x + params["wpe"][position_ids]
    x = dropout(rngs.next(), x, cfg.embed_dropout, deterministic)

    add_mask = (1.0 - attention_mask[:, None, None, :].astype(jnp.float32)) * NEG_PAD
    causal_np, local_np = _causal_masks(L, cfg.window_size)
    causal, local = jnp.asarray(causal_np), jnp.asarray(local_np)
    is_local = jnp.asarray([t == "local" for t in cfg.attention_types])

    def step(carry, xs):
        lp, local_flag = xs
        h, key = carry
        if key is not None:
            key, sub = jax.random.split(key)
        else:
            sub = None
        allowed = jnp.where(local_flag, local, causal)
        out = _block(lp, cfg, h, add_mask, allowed,
                     deterministic=deterministic, rngs=RngStream(sub),
                     return_kv=return_kv)
        if return_kv:
            out, kv = out
            return (out, key), kv
        return (out, key), None

    if remat:
        step = jax.checkpoint(
            step, policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
    (x, _), kvs = jax.lax.scan(step, (x, rngs.next()), (params["layers"], is_local))
    x = layer_norm(params["ln_f"], x, cfg.layer_norm_epsilon)
    logits = linear(params["lm_head"], x).astype(jnp.float32)

    loss = None
    if labels is not None:
        if use_video:
            video_labels = jnp.full(video.shape[:2], -100, labels.dtype)
            labels = jnp.concatenate([video_labels, labels], axis=1)
        loss = cross_entropy_ignore_index(logits[:, :-1], labels[:, 1:])

    return GPTOutput(logits=logits, loss=loss, last_hidden_state=x,
                     kv=kvs if return_kv else None)


def gptneo_forward_pp(
    params,
    cfg: GPTNeoConfig,
    vt: VideoTextConfig,
    input_ids: jax.Array,
    attention_mask: Optional[jax.Array] = None,
    video: Optional[jax.Array] = None,
    video_mask: Optional[jax.Array] = None,
    labels: Optional[jax.Array] = None,
    *,
    mesh,
    n_micro: int = 4,
    position_ids: Optional[jax.Array] = None,
) -> GPTOutput:
    """gptneo_forward with the layer stack run as a GPipe pipeline over the
    mesh 'pipe' axis (parallel/pp.py) — the TPU rebuild of the reference's
    HF parallelize(device_map) layer sharding (gptneo.py via gptj.py:421-454),
    with microbatch overlap instead of one sample crawling the GPUs.

    Embeddings / final LN / lm_head run replicated outside the pipeline
    (they are <2% of FLOPs); logits match gptneo_forward exactly
    (test_pp.py). Deterministic only — the pipelined path is for
    eval/scoring; training uses DP/TP/FSDP.
    """
    from frozenbilm_tpu.parallel.pp import microbatch, pipeline_apply, unmicrobatch

    B, T = input_ids.shape
    if attention_mask is None:
        attention_mask = jnp.ones((B, T), jnp.int32)
    use_video = vt.features_dim and video is not None
    if use_video:
        if video_mask is None:
            video_mask = jnp.ones(video.shape[:2], jnp.int32)
        attention_mask = jnp.concatenate(
            [video_mask.astype(attention_mask.dtype), attention_mask], axis=1)

    x = params["wte"][input_ids]
    if use_video:
        v = linear(params["linear_video"], video.astype(x.dtype))
        x = jnp.concatenate([v, x], axis=1)
    L = x.shape[1]
    if position_ids is None:
        position_ids = jnp.arange(L)[None, :]
    x = x + params["wpe"][position_ids]

    add_mask = (1.0 - attention_mask[:, None, None, :].astype(jnp.float32)) * NEG_PAD
    causal_np, local_np = _causal_masks(L, cfg.window_size)
    causal, local = jnp.asarray(causal_np), jnp.asarray(local_np)
    is_local = jnp.asarray([t == "local" for t in cfg.attention_types])

    def layer_fn(xs, state):
        lp, local_flag = xs
        h, am = state
        allowed = jnp.where(local_flag, local, causal)
        out = _block(lp, cfg, h, am, allowed,
                     deterministic=True, rngs=RngStream(None))
        return (out, am)

    states = microbatch((x, jnp.broadcast_to(add_mask, (B,) + add_mask.shape[1:])),
                        n_micro)
    x_mb, _ = pipeline_apply(layer_fn, (params["layers"], is_local), states, mesh)
    x = unmicrobatch(x_mb)
    x = layer_norm(params["ln_f"], x, cfg.layer_norm_epsilon)
    logits = linear(params["lm_head"], x).astype(jnp.float32)

    loss = None
    if labels is not None:
        if use_video:
            video_labels = jnp.full(video.shape[:2], -100, labels.dtype)
            labels = jnp.concatenate([video_labels, labels], axis=1)
        loss = cross_entropy_ignore_index(logits[:, :-1], labels[:, 1:])
    return GPTOutput(logits=logits, loss=loss, last_hidden_state=x, kv=None)


def _forward_with_genpos(params, cfg, vt, input_ids, attention_mask, video, video_mask,
                         return_kv: bool = False):
    """Forward with generation-style positions: cumsum(mask)-1, pads -> 1
    (reference prepare_inputs_for_generation, gptneo.py / gptj.py:747-752).
    wpe consumes them, so AR scoring must match."""
    B, T = input_ids.shape
    use_video = vt.features_dim and video is not None
    if use_video:
        full_am = jnp.concatenate(
            [video_mask.astype(attention_mask.dtype), attention_mask], axis=1)
    else:
        full_am = attention_mask
    pos = jnp.cumsum(full_am, axis=1) - 1
    pos = jnp.where(full_am == 0, 1, pos)
    return gptneo_forward(params, cfg, vt, input_ids, attention_mask,
                          video, video_mask, position_ids=pos,
                          return_kv=return_kv)


def gptneo_score(params, cfg, vt, *, video, video_mask, input_ids, attention_mask,
                 target_ids):
    """P(target_l | prompt, target_<l) (gptneo.py:1727-1754), single pass."""
    return _score_from_forward(_forward_with_genpos, params, cfg, vt, video,
                               video_mask, input_ids, attention_mask, target_ids)


def gptneo_greedy(params, cfg, vt, *, video, video_mask, input_ids, attention_mask,
                  max_new_tokens: int, eos_token_id: Optional[int] = None):
    """Greedy decoding (functional analogue of the vendored greedy_search,
    gptneo.py:1530-1726). Re-runs the full forward per step (no KV cache yet;
    prompt lengths here are tiny — see SURVEY.md §5.7)."""
    B = input_ids.shape[0]
    ids = input_ids
    am = attention_mask
    for _ in range(max_new_tokens):
        out = _forward_with_genpos(params, cfg, vt, ids, am, video, video_mask)
        next_tok = jnp.argmax(out.logits[:, -1, :], axis=-1)
        ids = jnp.concatenate([ids, next_tok[:, None]], axis=1)
        am = jnp.concatenate([am, jnp.ones((B, 1), am.dtype)], axis=1)
        if eos_token_id is not None and bool(jnp.all(next_tok == eos_token_id)):
            break
    return ids


def _decode_one(params, cfg, k_cache, v_cache, key_mask, tok, t, pos, is_local):
    """One cached decode step shared by greedy and beam decoding: write the
    consumed token at cache position t, run every layer over the cache, and
    return (k_cache, v_cache, key_mask, logits). GPT-Neo specifics: learned
    wpe positions, UNSCALED fp32 attention, local layers see only the last
    window_size absolute positions (reference gptneo.py:159-176).

    Caches are raw (n_layers, B, nh, Lmax, hd) arrays, or int8
    {"q", "s"} dicts (ops/quant.kv_quantize) — both attention contractions
    then run on int8-converted values with the per-key scales folded
    outside the dots (exact dequantization, half the KV bytes/step)."""
    B = tok.shape[0]
    nh, hd = cfg.num_heads, cfg.head_dim
    Lmax = key_mask.shape[1]
    key_mask = jnp.where(jnp.arange(Lmax)[None, :] == t, 1.0, key_mask)
    x = params["wte"][tok] + params["wpe"][pos]  # (B, H)
    idx = jnp.arange(Lmax)
    causal_row = idx <= t
    local_row = causal_row & (idx > t - cfg.window_size)
    kv8 = isinstance(k_cache, dict)

    def layer(h, xs):
        lp, kc, vc, local_flag = xs
        ln = layer_norm(lp["ln_1"], h, cfg.layer_norm_epsilon)
        q = linear(lp["attn"]["q_proj"], ln).reshape(B, nh, hd)
        k = linear(lp["attn"]["k_proj"], ln).reshape(B, nh, hd)
        v = linear(lp["attn"]["v_proj"], ln).reshape(B, nh, hd)
        if kv8:
            from frozenbilm_tpu.ops.quant import kv_write

            kc = kv_write(kc, k, t)
            vc = kv_write(vc, v, t)
            w = jnp.einsum("bhd,bhjd->bhj", q.astype(jnp.float32),
                           kc["q"].astype(jnp.float32),
                           preferred_element_type=jnp.float32) * kc["s"]
        else:
            kc = jax.lax.dynamic_update_slice(kc, k[:, :, None, :], (0, 0, t, 0))
            vc = jax.lax.dynamic_update_slice(vc, v[:, :, None, :], (0, 0, t, 0))
            w = jnp.einsum("bhd,bhjd->bhj", q.astype(jnp.float32),
                           kc.astype(jnp.float32),
                           preferred_element_type=jnp.float32)
        allowed = jnp.where(local_flag, local_row, causal_row)
        w = jnp.where(allowed[None, None, :], w, NEG_BIAS)  # unscaled
        w = w + (1.0 - key_mask)[:, None, :] * NEG_PAD
        if kv8:
            p = jax.nn.softmax(w, axis=-1) * vc["s"]  # fold per-key V scales
            ctx = jnp.einsum("bhj,bhjd->bhd", p, vc["q"].astype(jnp.float32),
                             preferred_element_type=jnp.float32).astype(h.dtype)
        else:
            p = jax.nn.softmax(w, axis=-1).astype(vc.dtype)
            ctx = jnp.einsum("bhj,bhjd->bhd", p, vc,
                             preferred_element_type=jnp.float32).astype(vc.dtype)
        attn_out = linear(lp["attn"]["out_proj"], ctx.reshape(B, nh * hd))
        h = h + attn_out
        h2 = layer_norm(lp["ln_2"], h, cfg.layer_norm_epsilon)
        ff = linear(lp["mlp"]["c_proj"],
                    ACT2FN[cfg.hidden_act](linear(lp["mlp"]["c_fc"], h2)))
        return h + ff, (kc, vc)

    x, (k_cache, v_cache) = jax.lax.scan(
        layer, x, (params["layers"], k_cache, v_cache, is_local))
    x = layer_norm(params["ln_f"], x, cfg.layer_norm_epsilon)
    logits = linear(params["lm_head"], x).astype(jnp.float32)
    return k_cache, v_cache, key_mask, logits


def _decode_many(params, cfg, k_cache, v_cache, step_mask, toks, tstart,
                 pos_start, is_local):
    """K-token cached verify step with PER-ROW positions (speculative
    decoding): toks (B, K) are written at cache slots
    tstart[b] .. tstart[b]+K-1 (row-wise scatter — rows advance at
    different rates once acceptance diverges), and query i of row b
    attends causally at absolute slot tstart[b]+i. step_mask (B, Lmax)
    must already mark the K in-flight slots valid; per-query causality
    keeps draft j from seeing draft i > j. Returns
    (k_cache, v_cache, logits (B, K, V)).

    Weight traffic equals ONE single-token step — that is the whole
    speculative bet on a bandwidth-bound decode. Supports int8 {"q","s"}
    caches like _decode_one."""
    from frozenbilm_tpu.ops.quant import thaw_w4
    params = thaw_w4(params)  # int8-at-rest w4 -> S4 once, above the token loop
    B, K = toks.shape
    nh, hd = cfg.num_heads, cfg.head_dim
    Lmax = step_mask.shape[1]
    kv8 = isinstance(k_cache, dict)
    pos = pos_start[:, None] + jnp.arange(K)[None, :]  # (B, K)
    x = params["wte"][toks] + params["wpe"][pos]       # (B, K, H)
    j = jnp.arange(Lmax)[None, None, :]
    ti = tstart[:, None, None] + jnp.arange(K)[None, :, None]  # (B, K, 1)
    causal = j <= ti
    local = causal & (j > ti - cfg.window_size)
    brange = jnp.arange(B)[:, None]
    slots = tstart[:, None] + jnp.arange(K)[None, :]   # (B, K)

    def layer(h, xs):
        lp, kc, vc, local_flag = xs
        ln = layer_norm(lp["ln_1"], h, cfg.layer_norm_epsilon)
        q = linear(lp["attn"]["q_proj"], ln).reshape(B, K, nh, hd)
        k = linear(lp["attn"]["k_proj"], ln).reshape(B, K, nh, hd)
        v = linear(lp["attn"]["v_proj"], ln).reshape(B, K, nh, hd)
        if kv8:
            ks = jnp.maximum(jnp.max(jnp.abs(k.astype(jnp.float32)), -1),
                             1e-8) * (1.0 / 127.0)
            vs = jnp.maximum(jnp.max(jnp.abs(v.astype(jnp.float32)), -1),
                             1e-8) * (1.0 / 127.0)
            kq = jnp.clip(jnp.round(k.astype(jnp.float32) / ks[..., None]),
                          -127.0, 127.0).astype(jnp.int8)
            vq = jnp.clip(jnp.round(v.astype(jnp.float32) / vs[..., None]),
                          -127.0, 127.0).astype(jnp.int8)
            kc = {"q": kc["q"].at[brange, :, slots, :].set(kq),
                  "s": kc["s"].at[brange, :, slots].set(ks)}
            vc = {"q": vc["q"].at[brange, :, slots, :].set(vq),
                  "s": vc["s"].at[brange, :, slots].set(vs)}
            w = jnp.einsum("bqhd,bhjd->bhqj", q.astype(jnp.float32),
                           kc["q"].astype(jnp.float32),
                           preferred_element_type=jnp.float32
                           ) * kc["s"][:, :, None, :]
        else:
            kc = kc.at[brange, :, slots, :].set(k)
            vc = vc.at[brange, :, slots, :].set(v)
            w = jnp.einsum("bqhd,bhjd->bhqj", q.astype(jnp.float32),
                           kc.astype(jnp.float32),
                           preferred_element_type=jnp.float32)
        allowed = jnp.where(local_flag, local, causal)  # (B, K, Lmax)
        w = jnp.where(allowed[:, None], w, NEG_BIAS)  # unscaled
        w = w + (1.0 - step_mask)[:, None, None, :] * NEG_PAD
        if kv8:
            p = jax.nn.softmax(w, axis=-1) * vc["s"][:, :, None, :]
            ctx = jnp.einsum("bhqj,bhjd->bqhd", p,
                             vc["q"].astype(jnp.float32),
                             preferred_element_type=jnp.float32).astype(h.dtype)
        else:
            p = jax.nn.softmax(w, axis=-1).astype(vc.dtype)
            ctx = jnp.einsum("bhqj,bhjd->bqhd", p, vc,
                             preferred_element_type=jnp.float32).astype(vc.dtype)
        attn_out = linear(lp["attn"]["out_proj"], ctx.reshape(B, K, nh * hd))
        h = h + attn_out
        h2 = layer_norm(lp["ln_2"], h, cfg.layer_norm_epsilon)
        ff = linear(lp["mlp"]["c_proj"],
                    ACT2FN[cfg.hidden_act](linear(lp["mlp"]["c_fc"], h2)))
        return h + ff, (kc, vc)

    x, (k_cache, v_cache) = jax.lax.scan(
        layer, x, (params["layers"], k_cache, v_cache, is_local))
    x = layer_norm(params["ln_f"], x, cfg.layer_norm_epsilon)
    logits = linear(params["lm_head"], x).astype(jnp.float32)
    return k_cache, v_cache, logits


def gptneo_speculative_cached(params, cfg, vt, *, video, video_mask,
                              input_ids, attention_mask,
                              max_new_tokens: int, n_draft: int = 7,
                              eos_token_id: Optional[int] = None,
                              pad_token_id: int = 0,
                              kv_int8: bool = False,
                              return_stats: bool = False,
                              draft_oracle: Optional[jax.Array] = None):
    """Greedy decode with prompt-lookup speculative verification
    (ops/speculative.py): each lax.while_loop iteration proposes n_draft
    continuation tokens by bigram lookup over [prompt || generated], feeds
    [last_token, draft] through ONE cached (n_draft+1)-token forward
    (_decode_many — weight traffic of a single step), and keeps the
    longest prefix of drafts that equals the model's own argmax plus one
    bonus token. Output is token-EXACT vs gptneo_greedy_cached; rows
    advance at their own acceptance rate (per-row cache slots/positions).

    The reference's vendored generate has no speculative mode; this is a
    TPU-native serving extension (greedy only — sampled acceptance would
    need the rejection-sampling correction).

    draft_oracle: optional (B, >= max_new_tokens) token array replacing the
    prompt-lookup DRAFT source: at row state n the proposed continuation is
    oracle[n : n+n_draft]. Output tokens remain greedy-EXACT regardless of
    oracle content (wrong drafts are rejected by verification and the true
    token is emitted as the bonus) — this only steers the acceptance rate,
    which is what makes acceptance-controlled benchmarking possible
    (bench.py speculative leg: oracle = the model's own greedy output,
    corrupted with a known per-token error probability).
    """
    from frozenbilm_tpu.ops.quant import thaw_w4
    params = thaw_w4(params)  # int8-at-rest w4 -> S4 once, above the token loop
    from frozenbilm_tpu.ops.speculative import (accept_greedy, lookup_draft,
                                                mask_after_eos)

    B, T = input_ids.shape
    K = n_draft + 1
    use_video = vt.features_dim and video is not None
    delay = vt.max_feats if use_video else 0
    L0 = delay + T
    Lmax = L0 + max_new_tokens + K  # rejected tails are overwritten in place

    out_fwd = _forward_with_genpos(params, cfg, vt, input_ids, attention_mask,
                                   video, video_mask, return_kv=True)
    pad = [(0, 0), (0, 0), (0, 0), (0, max_new_tokens + K), (0, 0)]
    k_cache = jnp.pad(out_fwd.kv[0], pad)
    v_cache = jnp.pad(out_fwd.kv[1], pad)
    if kv_int8:
        from frozenbilm_tpu.ops.quant import kv_quantize

        k_cache, v_cache = kv_quantize(k_cache), kv_quantize(v_cache)
    if use_video:
        vm = video_mask if video_mask is not None else jnp.ones((B, delay), jnp.int32)
        full_am = jnp.concatenate([vm.astype(attention_mask.dtype), attention_mask], 1)
    else:
        full_am = attention_mask
    key_mask = jnp.pad(full_am.astype(jnp.float32),
                       [(0, 0), (0, max_new_tokens + K)])
    pos0 = jnp.sum(full_am, axis=1).astype(jnp.int32)  # (B,)
    is_local = jnp.asarray([t == "local" for t in cfg.attention_types])

    first = jnp.argmax(out_fwd.logits[:, -1, :].astype(jnp.float32), -1)
    first = first.astype(input_ids.dtype)
    out = jnp.full((B, max_new_tokens), pad_token_id, input_ids.dtype)
    out = out.at[:, 0].set(first)
    unfinished = (first != eos_token_id) if eos_token_id is not None else (
        jnp.ones((B,), bool))
    n0 = jnp.ones((B,), jnp.int32)
    # trailing bigram: (last valid prompt token, first). Index the last
    # VALID position, not position sum(mask)-1 — the serving path LEFT-pads
    # prompts, where sum-1 lands inside the padding and the first verify
    # step would draft from a junk bigram (drafting-only; tokens stay exact)
    lastidx = T - 1 - jnp.argmax(jnp.flip(attention_mask, axis=1), axis=1)
    l2_0 = jnp.take_along_axis(
        input_ids, jnp.maximum(lastidx, 0)[:, None], axis=1)[:, 0]
    gen_idx = jnp.arange(max_new_tokens)[None, :]
    jj = jnp.arange(Lmax)[None, :]
    kk = jnp.arange(K)[None, :]

    def cond(carry):
        _, _, _, _, n, _, _, unf, _ = carry
        return jnp.any(unf & (n < max_new_tokens))

    def body(carry):
        kc, vc, km, out, n, l1, l2, unf, iters = carry
        active = unf & (n < max_new_tokens)
        if draft_oracle is None:
            hist = jnp.concatenate([input_ids, out], axis=1)
            hvalid = jnp.concatenate(
                [attention_mask.astype(bool), gen_idx < n[:, None]], axis=1)
            drafts = lookup_draft(hist, hvalid, l2, l1, K - 1)
        else:
            oracle = jnp.pad(
                draft_oracle.astype(out.dtype),
                [(0, 0), (0, max(0, max_new_tokens + K
                                 - draft_oracle.shape[1]))],
                constant_values=pad_token_id)
            oidx = n[:, None] + kk[:, : K - 1]  # positions n .. n+K-2
            drafts = jnp.take_along_axis(
                oracle, jnp.minimum(oidx, oracle.shape[1] - 1), axis=1)
        u = jnp.concatenate([l1[:, None], drafts], axis=1)  # (B, K)
        t = L0 + n - 1  # (B,) per-row write start
        step_mask = jnp.maximum(
            km, ((jj >= t[:, None]) & (jj < (t + K)[:, None])).astype(km.dtype))
        kc, vc, logits = _decode_many(params, cfg, kc, vc, step_mask, u, t,
                                      pos0 + n - 1, is_local)
        preds = jnp.argmax(logits, axis=-1).astype(out.dtype)  # (B, K)
        emitted, n_emit = accept_greedy(preds, drafts)
        n_emit = jnp.where(active, n_emit, 0)
        if eos_token_id is not None:
            emitted, n_emit, unf = mask_after_eos(
                emitted, n_emit, unf, eos_token_id, pad_token_id)
        # scatter the emitted run into the output buffer (cols past
        # max_new or past n_emit are dropped)
        cols = jnp.where(kk < n_emit[:, None], n[:, None] + kk,
                         max_new_tokens)
        out = out.at[jnp.arange(B)[:, None], cols].set(emitted, mode="drop")
        # persist validity for the accepted slots t .. t+n_emit-1
        km = jnp.maximum(
            km, ((jj >= t[:, None]) & (jj < (t + n_emit)[:, None])
                 ).astype(km.dtype))
        # new trailing bigram from the post-eos-mask emission (greedy
        # feeds pad after eos; matching it keeps cache content aligned)
        e_last = jnp.take_along_axis(
            emitted, jnp.maximum(n_emit - 1, 0)[:, None], axis=1)[:, 0]
        e_prev = jnp.take_along_axis(
            emitted, jnp.maximum(n_emit - 2, 0)[:, None], axis=1)[:, 0]
        new_l1 = jnp.where(n_emit >= 1, e_last, l1)
        new_l2 = jnp.where(n_emit >= 2, e_prev,
                           jnp.where(n_emit == 1, l1, l2))
        n = jnp.minimum(n + n_emit, max_new_tokens)
        return kc, vc, km, out, n, new_l1, new_l2, unf, iters + 1

    carry = (k_cache, v_cache, key_mask, out, n0, first, l2_0, unfinished,
             jnp.zeros((), jnp.int32))
    carry = jax.lax.while_loop(cond, body, carry)
    ids_out = jnp.concatenate([input_ids, carry[3]], axis=1)
    if return_stats:
        # (verify steps taken, per-row emitted counts) — emitted/steps is
        # the realized acceptance rate the speculative bet depends on
        return ids_out, {"steps": carry[8], "emitted": carry[4]}
    return ids_out


def gptneo_greedy_cached(params, cfg, vt, *, video, video_mask, input_ids,
                         attention_mask, max_new_tokens: int,
                         eos_token_id: Optional[int] = None,
                         pad_token_id: int = 0,
                         temperature: float = 0.0, top_k: int = 0,
                         top_p: float = 1.0, rng=None,
                         kv_int8: bool = False):
    """KV-cache decode (TPU rebuild of the vendored greedy_search/sample +
    past_key_values path, gptneo.py:850-1726): ONE genpos prefill forward,
    then max_new_tokens single-token steps in a lax.scan over a preallocated
    cache. Argmax-parity with gptneo_greedy is tested on fixtures.

    temperature/top_k/top_p + rng enable sampled decoding (ops/sampling.py
    mirrors the HF temperature/top-k/top-p warper stack); temperature 0
    keeps greedy.

    GPT-Neo specifics honored per step: learned wpe positions continue the
    per-row cumsum(mask) sequence; attention stays UNSCALED fp32; local
    layers see only the last window_size absolute positions
    (gptneo.py:159-176).
    """
    from frozenbilm_tpu.ops.quant import thaw_w4
    params = thaw_w4(params)  # int8-at-rest w4 -> S4 once, above the token loop
    B, T = input_ids.shape
    use_video = vt.features_dim and video is not None
    delay = vt.max_feats if use_video else 0
    L0 = delay + T
    Lmax = L0 + max_new_tokens
    nh, hd = cfg.num_heads, cfg.head_dim

    out = _forward_with_genpos(params, cfg, vt, input_ids, attention_mask,
                               video, video_mask, return_kv=True)
    pad = [(0, 0), (0, 0), (0, 0), (0, max_new_tokens), (0, 0)]
    k_cache = jnp.pad(out.kv[0], pad)
    v_cache = jnp.pad(out.kv[1], pad)
    if kv_int8:
        from frozenbilm_tpu.ops.quant import kv_quantize

        k_cache, v_cache = kv_quantize(k_cache), kv_quantize(v_cache)
    if use_video:
        vm = video_mask if video_mask is not None else jnp.ones((B, delay), jnp.int32)
        full_am = jnp.concatenate([vm.astype(attention_mask.dtype), attention_mask], 1)
    else:
        full_am = attention_mask
    key_mask = jnp.pad(full_am.astype(jnp.float32), [(0, 0), (0, max_new_tokens)])
    # per-row wpe position of the i-th generated token = n_valid + i
    pos0 = jnp.sum(full_am, axis=1).astype(jnp.int32)  # (B,)

    from frozenbilm_tpu.ops.sampling import select_token

    def select(logits, step):
        r = None if rng is None else jax.random.fold_in(rng, step)
        return select_token(logits, r, temperature=temperature,
                            top_k=top_k, top_p=top_p)

    is_local = jnp.asarray([t == "local" for t in cfg.attention_types])
    first = select(out.logits[:, -1, :], 0)
    # HF unfinished_sequences semantics (vendored greedy_search,
    # gptneo.py:1680-1700): eos rows keep eos, then emit pad forever
    unfinished0 = (first != eos_token_id) if eos_token_id is not None else None

    def decode_step(carry, _):
        k_cache, v_cache, key_mask, tok, t, pos, unfinished = carry
        k_cache, v_cache, key_mask, logits = _decode_one(
            params, cfg, k_cache, v_cache, key_mask, tok, t, pos, is_local)
        nxt = select(logits, t - L0 + 1)
        if unfinished is not None:
            nxt = jnp.where(unfinished, nxt, pad_token_id)
            unfinished = unfinished & (nxt != eos_token_id)
        return (k_cache, v_cache, key_mask, nxt, t + 1, pos + 1, unfinished), nxt

    carry = (k_cache, v_cache, key_mask, first, jnp.asarray(L0, jnp.int32), pos0,
             unfinished0)
    if max_new_tokens > 1:
        _, rest = jax.lax.scan(decode_step, carry, None, length=max_new_tokens - 1)
        tokens = jnp.concatenate([first[:, None], rest.T], axis=1)
    else:
        tokens = first[:, None]
    return jnp.concatenate([input_ids, tokens], axis=1)


def gptneo_beam_cached(params, cfg, vt, *, video, video_mask, input_ids,
                       attention_mask, max_new_tokens: int, num_beams: int,
                       eos_token_id: int, pad_token_id: int = 0,
                       length_penalty: float = 1.0,
                       early_stopping: bool = False,
                       num_return_sequences: int = 1,
                       min_length: int = 0,
                       return_scores: bool = False,
                       kv_int8: bool = False):
    """Beam-search decoding over the KV cache (TPU rebuild of the beam path
    of the reference's vendored generate, gptneo.py:1294-1333: expand to
    B*num_beams -> BeamSearchScorer.process per step -> _reorder_cache ->
    finalize). The python scorer heaps become static-shape beam state
    (ops/sampling.beam_*), the per-step past reorder becomes a batched
    cache gather inside a lax.scan.

    Returns (B, T + max_new_tokens) ids when num_return_sequences == 1,
    else (B, R, T + max_new_tokens); with return_scores=True also the
    length-penalized sequence scores ((B,) or (B, R)).
    """
    from frozenbilm_tpu.ops.quant import thaw_w4
    params = thaw_w4(params)  # int8-at-rest w4 -> S4 once, above the token loop
    from frozenbilm_tpu.ops.sampling import (beam_finalize, beam_init,
                                             beam_update)

    B, T = input_ids.shape
    K, G = num_beams, max_new_tokens
    R = num_return_sequences
    assert 1 <= R <= K, "num_return_sequences must be in [1, num_beams]"
    use_video = vt.features_dim and video is not None
    delay = vt.max_feats if use_video else 0
    L0 = delay + T
    Lmax = L0 + G
    lm = params["lm_head"]  # kernel_q / kernel_q4 when the tree is quantized
    V = lm.get("kernel", lm.get("kernel_q", lm.get("kernel_q4"))).shape[-1]
    assert V >= 2 * K, "vocab must cover the 2*num_beams candidate pool"

    out = _forward_with_genpos(params, cfg, vt, input_ids, attention_mask,
                               video, video_mask, return_kv=True)
    pad = [(0, 0), (0, 0), (0, 0), (0, G), (0, 0)]
    # expand each row to K identical beams (HF _expand_inputs_for_generation
    # repeat_interleaves; beam 1.. start at -1e9 so step 0 dedupes them)
    k_cache = jnp.repeat(jnp.pad(out.kv[0], pad), K, axis=1)
    v_cache = jnp.repeat(jnp.pad(out.kv[1], pad), K, axis=1)
    if kv_int8:
        from frozenbilm_tpu.ops.quant import kv_quantize

        k_cache, v_cache = kv_quantize(k_cache), kv_quantize(v_cache)
    if use_video:
        vm = video_mask if video_mask is not None else jnp.ones((B, delay), jnp.int32)
        full_am = jnp.concatenate([vm.astype(attention_mask.dtype), attention_mask], 1)
    else:
        full_am = attention_mask
    key_mask = jnp.repeat(
        jnp.pad(full_am.astype(jnp.float32), [(0, 0), (0, G)]), K, axis=0)
    pos0 = jnp.repeat(jnp.sum(full_am, axis=1).astype(jnp.int32), K, axis=0)
    is_local = jnp.asarray([t == "local" for t in cfg.attention_types])

    state = beam_init(B, K, G)
    live_gen = jnp.zeros((B, K, G), jnp.int32)
    logp0 = jax.nn.log_softmax(out.logits[:, -1, :].astype(jnp.float32), -1)
    state, live_gen, tok, bidx = beam_update(
        state, live_gen, jnp.broadcast_to(logp0[:, None, :], (B, K, V)), 0,
        prompt_len=T, eos_token_id=eos_token_id,
        length_penalty=length_penalty, early_stopping=early_stopping,
        min_length=min_length)

    batch_base = (jnp.arange(B)[:, None] * K)

    def decode_step(carry, _):
        k_cache, v_cache, key_mask, tok, bidx, t, pos, state, live_gen = carry
        # HF _reorder_cache: continue from the cache rows of the beams the
        # new live set extends
        src = (batch_base + bidx).reshape(-1)
        # tree-wide gather: raw arrays, or int8 {"q","s"} leaves together
        take = lambda c: jax.tree.map(lambda a: jnp.take(a, src, axis=1), c)
        k_cache, v_cache = take(k_cache), take(v_cache)
        k_cache, v_cache, key_mask, logits = _decode_one(
            params, cfg, k_cache, v_cache, key_mask, tok.reshape(-1), t, pos,
            is_local)
        logp = jax.nn.log_softmax(logits, axis=-1).reshape(B, K, V)
        state, live_gen, tok, bidx = beam_update(
            state, live_gen, logp, t - L0 + 1,
            prompt_len=T, eos_token_id=eos_token_id,
            length_penalty=length_penalty, early_stopping=early_stopping,
            min_length=min_length)
        return (k_cache, v_cache, key_mask, tok, bidx, t + 1, pos + 1, state,
                live_gen), None

    carry = (k_cache, v_cache, key_mask, tok, bidx,
             jnp.asarray(L0, jnp.int32), pos0, state, live_gen)
    if G > 1:
        carry, _ = jax.lax.scan(decode_step, carry, None, length=G - 1)
    state, live_gen = carry[-2], carry[-1]

    seq, scores, _ = beam_finalize(
        state, live_gen, prompt_len=T, eos_token_id=eos_token_id,
        pad_token_id=pad_token_id, length_penalty=length_penalty,
        num_return_sequences=R)
    prompt = jnp.broadcast_to(input_ids[:, None, :], (B, R, T))
    full = jnp.concatenate([prompt, seq], axis=2)
    if R == 1:
        full, scores = full[:, 0], scores[:, 0]
    return (full, scores) if return_scores else full


def gptneo_prefill(params, cfg, vt, *, video, video_mask, input_ids,
                   attention_mask):
    """Run the (video + left-padded prompt) prefix ONCE, returning what
    prefix-cached answer scoring needs (SURVEY.md §3.4: 'prompt prefix
    cached once, all answers scored in one batched pass').

    Returns dict with per-layer k/v (layers, B, nh, L0, hd), the full
    prefix key mask (B, L0), the next genpos per row (B,), and the
    last-position probs (B, V) — P(first answer token | prompt)."""
    from frozenbilm_tpu.ops.quant import thaw_w4
    params = thaw_w4(params)  # int8-at-rest w4 -> S4 once, above the token loop
    out = _forward_with_genpos(params, cfg, vt, input_ids, attention_mask,
                               video, video_mask, return_kv=True)
    use_video = vt.features_dim and video is not None
    if use_video:
        vm = video_mask if video_mask is not None else jnp.ones(
            video.shape[:2], jnp.int32)
        full_am = jnp.concatenate([vm.astype(attention_mask.dtype),
                                   attention_mask], axis=1)
    else:
        full_am = attention_mask
    return {
        "k": out.kv[0], "v": out.kv[1],
        "key_mask": full_am.astype(jnp.float32),
        "pos_next": jnp.sum(full_am, axis=1).astype(jnp.int32),
        "first_probs": jax.nn.softmax(out.logits[:, -1, :].astype(jnp.float32),
                                      axis=-1),
    }


def gptneo_score_with_prefix(params, cfg, prefix, target_ids):
    """P(target_l | prompt, target_<l) for C answers x B questions against
    a shared cached prompt prefix — WITHOUT re-running or materializing the
    prompt per answer.

    target_ids: (C, L2) — one length-group chunk (exact lengths, no pad).
    Returns (B, C, L2) probabilities, equal to gptneo_score run on the
    (B*C)-tiled batch (parity-tested) at ~L2/(L0+L2) of its FLOPs.

    Per layer, answer queries attend to the (B,)-cached prefix keys via a
    broadcast einsum (no (B*C, L0) key materialization) plus a causal
    self-attention over the L2-1 fed answer tokens. Positions continue the
    per-row genpos cumsum; local layers honor the absolute-index sliding
    window (gptneo.py:159-176); attention stays UNSCALED fp32."""
    from frozenbilm_tpu.ops.quant import thaw_w4
    params = thaw_w4(params)  # int8-at-rest w4 -> S4 once, above the token loop
    C, L2 = target_ids.shape
    B = prefix["key_mask"].shape[0]
    L0 = prefix["key_mask"].shape[1]
    nh, hd = cfg.num_heads, cfg.head_dim

    # P(first token | prompt) comes from the prefill's last-position probs
    p0 = prefix["first_probs"][:, target_ids[:, 0]]  # (B, C)
    if L2 == 1:
        return p0[:, :, None]

    fed = target_ids[:, :-1]  # (C, L2-1) teacher-forced inputs
    Lq = L2 - 1
    # embeddings: wte per answer token + wpe at per-question genpos
    pos = prefix["pos_next"][:, None, None] + jnp.arange(Lq)[None, None, :]
    x = params["wte"][fed][None] + params["wpe"][pos]  # (B, C, Lq, H)

    # absolute indices: prefix keys 0..L0-1; fed token q sits at L0+q
    q_abs = L0 + np.arange(Lq)
    self_causal = np.arange(Lq)[None, :] <= np.arange(Lq)[:, None]
    pre_mask_g = np.ones((Lq, L0), bool)
    pre_mask_l = (np.arange(L0)[None, :] > q_abs[:, None] - cfg.window_size)
    self_local = self_causal & (
        (L0 + np.arange(Lq))[None, :] > q_abs[:, None] - cfg.window_size)
    pad_bias = (1.0 - prefix["key_mask"])[:, None, None, None, :] * NEG_PAD

    def layer(h, xs):
        lp, kc, vc, local_flag = xs
        ln = layer_norm(lp["ln_1"], h, cfg.layer_norm_epsilon)
        q = linear(lp["attn"]["q_proj"], ln).reshape(B, C, Lq, nh, hd)
        k = linear(lp["attn"]["k_proj"], ln).reshape(B, C, Lq, nh, hd)
        v = linear(lp["attn"]["v_proj"], ln).reshape(B, C, Lq, nh, hd)
        qf = q.astype(jnp.float32)
        # UNSCALED fp32 attention (gptneo.py:210-215)
        w_pre = jnp.einsum("bcqhd,bhkd->bchqk", qf,
                           kc.astype(jnp.float32),
                           preferred_element_type=jnp.float32)
        pre_allowed = jnp.where(local_flag, jnp.asarray(pre_mask_l),
                                jnp.asarray(pre_mask_g))
        w_pre = jnp.where(pre_allowed[None, None, None], w_pre, NEG_BIAS)
        w_pre = w_pre + pad_bias
        w_self = jnp.einsum("bcqhd,bckhd->bchqk", qf, k.astype(jnp.float32),
                            preferred_element_type=jnp.float32)
        self_allowed = jnp.where(local_flag, jnp.asarray(self_local),
                                 jnp.asarray(self_causal))
        w_self = jnp.where(self_allowed[None, None, None], w_self, NEG_BIAS)
        w = jnp.concatenate([w_pre, w_self], axis=-1)
        p = jax.nn.softmax(w, axis=-1).astype(vc.dtype)
        p_pre, p_self = p[..., :L0], p[..., L0:]
        ctx = (jnp.einsum("bchqk,bhkd->bcqhd", p_pre, vc,
                          preferred_element_type=jnp.float32)
               + jnp.einsum("bchqk,bckhd->bcqhd", p_self, v,
                            preferred_element_type=jnp.float32)).astype(v.dtype)
        attn_out = linear(lp["attn"]["out_proj"], ctx.reshape(B, C, Lq, nh * hd))
        h = h + attn_out
        h2 = layer_norm(lp["ln_2"], h, cfg.layer_norm_epsilon)
        ff = linear(lp["mlp"]["c_proj"],
                    ACT2FN[cfg.hidden_act](linear(lp["mlp"]["c_fc"], h2)))
        return h + ff, None

    is_local = jnp.asarray([t == "local" for t in cfg.attention_types])
    x, _ = jax.lax.scan(layer, x, (params["layers"], prefix["k"], prefix["v"],
                                   is_local))
    x = layer_norm(params["ln_f"], x, cfg.layer_norm_epsilon)
    logits = linear(params["lm_head"], x).astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)  # (B, C, Lq, V)
    rest = jnp.take_along_axis(
        probs, target_ids[None, :, 1:, None].repeat(B, axis=0), axis=3)[..., 0]
    return jnp.concatenate([p0[:, :, None], rest], axis=2)  # (B, C, L2)
