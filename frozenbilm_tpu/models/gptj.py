"""GPT-J causal LM with visual prefix tokens — TPU-native.

Behavioral spec (reference model/gptj.py):
  - rotary embeddings on the first rotary_dim dims, GPT-J interleaved style
    (fixed_pos_embedding/rotate_every_two/duplicate_interleave, :44-81)
  - parallel residual block: x + attn(ln_1(x)) + mlp(ln_1(x))  (:282-330)
  - attention: where(causal, qk, -1e9) THEN /sqrt(head_dim) THEN additive
    padding mask (-1e4), softmax in fp32                        (:158-192)
  - video prefix concat before wte; labels get -100 at video positions and
    causal shift-by-one CE                                       (:517-521, :822-842)
  - score(): teacher-forced next-token probability following target_ids
    (:873-899). The reference loops per target step with a KV cache at
    batch 1; causal attention makes that identical to ONE forward over
    [prompt ‖ targets], which is how we compute it (one MXU pass instead of
    |answer_len| sequential dispatches; argmax-equality tested on fixtures).

The reference's layer-sharding parallelize()/deparallelize() device_map API
(gptj.py:421-454) is replaced by pjit tensor-parallel shardings over the
mesh 'model' axis (see parallel/mesh.py) — sequential pipeline hops are an
anti-pattern on TPU.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from frozenbilm_tpu.config import GPTJConfig, VideoTextConfig
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
from frozenbilm_tpu.ops.masking import cross_entropy_ignore_index

NEG_BIAS = -1e9  # reference masked_bias (gptj.py:96)
NEG_PAD = -1e4  # additive padding mask value (gptj.py:552-557)


class GPTOutput(NamedTuple):
    logits: jax.Array
    loss: Optional[jax.Array]
    last_hidden_state: jax.Array
    # (k, v) each (num_layers, B, num_heads, L, head_dim), post-rotary —
    # only populated by forward(..., return_kv=True) for decode prefill
    kv: Optional[tuple] = None


def _rotary_sincos(seq_len: int, dim: int):
    """Interleaved sin/cos tables, numpy at trace time (gptj.py:44-71)."""
    inv_freq = 1.0 / (10000 ** (np.arange(0, dim, 2) / dim))
    ang = np.outer(np.arange(seq_len), inv_freq)  # (L, dim/2)
    sin = np.repeat(np.sin(ang), 2, axis=1).astype(np.float32)
    cos = np.repeat(np.cos(ang), 2, axis=1).astype(np.float32)
    return sin, cos


def _rotate_every_two(x: jax.Array) -> jax.Array:
    x1 = x[..., ::2]
    x2 = x[..., 1::2]
    return jnp.stack([-x2, x1], axis=-1).reshape(x.shape)


def apply_rotary(x: jax.Array, sin: jax.Array, cos: jax.Array) -> jax.Array:
    """x: (B, L, H, rot_dim); sin/cos: (L, rot_dim)."""
    sin = sin[None, :, None, :].astype(x.dtype)
    cos = cos[None, :, None, :].astype(x.dtype)
    return x * cos + _rotate_every_two(x) * sin


def _init_layer(key, cfg: GPTJConfig):
    keys = iter(jax.random.split(key, 8))
    std = cfg.initializer_range
    h, inter = cfg.hidden_size, cfg.effective_intermediate_size
    return {
        "ln_1": layer_norm_init(h),
        "attn": {
            "q_proj": linear_init(next(keys), h, h, std, bias=False),
            "k_proj": linear_init(next(keys), h, h, std, bias=False),
            "v_proj": linear_init(next(keys), h, h, std, bias=False),
            "out_proj": linear_init(next(keys), h, h, std, bias=False),
        },
        "mlp": {
            "fc_in": linear_init(next(keys), h, inter, std),
            "fc_out": linear_init(next(keys), inter, h, std),
        },
    }


def init_gptj_params(key, cfg: GPTJConfig, vt: VideoTextConfig):
    keys = iter(jax.random.split(key, 8))
    std = cfg.initializer_range
    h = cfg.hidden_size
    layer_keys = jax.random.split(next(keys), cfg.num_layers)
    params = {
        "wte": embedding_init(next(keys), cfg.vocab_size, h, std),
        "layers": jax.vmap(lambda k: _init_layer(k, cfg))(layer_keys),
        "ln_f": layer_norm_init(h),
        "lm_head": linear_init(next(keys), h, cfg.vocab_size, std),  # bias=True
    }
    if vt.features_dim:
        params["linear_video"] = linear_init(next(keys), vt.features_dim, h, std)
    return params


def _attention(lp_attn, cfg: GPTJConfig, x, add_mask, sin, cos, *, deterministic,
               rngs, return_kv: bool = False):
    B, L, H = x.shape
    nh, hd = cfg.num_heads, cfg.head_dim
    q = linear(lp_attn["q_proj"], x).reshape(B, L, nh, hd)
    k = linear(lp_attn["k_proj"], x).reshape(B, L, nh, hd)
    v = linear(lp_attn["v_proj"], x).reshape(B, L, nh, hd)

    rd = cfg.rotary_dim or hd
    q = jnp.concatenate([apply_rotary(q[..., :rd], sin, cos), q[..., rd:]], axis=-1)
    k = jnp.concatenate([apply_rotary(k[..., :rd], sin, cos), k[..., rd:]], axis=-1)

    q = q.transpose(0, 2, 1, 3)  # (B, H, L, d)
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)

    w = jnp.einsum("bhid,bhjd->bhij", q.astype(jnp.float32), k.astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    causal = np.tril(np.ones((L, L), bool))
    w = jnp.where(jnp.asarray(causal)[None, None], w, NEG_BIAS)
    w = w / math.sqrt(hd)  # scale AFTER causal fill (gptj.py:180-184)
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


def _block(lp, cfg, x, add_mask, sin, cos, *, deterministic, rngs,
           return_kv: bool = False):
    h = layer_norm(lp["ln_1"], x, cfg.layer_norm_epsilon)
    attn_out = _attention(lp["attn"], cfg, h, add_mask, sin, cos,
                          deterministic=deterministic, rngs=rngs,
                          return_kv=return_kv)
    if return_kv:
        attn_out, kv = attn_out
    ff = linear(lp["mlp"]["fc_out"], ACT2FN[cfg.hidden_act](linear(lp["mlp"]["fc_in"], h)))
    ff = dropout(rngs.next(), ff, cfg.resid_dropout, deterministic)
    out = attn_out + ff + x  # parallel residual (gptj.py:326)
    if return_kv:
        return out, kv
    return out


def gptj_forward(
    params,
    cfg: GPTJConfig,
    vt: VideoTextConfig,
    input_ids: jax.Array,
    attention_mask: Optional[jax.Array] = None,
    video: Optional[jax.Array] = None,
    video_mask: Optional[jax.Array] = None,
    labels: Optional[jax.Array] = None,
    *,
    mlm: bool = False,  # unused; kept for a uniform bundle interface
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
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
    x = dropout(rngs.next(), x, cfg.embed_dropout, deterministic)

    add_mask = (1.0 - attention_mask[:, None, None, :].astype(jnp.float32)) * NEG_PAD
    sin, cos = _rotary_sincos(L, cfg.rotary_dim or cfg.head_dim)
    sin, cos = jnp.asarray(sin), jnp.asarray(cos)

    def step(carry, lp):
        h, key = carry
        if key is not None:
            key, sub = jax.random.split(key)
        else:
            sub = None
        out = _block(lp, cfg, h, add_mask, sin, cos,
                     deterministic=deterministic, rngs=RngStream(sub),
                     return_kv=return_kv)
        if return_kv:
            out, kv = out
            return (out, key), kv
        return (out, key), None

    if remat:
        step = jax.checkpoint(
            step, policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
    (x, _), kvs = jax.lax.scan(step, (x, rngs.next()), params["layers"])
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


def _score_from_forward(forward_fn, params, cfg, vt, video, video_mask,
                        input_ids, attention_mask, target_ids):
    """Shared single-pass teacher-forced scorer (see module docstring)."""
    B, L1 = input_ids.shape
    L2 = target_ids.shape[1]
    full_ids = jnp.concatenate([input_ids, target_ids], axis=1)
    full_am = jnp.concatenate(
        [attention_mask, jnp.ones((B, L2), attention_mask.dtype)], axis=1)
    out = forward_fn(params, cfg, vt, full_ids, full_am, video, video_mask)
    delay = vt.max_feats if (vt.features_dim and video is not None) else 0
    probs = jax.nn.softmax(out.logits.astype(jnp.float32), axis=-1)
    # logits at absolute position delay+L1-1+l predict target token l
    pos = delay + L1 - 1 + jnp.arange(L2)
    step_probs = probs[:, pos, :]  # (B, L2, V)
    return jnp.take_along_axis(step_probs, target_ids[:, :, None], axis=2)[:, :, 0]


def gptj_score(params, cfg, vt, *, video, video_mask, input_ids, attention_mask,
               target_ids):
    """P(target_l | prompt, target_<l) for every l (gptj.py:873-899)."""
    return _score_from_forward(gptj_forward, params, cfg, vt, video, video_mask,
                               input_ids, attention_mask, target_ids)


def gptj_greedy(params, cfg, vt, *, video, video_mask, input_ids, attention_mask,
                max_new_tokens: int, eos_token_id: Optional[int] = None):
    """Full-forward greedy baseline: re-runs the whole sequence per emitted
    token. Reference semantics = HF generate over GPTJForCausalLM
    (gptj.py:737-767); kept as the parity oracle for the cached decoder."""
    B = input_ids.shape[0]
    ids, am = input_ids, attention_mask
    for _ in range(max_new_tokens):
        out = gptj_forward(params, cfg, vt, ids, am, video, video_mask)
        nxt = jnp.argmax(out.logits[:, -1, :], axis=-1)
        ids = jnp.concatenate([ids, nxt[:, None]], axis=1)
        am = jnp.concatenate([am, jnp.ones((B, 1), am.dtype)], axis=1)
        if eos_token_id is not None and bool(jnp.all(nxt == eos_token_id)):
            break
    return ids


def _decode_one(params, cfg, k_cache, v_cache, key_mask, tok, t, sin_all,
                cos_all):
    """One cached decode step shared by greedy and beam decoding: write the
    consumed token at cache position t, run every layer over the cache, and
    return (k_cache, v_cache, key_mask, logits). GPT-J specifics: rotary at
    the absolute cache position, parallel attn+ff residual, causal fill THEN
    scale THEN additive pad mask (reference gptj.py:180-184)."""
    B = tok.shape[0]
    nh, hd = cfg.num_heads, cfg.head_dim
    rd = cfg.rotary_dim or hd
    Lmax = key_mask.shape[1]
    # the consumed token becomes a valid key at position t
    key_mask = jnp.where(jnp.arange(Lmax)[None, :] == t, 1.0, key_mask)
    x = params["wte"][tok]  # (B, H)
    sin1 = jax.lax.dynamic_slice(sin_all, (t, 0), (1, rd))
    cos1 = jax.lax.dynamic_slice(cos_all, (t, 0), (1, rd))

    kv8 = isinstance(k_cache, dict)

    def layer(h, xs):
        lp, kc, vc = xs
        ln = layer_norm(lp["ln_1"], h, cfg.layer_norm_epsilon)
        q = linear(lp["attn"]["q_proj"], ln).reshape(B, 1, nh, hd)
        k = linear(lp["attn"]["k_proj"], ln).reshape(B, 1, nh, hd)
        v = linear(lp["attn"]["v_proj"], ln).reshape(B, 1, nh, hd)
        q = jnp.concatenate([apply_rotary(q[..., :rd], sin1, cos1), q[..., rd:]], -1)
        k = jnp.concatenate([apply_rotary(k[..., :rd], sin1, cos1), k[..., rd:]], -1)
        if kv8:
            from frozenbilm_tpu.ops.quant import kv_write

            kc = kv_write(kc, k[:, 0], t)
            vc = kv_write(vc, v[:, 0], t)
            w = jnp.einsum("bhd,bhjd->bhj", q[:, 0].astype(jnp.float32),
                           kc["q"].astype(jnp.float32),
                           preferred_element_type=jnp.float32) * kc["s"]
        else:
            kc = jax.lax.dynamic_update_slice(kc, k.transpose(0, 2, 1, 3), (0, 0, t, 0))
            vc = jax.lax.dynamic_update_slice(vc, v.transpose(0, 2, 1, 3), (0, 0, t, 0))
            w = jnp.einsum("bhd,bhjd->bhj", q[:, 0].astype(jnp.float32),
                           kc.astype(jnp.float32),
                           preferred_element_type=jnp.float32)
        # same masking order as the full forward: causal fill, THEN
        # scale, THEN additive padding mask (gptj.py:180-184)
        w = jnp.where(jnp.arange(Lmax)[None, None, :] <= t, w, NEG_BIAS)
        w = w / math.sqrt(hd)
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
        ff = linear(lp["mlp"]["fc_out"],
                    ACT2FN[cfg.hidden_act](linear(lp["mlp"]["fc_in"], ln)))
        return attn_out + ff + h, (kc, vc)

    x, (k_cache, v_cache) = jax.lax.scan(
        layer, x, (params["layers"], k_cache, v_cache))
    x = layer_norm(params["ln_f"], x, cfg.layer_norm_epsilon)
    logits = linear(params["lm_head"], x).astype(jnp.float32)
    return k_cache, v_cache, key_mask, logits


def _decode_many(params, cfg, k_cache, v_cache, step_mask, toks, tstart,
                 sin_all, cos_all):
    """K-token cached verify step with PER-ROW positions (speculative
    decoding; see gptneo._decode_many for the scheme). GPT-J specifics:
    rotary at each token's absolute cache slot, scaled attention with the
    causal-fill -> scale -> pad-mask order of the full forward, parallel
    attn+ff residual. Supports int8 {"q","s"} caches."""
    from frozenbilm_tpu.ops.quant import thaw_w4
    params = thaw_w4(params)  # int8-at-rest w4 -> S4 once, above the token loop
    import math as _math

    B, K = toks.shape
    nh, hd = cfg.num_heads, cfg.head_dim
    rd = cfg.rotary_dim or hd
    Lmax = step_mask.shape[1]
    kv8 = isinstance(k_cache, dict)
    x = params["wte"][toks]  # (B, K, H)
    j = jnp.arange(Lmax)[None, None, :]
    ti = tstart[:, None, None] + jnp.arange(K)[None, :, None]  # (B, K, 1)
    causal = j <= ti
    brange = jnp.arange(B)[:, None]
    slots = tstart[:, None] + jnp.arange(K)[None, :]  # (B, K)
    sin_pr = jnp.take(sin_all, slots, axis=0)  # (B, K, rd)
    cos_pr = jnp.take(cos_all, slots, axis=0)

    def rot(x):  # x: (B, K, nh, rd); per-row per-position tables
        s = sin_pr[:, :, None, :].astype(x.dtype)
        c = cos_pr[:, :, None, :].astype(x.dtype)
        return x * c + _rotate_every_two(x) * s

    def layer(h, xs):
        lp, kc, vc = xs
        ln = layer_norm(lp["ln_1"], h, cfg.layer_norm_epsilon)
        q = linear(lp["attn"]["q_proj"], ln).reshape(B, K, nh, hd)
        k = linear(lp["attn"]["k_proj"], ln).reshape(B, K, nh, hd)
        v = linear(lp["attn"]["v_proj"], ln).reshape(B, K, nh, hd)
        q = jnp.concatenate([rot(q[..., :rd]), q[..., rd:]], -1)
        k = jnp.concatenate([rot(k[..., :rd]), k[..., rd:]], -1)
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
        # causal fill, THEN scale, THEN additive pad mask (gptj.py:180-184)
        w = jnp.where(causal[:, None], w, NEG_BIAS)
        w = w / _math.sqrt(hd)
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
        ff = linear(lp["mlp"]["fc_out"],
                    ACT2FN[cfg.hidden_act](linear(lp["mlp"]["fc_in"], ln)))
        return attn_out + ff + h, (kc, vc)

    x, (k_cache, v_cache) = jax.lax.scan(
        layer, x, (params["layers"], k_cache, v_cache))
    x = layer_norm(params["ln_f"], x, cfg.layer_norm_epsilon)
    logits = linear(params["lm_head"], x).astype(jnp.float32)
    return k_cache, v_cache, logits


def gptj_speculative_cached(params, cfg, vt, *, video, video_mask,
                            input_ids, attention_mask,
                            max_new_tokens: int, n_draft: int = 7,
                            eos_token_id=None, pad_token_id: int = 0,
                            kv_int8: bool = False,
                            return_stats: bool = False):
    """Greedy decode with prompt-lookup speculative verification — the
    GPT-J twin of gptneo_speculative_cached (see there and
    ops/speculative.py for the scheme). Token-EXACT vs
    gptj_greedy_cached; each lax.while_loop iteration emits
    1 + accepted-draft tokens for the weight traffic of one step."""
    from frozenbilm_tpu.ops.quant import thaw_w4
    params = thaw_w4(params)  # int8-at-rest w4 -> S4 once, above the token loop
    from frozenbilm_tpu.ops.speculative import (accept_greedy, lookup_draft,
                                                mask_after_eos)

    B, T = input_ids.shape
    K = n_draft + 1
    use_video = vt.features_dim and video is not None
    delay = vt.max_feats if use_video else 0
    L0 = delay + T
    Lmax = L0 + max_new_tokens + K
    rd = cfg.rotary_dim or cfg.head_dim

    out_fwd = gptj_forward(params, cfg, vt, input_ids, attention_mask, video,
                           video_mask, return_kv=True)
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
    sin_np, cos_np = _rotary_sincos(Lmax, rd)
    sin_all, cos_all = jnp.asarray(sin_np), jnp.asarray(cos_np)

    first = jnp.argmax(out_fwd.logits[:, -1, :].astype(jnp.float32), -1)
    first = first.astype(input_ids.dtype)
    out = jnp.full((B, max_new_tokens), pad_token_id, input_ids.dtype)
    out = out.at[:, 0].set(first)
    unfinished = (first != eos_token_id) if eos_token_id is not None else (
        jnp.ones((B,), bool))
    n0 = jnp.ones((B,), jnp.int32)
    # last VALID position (left-padded serving prompts: sum(mask)-1 would
    # land inside the padding; drafting-only, tokens stay exact either way)
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
        hist = jnp.concatenate([input_ids, out], axis=1)
        hvalid = jnp.concatenate(
            [attention_mask.astype(bool), gen_idx < n[:, None]], axis=1)
        drafts = lookup_draft(hist, hvalid, l2, l1, K - 1)
        u = jnp.concatenate([l1[:, None], drafts], axis=1)
        t = L0 + n - 1
        step_mask = jnp.maximum(
            km, ((jj >= t[:, None]) & (jj < (t + K)[:, None])).astype(km.dtype))
        kc, vc, logits = _decode_many(params, cfg, kc, vc, step_mask, u, t,
                                      sin_all, cos_all)
        preds = jnp.argmax(logits, axis=-1).astype(out.dtype)
        emitted, n_emit = accept_greedy(preds, drafts)
        n_emit = jnp.where(active, n_emit, 0)
        if eos_token_id is not None:
            emitted, n_emit, unf = mask_after_eos(
                emitted, n_emit, unf, eos_token_id, pad_token_id)
        cols = jnp.where(kk < n_emit[:, None], n[:, None] + kk,
                         max_new_tokens)
        out = out.at[jnp.arange(B)[:, None], cols].set(emitted, mode="drop")
        km = jnp.maximum(
            km, ((jj >= t[:, None]) & (jj < (t + n_emit)[:, None])
                 ).astype(km.dtype))
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
        return ids_out, {"steps": carry[8], "emitted": carry[4]}
    return ids_out


def gptj_greedy_cached(params, cfg, vt, *, video, video_mask, input_ids,
                       attention_mask, max_new_tokens: int,
                       eos_token_id: Optional[int] = None,
                       pad_token_id: int = 0,
                       temperature: float = 0.0, top_k: int = 0,
                       top_p: float = 1.0, rng=None,
                       kv_int8: bool = False):
    """KV-cache decode: ONE prefill forward (video + prompt), then
    max_new_tokens single-token steps inside a lax.scan over a preallocated
    (num_layers, B, heads, Lmax, head_dim) cache.

    TPU-native rebuild of the reference's incremental-decoding path
    (prepare_inputs_for_generation drops the video once past_key_values
    exists and feeds one token per step, gptj.py:737-767): static shapes,
    no per-step python dispatch, cache updates via dynamic_update_slice.
    Argmax-parity with gptj_greedy is tested on fixtures.

    temperature/top_k/top_p + rng select sampled decoding (ops/sampling.py,
    the HF warper stack of the vendored generate); temperature 0 = greedy.
    """
    from frozenbilm_tpu.ops.quant import thaw_w4
    params = thaw_w4(params)  # int8-at-rest w4 -> S4 once, above the token loop
    from frozenbilm_tpu.ops.sampling import select_token

    def select(logits, step):
        r = None if rng is None else jax.random.fold_in(rng, step)
        return select_token(logits, r, temperature=temperature,
                            top_k=top_k, top_p=top_p)

    B, T = input_ids.shape
    use_video = vt.features_dim and video is not None
    delay = vt.max_feats if use_video else 0
    L0 = delay + T
    Lmax = L0 + max_new_tokens
    nh, hd = cfg.num_heads, cfg.head_dim
    rd = cfg.rotary_dim or hd

    out = gptj_forward(params, cfg, vt, input_ids, attention_mask, video,
                       video_mask, return_kv=True)
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

    sin_np, cos_np = _rotary_sincos(Lmax, rd)
    sin_all, cos_all = jnp.asarray(sin_np), jnp.asarray(cos_np)
    first = select(out.logits[:, -1, :], 0)
    # HF unfinished_sequences semantics (reference gptneo.py:1680-1700):
    # rows that emitted eos keep it, then produce pad forever after
    unfinished0 = (first != eos_token_id) if eos_token_id is not None else None

    def decode_step(carry, _):
        k_cache, v_cache, key_mask, tok, t, unfinished = carry
        k_cache, v_cache, key_mask, logits = _decode_one(
            params, cfg, k_cache, v_cache, key_mask, tok, t, sin_all, cos_all)
        nxt = select(logits, t - L0 + 1)
        if unfinished is not None:
            nxt = jnp.where(unfinished, nxt, pad_token_id)
            unfinished = unfinished & (nxt != eos_token_id)
        return (k_cache, v_cache, key_mask, nxt, t + 1, unfinished), nxt

    carry = (k_cache, v_cache, key_mask, first, jnp.asarray(L0, jnp.int32),
             unfinished0)
    if max_new_tokens > 1:
        _, rest = jax.lax.scan(decode_step, carry, None, length=max_new_tokens - 1)
        tokens = jnp.concatenate([first[:, None], rest.T], axis=1)
    else:
        tokens = first[:, None]
    return jnp.concatenate([input_ids, tokens], axis=1)


def gptj_beam_cached(params, cfg, vt, *, video, video_mask, input_ids,
                     attention_mask, max_new_tokens: int, num_beams: int,
                     eos_token_id: int, pad_token_id: int = 0,
                     length_penalty: float = 1.0,
                     early_stopping: bool = False,
                     num_return_sequences: int = 1,
                     min_length: int = 0,
                     return_scores: bool = False,
                     kv_int8: bool = False):
    """Beam-search decoding over the KV cache. Same static-shape beam state
    as gptneo_beam_cached (ops/sampling.beam_*, mirroring the beam path of
    the reference's vendored generate, gptneo.py:1294-1333, which GPT-J
    reaches through HF generate); the per-step past reorder becomes a
    batched cache gather inside the lax.scan.

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
    rd = cfg.rotary_dim or cfg.head_dim
    lm = params["lm_head"]  # kernel_q / kernel_q4 when the tree is quantized
    V = lm.get("kernel", lm.get("kernel_q", lm.get("kernel_q4"))).shape[-1]
    assert V >= 2 * K, "vocab must cover the 2*num_beams candidate pool"

    out = gptj_forward(params, cfg, vt, input_ids, attention_mask, video,
                       video_mask, return_kv=True)
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
    sin_np, cos_np = _rotary_sincos(Lmax, rd)
    sin_all, cos_all = jnp.asarray(sin_np), jnp.asarray(cos_np)

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
        k_cache, v_cache, key_mask, tok, bidx, t, state, live_gen = carry
        # HF _reorder_cache: continue from the cache rows of the beams the
        # new live set extends
        src = (batch_base + bidx).reshape(-1)
        # tree-wide gather: raw arrays, or int8 {"q","s"} leaves together
        take = lambda c: jax.tree.map(lambda a: jnp.take(a, src, axis=1), c)
        k_cache, v_cache = take(k_cache), take(v_cache)
        k_cache, v_cache, key_mask, logits = _decode_one(
            params, cfg, k_cache, v_cache, key_mask, tok.reshape(-1), t,
            sin_all, cos_all)
        logp = jax.nn.log_softmax(logits, axis=-1).reshape(B, K, V)
        state, live_gen, tok, bidx = beam_update(
            state, live_gen, logp, t - L0 + 1,
            prompt_len=T, eos_token_id=eos_token_id,
            length_penalty=length_penalty, early_stopping=early_stopping,
            min_length=min_length)
        return (k_cache, v_cache, key_mask, tok, bidx, t + 1, state,
                live_gen), None

    carry = (k_cache, v_cache, key_mask, tok, bidx,
             jnp.asarray(L0, jnp.int32), state, live_gen)
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


def gptj_prefill(params, cfg, vt, *, video, video_mask, input_ids,
                 attention_mask):
    """Run the (video + left-padded prompt) prefix ONCE for prefix-cached
    answer scoring (SURVEY.md §3.4). Cached k are post-rotary, so answer
    queries only need their own rotary rows (absolute positions L0+q,
    matching gptj_forward's 0..L-1 tables)."""
    from frozenbilm_tpu.ops.quant import thaw_w4
    params = thaw_w4(params)  # int8-at-rest w4 -> S4 once, above the token loop
    out = gptj_forward(params, cfg, vt, input_ids, attention_mask,
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
        "first_probs": jax.nn.softmax(out.logits[:, -1, :].astype(jnp.float32),
                                      axis=-1),
    }


def gptj_score_with_prefix(params, cfg, prefix, target_ids):
    """P(target_l | prompt, target_<l) for C answers x B questions against
    a shared cached prompt prefix — the GPT-J analogue of
    gptneo_score_with_prefix (parity-tested vs gptj_score on the tiled
    batch). Honors GPT-J specifics: rotary at absolute positions L0+q,
    scale-after-causal-fill fp32 attention (gptj.py:180-184), parallel
    residual (gptj.py:326)."""
    from frozenbilm_tpu.ops.quant import thaw_w4
    params = thaw_w4(params)  # int8-at-rest w4 -> S4 once, above the token loop
    C, L2 = target_ids.shape
    B = prefix["key_mask"].shape[0]
    L0 = prefix["key_mask"].shape[1]
    nh, hd = cfg.num_heads, cfg.head_dim

    p0 = prefix["first_probs"][:, target_ids[:, 0]]  # (B, C)
    if L2 == 1:
        return p0[:, :, None]

    fed = target_ids[:, :-1]  # (C, L2-1)
    Lq = L2 - 1
    x = jnp.broadcast_to(params["wte"][fed][None],
                         (B, C, Lq, cfg.hidden_size))

    rd = cfg.rotary_dim or hd
    sin_full, cos_full = _rotary_sincos(L0 + Lq, rd)
    sin = jnp.asarray(sin_full[L0:])  # rows for the fed answer positions
    cos = jnp.asarray(cos_full[L0:])
    scale = math.sqrt(hd)
    self_causal = jnp.asarray(np.tril(np.ones((Lq, Lq), bool)))
    pad_bias = (1.0 - prefix["key_mask"])[:, None, None, None, :] * NEG_PAD

    def rot(t):  # t: (B, C, Lq, nh, rd-split applied by caller)
        return jnp.concatenate(
            [apply_rotary(t[..., :rd].reshape(B * C, Lq, nh, rd), sin, cos)
             .reshape(B, C, Lq, nh, rd), t[..., rd:]], axis=-1)

    def layer(h, xs):
        lp, kc, vc = xs
        ln = layer_norm(lp["ln_1"], h, cfg.layer_norm_epsilon)
        q = rot(linear(lp["attn"]["q_proj"], ln).reshape(B, C, Lq, nh, hd))
        k = rot(linear(lp["attn"]["k_proj"], ln).reshape(B, C, Lq, nh, hd))
        v = linear(lp["attn"]["v_proj"], ln).reshape(B, C, Lq, nh, hd)
        qf = q.astype(jnp.float32)
        # prefix keys are all causal-visible; scale AFTER the causal fill
        # (masked self entries get NEG_BIAS / scale, exactly as the full
        # forward's where-then-divide produces)
        w_pre = jnp.einsum("bcqhd,bhjd->bchqj", qf,
                           kc.astype(jnp.float32),
                           preferred_element_type=jnp.float32) / scale
        w_pre = w_pre + pad_bias
        w_self = jnp.einsum("bcqhd,bckhd->bchqk", qf, k.astype(jnp.float32),
                            preferred_element_type=jnp.float32)
        w_self = jnp.where(self_causal[None, None, None], w_self,
                           NEG_BIAS) / scale
        w = jnp.concatenate([w_pre, w_self], axis=-1)
        p = jax.nn.softmax(w, axis=-1).astype(v.dtype)
        p_pre, p_self = p[..., :L0], p[..., L0:]
        ctx = (jnp.einsum("bchqj,bhjd->bcqhd", p_pre, vc,
                          preferred_element_type=jnp.float32)
               + jnp.einsum("bchqk,bckhd->bcqhd", p_self, v,
                            preferred_element_type=jnp.float32)).astype(v.dtype)
        attn_out = linear(lp["attn"]["out_proj"],
                          ctx.reshape(B, C, Lq, nh * hd))
        ff = linear(lp["mlp"]["fc_out"],
                    ACT2FN[cfg.hidden_act](linear(lp["mlp"]["fc_in"], ln)))
        return attn_out + ff + h, None  # parallel residual (gptj.py:326)

    x, _ = jax.lax.scan(layer, x, (params["layers"], prefix["k"], prefix["v"]))
    x = layer_norm(params["ln_f"], x, cfg.layer_norm_epsilon)
    logits = linear(params["lm_head"], x).astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    rest = jnp.take_along_axis(
        probs, target_ids[None, :, 1:, None].repeat(B, axis=0), axis=3)[..., 0]
    return jnp.concatenate([p0[:, :, None], rest], axis=2)  # (B, C, L2)
