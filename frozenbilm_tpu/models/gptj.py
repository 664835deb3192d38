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


def _attention(lp_attn, cfg: GPTJConfig, x, add_mask, sin, cos, *, deterministic, rngs):
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
    return dropout(rngs.next(), out, cfg.resid_dropout, deterministic)


def _block(lp, cfg, x, add_mask, sin, cos, *, deterministic, rngs):
    h = layer_norm(lp["ln_1"], x, cfg.layer_norm_epsilon)
    attn_out = _attention(lp["attn"], cfg, h, add_mask, sin, cos,
                          deterministic=deterministic, rngs=rngs)
    ff = linear(lp["mlp"]["fc_out"], ACT2FN[cfg.hidden_act](linear(lp["mlp"]["fc_in"], h)))
    ff = dropout(rngs.next(), ff, cfg.resid_dropout, deterministic)
    return attn_out + ff + x  # parallel residual (gptj.py:326)


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
                     deterministic=deterministic, rngs=RngStream(sub))
        return (out, key), None

    if remat:
        step = jax.checkpoint(
            step, policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
    (x, _), _ = jax.lax.scan(step, (x, rngs.next()), params["layers"])
    x = layer_norm(params["ln_f"], x, cfg.layer_norm_epsilon)
    logits = linear(params["lm_head"], x).astype(jnp.float32)

    loss = None
    if labels is not None:
        if use_video:
            video_labels = jnp.full(video.shape[:2], -100, labels.dtype)
            labels = jnp.concatenate([video_labels, labels], axis=1)
        loss = cross_entropy_ignore_index(logits[:, :-1], labels[:, 1:])

    return GPTOutput(logits=logits, loss=loss, last_hidden_state=x)


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
