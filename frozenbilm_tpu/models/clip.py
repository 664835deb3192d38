"""OpenAI CLIP ViT-L/14 (vision + text towers) — TPU-native JAX.

Used by the offline frame-feature extraction service (reference
extract/extract.py:63-90: encode_image on 224x224 CLIP-normalized frames)
and by the CLIP zero-shot baselines (videoqa_clip.py:42-52, mc_clip.py:40-47:
raw dot products of frame-0 features with encode_text outputs).

Architecture (parity-tested against HF CLIPModel with quick_gelu):
  vision: patch conv (no bias) -> [CLS] + pos embed -> ln_pre -> L x
          pre-LN blocks -> ln_post on CLS -> visual projection (no bias)
  text:   token + pos embed -> causal L x blocks -> ln_final -> take
          features at the EOT position (argmax of ids) -> text projection
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from frozenbilm_tpu.config import CLIPTextConfig, CLIPVisionConfig
from frozenbilm_tpu.models.common import (
    embedding_init,
    layer_norm,
    layer_norm_init,
    linear,
    linear_init,
    merge_heads,
    split_heads,
)
from frozenbilm_tpu.ops.masking import masked_softmax


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def _init_block(key, width, heads, mlp_ratio=4):
    keys = iter(jax.random.split(key, 8))
    std = width ** -0.5
    return {
        "ln_1": layer_norm_init(width),
        "attn": {
            "q_proj": linear_init(next(keys), width, width, std),
            "k_proj": linear_init(next(keys), width, width, std),
            "v_proj": linear_init(next(keys), width, width, std),
            "out_proj": linear_init(next(keys), width, width, std),
        },
        "ln_2": layer_norm_init(width),
        "mlp": {
            "fc1": linear_init(next(keys), width, width * mlp_ratio, std),
            "fc2": linear_init(next(keys), width * mlp_ratio, width, std),
        },
    }


def init_clip_vision_params(key, cfg: CLIPVisionConfig):
    keys = iter(jax.random.split(key, 8))
    w = cfg.hidden_size
    n_patches = (cfg.image_size // cfg.patch_size) ** 2
    layer_keys = jax.random.split(next(keys), cfg.num_layers)
    return {
        "patch_embed": {  # conv kernel stored (kh, kw, in, out); no bias
            "kernel": jax.random.normal(next(keys), (cfg.patch_size, cfg.patch_size, 3, w)) * 0.02,
        },
        "class_embedding": jax.random.normal(next(keys), (w,)) * 0.02,
        "position_embedding": embedding_init(next(keys), n_patches + 1, w, 0.02),
        "ln_pre": layer_norm_init(w),
        "layers": jax.vmap(lambda k: _init_block(k, w, cfg.num_heads))(layer_keys),
        "ln_post": layer_norm_init(w),
        "proj": {"kernel": jax.random.normal(next(keys), (w, cfg.projection_dim)) * w ** -0.5},
    }


def init_clip_text_params(key, cfg: CLIPTextConfig):
    keys = iter(jax.random.split(key, 8))
    w = cfg.hidden_size
    layer_keys = jax.random.split(next(keys), cfg.num_layers)
    return {
        "token_embedding": embedding_init(next(keys), cfg.vocab_size, w, 0.02),
        "position_embedding": embedding_init(next(keys), cfg.context_length, w, 0.01),
        "layers": jax.vmap(lambda k: _init_block(k, w, cfg.num_heads))(layer_keys),
        "ln_final": layer_norm_init(w),
        "proj": {"kernel": jax.random.normal(next(keys), (w, cfg.projection_dim)) * w ** -0.5},
    }


def _attention(lp, num_heads, x, mask=None):
    q = split_heads(linear(lp["q_proj"], x), num_heads)
    k = split_heads(linear(lp["k_proj"], x), num_heads)
    v = split_heads(linear(lp["v_proj"], x), num_heads)
    scale = q.shape[-1] ** -0.5
    if mask is None:
        # vision tower: fused Pallas MHA on TPU (ops/attention.py), jnp
        # reference elsewhere — no (B,H,L,L) probabilities reach HBM
        from frozenbilm_tpu.ops.attention import fused_attention

        ctx = fused_attention(q, k, v, scale=scale)
    else:
        w = jnp.einsum("bhid,bhjd->bhij", q, k,
                       preferred_element_type=jnp.float32) * scale
        probs = masked_softmax(w, mask)
        ctx = jnp.einsum("bhij,bhjd->bhid", probs.astype(v.dtype), v,
                         preferred_element_type=jnp.float32).astype(v.dtype)
    return linear(lp["out_proj"], merge_heads(ctx))


def _block(lp, num_heads, x, eps, mask=None):
    x = x + _attention(lp["attn"], num_heads, layer_norm(lp["ln_1"], x, eps), mask)
    h = layer_norm(lp["ln_2"], x, eps)
    return x + linear(lp["mlp"]["fc2"], quick_gelu(linear(lp["mlp"]["fc1"], h)))


def clip_encode_image(params, cfg: CLIPVisionConfig, pixels: jax.Array) -> jax.Array:
    """pixels: (B, H, W, 3) CLIP-normalized -> (B, projection_dim) features."""
    x = jax.lax.conv_general_dilated(
        pixels, params["patch_embed"]["kernel"].astype(pixels.dtype),
        window_strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    B = x.shape[0]
    x = x.reshape(B, -1, cfg.hidden_size)
    cls = jnp.broadcast_to(params["class_embedding"].astype(x.dtype),
                           (B, 1, cfg.hidden_size))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["position_embedding"].astype(x.dtype)[None]
    x = layer_norm(params["ln_pre"], x, cfg.layer_norm_eps)

    def step(h, lp):
        return _block(lp, cfg.num_heads, h, cfg.layer_norm_eps), None

    x, _ = jax.lax.scan(step, x, params["layers"])
    pooled = layer_norm(params["ln_post"], x[:, 0], cfg.layer_norm_eps)
    return jnp.dot(pooled, params["proj"]["kernel"].astype(pooled.dtype),
                   preferred_element_type=jnp.float32).astype(pooled.dtype)


def clip_encode_text(params, cfg: CLIPTextConfig, input_ids: jax.Array) -> jax.Array:
    """input_ids: (B, context_length) with EOT = max id -> (B, proj_dim)."""
    B, L = input_ids.shape
    x = params["token_embedding"][input_ids]
    x = x + params["position_embedding"][:L][None].astype(x.dtype)
    causal = jnp.asarray(np.tril(np.ones((L, L), np.int32)))[None, None]

    def step(h, lp):
        return _block(lp, cfg.num_heads, h, cfg.layer_norm_eps, mask=causal), None

    x, _ = jax.lax.scan(step, x, params["layers"])
    x = layer_norm(params["ln_final"], x, cfg.layer_norm_eps)
    eot = jnp.argmax(input_ids, axis=-1)
    pooled = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
    return jnp.dot(pooled, params["proj"]["kernel"].astype(pooled.dtype),
                   preferred_element_type=jnp.float32).astype(pooled.dtype)


# ---------------------------------------------------------------------------
# Weight import (HF CLIPModel or OpenAI clip state dict)
# ---------------------------------------------------------------------------


def clip_params_from_hf(sd, vision_cfg: CLIPVisionConfig, text_cfg: CLIPTextConfig):
    """Convert an HF CLIPModel state dict (numpy) to our param trees."""
    import jax as _jax

    def lin(prefix):
        out = {"kernel": np.ascontiguousarray(sd[prefix + ".weight"].T)}
        if prefix + ".bias" in sd:
            out["bias"] = sd[prefix + ".bias"]
        return out

    def ln(prefix):
        return {"weight": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}

    def blocks(prefix, n):
        trees = []
        for i in range(n):
            b = f"{prefix}.{i}."
            trees.append({
                "ln_1": ln(b + "layer_norm1"),
                "attn": {k: lin(b + "self_attn." + k)
                         for k in ("q_proj", "k_proj", "v_proj", "out_proj")},
                "ln_2": ln(b + "layer_norm2"),
                "mlp": {"fc1": lin(b + "mlp.fc1"), "fc2": lin(b + "mlp.fc2")},
            })
        return _jax.tree.map(lambda *xs: np.stack(xs), *trees)

    vp = "vision_model."
    vision = {
        "patch_embed": {"kernel": np.ascontiguousarray(
            np.transpose(sd[vp + "embeddings.patch_embedding.weight"], (2, 3, 1, 0)))},
        "class_embedding": sd[vp + "embeddings.class_embedding"],
        "position_embedding": sd[vp + "embeddings.position_embedding.weight"],
        "ln_pre": ln(vp + "pre_layrnorm"),  # HF's typo'd key name
        "layers": blocks(vp + "encoder.layers", vision_cfg.num_layers),
        "ln_post": ln(vp + "post_layernorm"),
        "proj": {"kernel": np.ascontiguousarray(sd["visual_projection.weight"].T)},
    }
    tp = "text_model."
    text = {
        "token_embedding": sd[tp + "embeddings.token_embedding.weight"],
        "position_embedding": sd[tp + "embeddings.position_embedding.weight"],
        "layers": blocks(tp + "encoder.layers", text_cfg.num_layers),
        "ln_final": ln(tp + "final_layer_norm"),
        "proj": {"kernel": np.ascontiguousarray(sd["text_projection.weight"].T)},
    }
    return vision, text


def clip_params_from_openai(sd, vision_cfg: CLIPVisionConfig, text_cfg: CLIPTextConfig):
    """Convert an OpenAI `clip` package state dict (ViT visual tower).

    OpenAI packs qkv as visual.transformer.resblocks.{i}.attn.in_proj_weight;
    we split into q/k/v thirds.
    """
    import jax as _jax

    def ln(prefix):
        return {"weight": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}

    def blocks(prefix, n, width):
        trees = []
        for i in range(n):
            b = f"{prefix}.{i}."
            in_w = sd[b + "attn.in_proj_weight"]  # (3w, w)
            in_b = sd[b + "attn.in_proj_bias"]
            qw, kw, vw = np.split(in_w, 3, axis=0)
            qb, kb, vb = np.split(in_b, 3, axis=0)
            trees.append({
                "ln_1": ln(b + "ln_1"),
                "attn": {
                    "q_proj": {"kernel": np.ascontiguousarray(qw.T), "bias": qb},
                    "k_proj": {"kernel": np.ascontiguousarray(kw.T), "bias": kb},
                    "v_proj": {"kernel": np.ascontiguousarray(vw.T), "bias": vb},
                    "out_proj": {"kernel": np.ascontiguousarray(sd[b + "attn.out_proj.weight"].T),
                                 "bias": sd[b + "attn.out_proj.bias"]},
                },
                "ln_2": ln(b + "ln_2"),
                "mlp": {
                    "fc1": {"kernel": np.ascontiguousarray(sd[b + "mlp.c_fc.weight"].T),
                            "bias": sd[b + "mlp.c_fc.bias"]},
                    "fc2": {"kernel": np.ascontiguousarray(sd[b + "mlp.c_proj.weight"].T),
                            "bias": sd[b + "mlp.c_proj.bias"]},
                },
            })
        return _jax.tree.map(lambda *xs: np.stack(xs), *trees)

    vision = {
        "patch_embed": {"kernel": np.ascontiguousarray(
            np.transpose(sd["visual.conv1.weight"], (2, 3, 1, 0)))},
        "class_embedding": sd["visual.class_embedding"],
        "position_embedding": sd["visual.positional_embedding"],
        "ln_pre": ln("visual.ln_pre"),
        "layers": blocks("visual.transformer.resblocks", vision_cfg.num_layers,
                         vision_cfg.hidden_size),
        "ln_post": ln("visual.ln_post"),
        "proj": {"kernel": sd["visual.proj"]},
    }
    text = {
        "token_embedding": sd["token_embedding.weight"],
        "position_embedding": sd["positional_embedding"],
        "layers": blocks("transformer.resblocks", text_cfg.num_layers,
                         text_cfg.hidden_size),
        "ln_final": ln("ln_final"),
        "proj": {"kernel": sd["text_projection"]},
    }
    return vision, text
