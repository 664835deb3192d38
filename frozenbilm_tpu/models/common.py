"""Parameter-tree building blocks shared by all model families.

Models in this framework are pure functions over plain dict pytrees:
  init_*(rng, cfg) -> params      (nested dict of jnp arrays)
  *_forward(params, cfg, batch)   (jit-compatible, no mutation)

Linear kernels are stored as (in_dim, out_dim) so application is `x @ W`;
the HF/torch importer transposes torch's (out, in) layout once at load time.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Initializers
# ---------------------------------------------------------------------------


def linear_init(key, in_dim: int, out_dim: int, std: float = 0.02, bias: bool = True):
    kkey, _ = jax.random.split(key)
    p = {"kernel": jax.random.normal(kkey, (in_dim, out_dim)) * std}
    if bias:
        p["bias"] = jnp.zeros((out_dim,))
    return p


def embedding_init(key, num: int, dim: int, std: float = 0.02, pad_idx: Optional[int] = None):
    w = jax.random.normal(key, (num, dim)) * std
    if pad_idx is not None:
        w = w.at[pad_idx].set(0.0)
    return w


def layer_norm_init(dim: int):
    return {"weight": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}


# ---------------------------------------------------------------------------
# Apply functions
# ---------------------------------------------------------------------------


def linear(p, x: jax.Array) -> jax.Array:
    if "kernel_q" in p:  # W8A8-quantized frozen layer (ops/quant.py)
        from frozenbilm_tpu.ops.quant import linear_w8a8

        return linear_w8a8(p, x)
    if "kernel_q4" in p:  # weight-only int4 frozen layer (ops/quant.py)
        from frozenbilm_tpu.ops.quant import linear_w4

        return linear_w4(p, x)
    y = jnp.dot(x, p["kernel"], preferred_element_type=jnp.float32)
    if "bias" in p:
        y = y + p["bias"]
    return y.astype(x.dtype)


def layer_norm(p, x: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    normed = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (normed * p["weight"] + p["bias"]).astype(x.dtype)


def gelu(x: jax.Array) -> jax.Array:
    """Exact (erf) GELU — torch.nn.functional.gelu default / HF ACT2FN['gelu']."""
    return jax.nn.gelu(x, approximate=False)


def gelu_new(x: jax.Array) -> jax.Array:
    """Tanh-approximated GELU — HF ACT2FN['gelu_new'], used by GPT-Neo/GPT-J."""
    xf = x.astype(jnp.float32)
    y = 0.5 * xf * (
        1.0 + jnp.tanh(math.sqrt(2.0 / math.pi) * (xf + 0.044715 * jnp.power(xf, 3.0)))
    )
    return y.astype(x.dtype)


ACT2FN = {
    "gelu": gelu,
    "gelu_new": gelu_new,
    "relu": jax.nn.relu,
    "tanh": jnp.tanh,
}


def dropout(rng, x: jax.Array, rate: float, deterministic: bool) -> jax.Array:
    if deterministic or rate == 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


class RngStream:
    """Splits one key into a deterministic stream of subkeys at trace time."""

    def __init__(self, key):
        self._key = key

    def next(self):
        if self._key is None:
            return None
        self._key, sub = jax.random.split(self._key)
        return sub


def split_heads(x: jax.Array, num_heads: int) -> jax.Array:
    """(B, L, H*d) -> (B, H, L, d), matching torch's view+permute head layout."""
    b, l, hd = x.shape
    return x.reshape(b, l, num_heads, hd // num_heads).transpose(0, 2, 1, 3)


def merge_heads(x: jax.Array) -> jax.Array:
    """(B, H, L, d) -> (B, L, H*d)."""
    b, h, l, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, h * d)
