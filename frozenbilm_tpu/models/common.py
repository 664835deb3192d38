"""Parameter-tree building blocks shared by all model families.

Models in this framework are pure functions over plain dict pytrees:
  init_*(rng, cfg) -> params      (nested dict of jnp arrays)
  *_forward(params, cfg, batch)   (jit-compatible, no mutation)

Linear kernels are stored as (in_dim, out_dim) so application is `x @ W`;
the HF/torch importer transposes torch's (out, in) layout once at load time.
"""

from __future__ import annotations

import functools
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _layer_norm_core(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    normed = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (normed * w + b).astype(x.dtype)


def _layer_norm_fwd(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    normed = (xf - mean) * rstd
    # Residuals: the (possibly bf16) input + the tiny per-row stats. The
    # default autodiff instead stashed several FULL-SIZE f32 intermediates
    # per LayerNorm site — 9x f32[24, B, L, H] stacks (3.1 GB) in the 0.9B
    # train step's fwd scan (scripts/train_residuals.py, round 5). xhat is
    # recomputed from them in the backward: one VPU pass vs gigabytes of
    # HBM residual traffic.
    return (normed * w + b).astype(x.dtype), (x, w, mean, rstd)


def _layer_norm_bwd(eps, res, g):
    x, w, mean, rstd = res
    xf = x.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    xhat = (xf - mean) * rstd
    gw = gf * w.astype(jnp.float32)
    m1 = jnp.mean(gw, axis=-1, keepdims=True)
    m2 = jnp.mean(gw * xhat, axis=-1, keepdims=True)
    dx = (rstd * (gw - m1 - xhat * m2)).astype(x.dtype)
    lead = tuple(range(x.ndim - 1))
    dw = jnp.sum(gf * xhat, axis=lead).astype(w.dtype)
    db = jnp.sum(gf, axis=lead).astype(w.dtype)
    return dx, dw, db


_layer_norm_core.defvjp(_layer_norm_fwd, _layer_norm_bwd)


def layer_norm(p, x: jax.Array, eps: float) -> jax.Array:
    return _layer_norm_core(x, p["weight"], p["bias"], eps)


def gelu(x: jax.Array) -> jax.Array:
    """Exact (erf) GELU — torch.nn.functional.gelu default / HF ACT2FN['gelu'].

    Deliberately NOT a custom VJP: a save-only-x VJP was tried (round 5) —
    it cut two bf16[24, B, L, 4H] residual stacks (~1.4 GB) from the 0.9B
    train step but measured SLOWER on-chip (6.80 -> 6.55 steps/s,
    train_policy_ab_r5.json phase 4): the erf/exp recompute is VPU
    transcendental work and the step is VPU-bound, not HBM-bound. Same
    lesson as the remat="names" policy at B=32."""
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
