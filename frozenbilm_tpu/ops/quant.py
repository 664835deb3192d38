"""Post-training W8A8 int8 quantization for frozen linear layers (eval only).

The v5e MXU runs s8 x s8 -> s32 matmuls at twice the bf16 peak (394 vs 197
TOPS). The flagship workload — zero-shot eval of a frozen 0.9B backbone
(reference videoqa.py --eval, whose weights never change at inference) — is
pure frozen-weight inference, so post-training quantization is the natural
step past --param_dtype bfloat16:

  - weights: symmetric per-output-channel int8, scale = amax/127 over the
    contraction dim, computed ONCE at load time (`quantize_tree`);
  - activations: symmetric per-row (per token vector) dynamic int8 computed
    inside the jitted forward — one abs-max reduction + rescale that XLA
    fuses into the surrounding elementwise ops;
  - int32 accumulation on the MXU, f32 rescale by (act_scale x col_scale),
    bias added in f32 (`linear_w8a8`, dispatched from models.common.linear).

Scope: the quantized matmuls are the frozen backbone projections (QKV/out,
FFN in/out, rel-pos projections, heads reached through
models.common.linear). Activation-x-activation products (QK^T, probs@V) and
trainable leaves (adapters, linear_video, LayerNorms, answer module) stay
in bf16/f32. Training is NOT supported: round/clip has a zero VJP, so the
drivers only accept --quantize w8a8 together with --eval.

The reference has no quantized path (fp16 storage only, extract.py:92-93);
this is a TPU-native extension. Accuracy impact must be validated against
real checkpoints before production use (see ACCURACY.md for why released
weights are unreachable in this environment); tests pin logit fidelity vs
the f32 path at toy and near-full scale.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

# Param dicts whose "kernel" is consumed directly (conv layouts / explicit
# jnp.dot call sites), not through models.common.linear: never quantized.
QUANT_EXCLUDE_NAMES = frozenset({"patch_embed", "proj", "conv"})


def quantize_linear_params(p: Dict) -> Dict:
    """{'kernel': (..., in, out) float, 'bias'?} -> int8 kernel + f32 scales.

    Works on single kernels (in, out) and scan-stacked kernels
    (n_layers, in, out): the per-output-channel amax is taken over the
    contraction dim (axis -2) only, so stacked layers get independent
    per-layer scales, and lax.scan slices kernel_q/scale together.
    """
    w = jnp.asarray(p["kernel"], jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(w), axis=-2), 1e-8) * (1.0 / 127.0)
    q = jnp.clip(jnp.round(w / scale[..., None, :]), -127.0, 127.0).astype(jnp.int8)
    out = {"kernel_q": q, "scale": scale}
    if "bias" in p:
        out["bias"] = p["bias"]
    return out


def linear_w8a8(p: Dict, x: jax.Array) -> jax.Array:
    """Dynamic per-row activation quant + int8 MXU matmul + f32 rescale."""
    xf = x.astype(jnp.float32)
    xs = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-8) * (1.0 / 127.0)
    xq = jnp.clip(jnp.round(xf / xs), -127.0, 127.0).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, p["kernel_q"],
        dimension_numbers=(((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * xs * p["scale"]
    if "bias" in p:
        y = y + p["bias"]
    return y.astype(x.dtype)


def quantize_tree(params: Dict, trainable: Dict | None = None,
                  min_features: int = 64) -> Dict:
    """Replace frozen linear kernels in a nested param dict with int8 forms.

    trainable: optional same-structure boolean tree (train.partition
    .trainable_mask); leaves marked trainable keep full precision. Kernels
    with a contraction dim < min_features are skipped — sub-tile matmuls
    (e.g. toy-scale tests, tiny adapters) gain nothing on the MXU and lose
    the most precision.
    """

    def walk(node, train_node):
        if not isinstance(node, dict):
            return node
        out = {}
        for name, child in node.items():
            t_child = None if train_node is None else train_node.get(name)
            if (
                isinstance(child, dict)
                and name not in QUANT_EXCLUDE_NAMES
                and "kernel" in child
                and hasattr(child["kernel"], "ndim")
                and child["kernel"].ndim >= 2
                and child["kernel"].shape[-2] >= min_features
                and not (isinstance(t_child, dict) and any(
                    bool(v) for v in jax.tree.leaves(t_child)))
            ):
                out[name] = quantize_linear_params(child)
            else:
                out[name] = walk(child, t_child)
        return out

    return walk(params, trainable)


def is_quantized(params: Dict) -> bool:
    def has_q(node):
        if isinstance(node, dict):
            return "kernel_q" in node or any(has_q(v) for v in node.values())
        return False

    return has_q(params)
