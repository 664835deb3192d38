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

import threading
from contextlib import contextmanager
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
    """Int8 MXU matmul + f32 rescale.

    Activation quant is dynamic per-row (amax pass + per-row rescale) unless
    the dict carries a calibrated scalar "act_scale" (see calibration/
    apply_act_scales), in which case the amax pass disappears and the rescale
    folds into one per-column vector — the on-chip A/B for the two lives in
    docs/measurements/int8_micro_r3.json (w8a8_dyn vs w8a8_static rows).
    """
    xf = x.astype(jnp.float32)
    if getattr(_CAL, "stats", None) is not None and not isinstance(x, jax.core.Tracer):
        _record_act_amax(p, xf)
    if "act_scale" in p:
        xs = p["act_scale"]  # () scalar (scan slices stacked (n_layers,))
        xq = jnp.clip(jnp.round(xf / xs), -127.0, 127.0).astype(jnp.int8)
        out_scale = xs * p["scale"]
    else:
        xs = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-8) * (1.0 / 127.0)
        xq = jnp.clip(jnp.round(xf / xs), -127.0, 127.0).astype(jnp.int8)
        out_scale = xs * p["scale"]
    acc = jax.lax.dot_general(
        xq, p["kernel_q"],
        dimension_numbers=(((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * out_scale
    if "bias" in p:
        y = y + p["bias"]
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# Static activation scales (w8a8_static): one calibrated scalar per call
# site instead of the per-row dynamic amax. Calibration runs a few batches
# EAGERLY (jax.disable_jit) through the already-quantized forward; each
# linear_w8a8 call records the activation abs-max keyed by a content
# fingerprint of its int8 kernel — stable across lax.scan slicing, batch
# order, and tree walks, unlike python object ids. apply_act_scales then
# walks the param tree, re-derives the same fingerprints (slicing stacked
# kernels per layer), and writes "act_scale" leaves: () for single kernels,
# (n_layers,) for scan stacks so scan slices them alongside kernel_q.
# ---------------------------------------------------------------------------

_CAL = threading.local()
_CAL.stats = None


def _fingerprint(kq) -> bytes:
    """Content key for one (in, out) int8 kernel: exact leading bytes+shape."""
    import numpy as np

    head = np.asarray(kq[: min(4, kq.shape[0]), : min(32, kq.shape[1])])
    return head.tobytes() + repr(kq.shape).encode()


def _record_act_amax(p: Dict, xf: jax.Array) -> None:
    key = _fingerprint(p["kernel_q"])
    amax = float(jnp.max(jnp.abs(xf)))
    prev = _CAL.stats.get(key, 0.0)
    _CAL.stats[key] = max(prev, amax)


@contextmanager
def calibration(stats: Dict[bytes, float]):
    """Collect per-site activation abs-max into `stats`. Forward passes must
    run eagerly (wrap in jax.disable_jit()); traced calls are ignored."""
    _CAL.stats = stats
    try:
        yield stats
    finally:
        _CAL.stats = None


def apply_act_scales(params: Dict, stats: Dict[bytes, float]) -> Dict:
    """Write calibrated "act_scale" leaves next to each kernel_q covered by
    `stats`; sites never seen during calibration stay dynamic."""

    def site_scale(kq):
        if kq.ndim == 2:
            amax = stats.get(_fingerprint(kq))
            if amax is None:
                return None
            return jnp.asarray(max(amax, 1e-6) / 127.0, jnp.float32)
        # scan stack (n_layers, in, out): per-layer scalar
        per_layer = [stats.get(_fingerprint(kq[i])) for i in range(kq.shape[0])]
        if any(a is None for a in per_layer):
            return None
        return jnp.asarray([max(a, 1e-6) / 127.0 for a in per_layer],
                           jnp.float32)

    def walk(node):
        if not isinstance(node, dict):
            return node
        if "kernel_q" in node:
            s = site_scale(node["kernel_q"])
            if s is None:
                return node
            return {**node, "act_scale": s}
        return {k: walk(v) for k, v in node.items()}

    return walk(params)


def calibrate_act_scales(forward, params: Dict, batches) -> Dict:
    """Run `forward(params, batch)` eagerly over `batches`, collect per-site
    activation abs-max, and return params with static act scales applied."""
    stats: Dict[bytes, float] = {}
    with calibration(stats), jax.disable_jit():
        for batch in batches:
            forward(params, batch)
    return apply_act_scales(params, stats)


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
