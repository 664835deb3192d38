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


W4_GROUP = 128  # contraction-dim group size for int4 scales (MXU tile width)


def quantize_linear_params_w4(p: Dict, group_size: int = W4_GROUP) -> Dict:
    """{'kernel': (..., in, out) float, 'bias'?} -> int4 kernel + f32 scales.

    Weight-ONLY quantization for the bandwidth-bound decode/serving path:
    symmetric int4 (range [-7, 7]; -8 is unused to keep the quantizer
    symmetric) with GROUP-WISE scales — amax/7 over each `group_size` slab
    of the contraction dim, per output channel (scale shape (..., G, out)).
    Group-wise is the standard int4 quality floor (per-channel RTN int4
    loses ~2x more precision on real weight matrices); when the contraction
    dim isn't divisible by `group_size`, falls back to per-channel scales
    (scale shape (..., out)).

    XLA stores s4 packed two-per-byte in HBM on TPU, so every decode step
    reads HALF the weight bytes of the int8 path and a QUARTER of bf16.
    Activations stay in bf16 and the matmuls run on the bf16 MXU — decode
    is bandwidth-bound, not FLOP-bound, so the s8 MXU rate is irrelevant
    there (bench.py decode roofline).

    STORAGE IS int8, NOT int4: on the v5e backend a jit-produced S4 array
    is unusable at every program boundary — feeding it to the next jitted
    program requests a relayout, and device_put-with-Format of an S4 array
    re-enters jit dispatch ("Recursively calling jit" RecursionError);
    device-to-host of the tiled S4 buffer is UNIMPLEMENTED; even a no-op
    device_put with the array's own Format recurses (probed on-chip,
    2026-08-18 — see CLAUDE.md). So the tree at rest holds the int4 VALUES
    in int8, and consumers convert to real int4 INSIDE their traced
    program: `thaw_w4` once at decode entries (hoists the convert above
    the token loop, so every decode step still reads packed S4 from HBM),
    plus a use-site fallback in `linear_w4` for single-shot forwards.

    Like the int8 form, stacked scan kernels (n_layers, in, out) get
    independent per-layer scales and lax.scan slices kernel_q4/scale
    together.
    """
    w = jnp.asarray(p["kernel"], jnp.float32)
    k = w.shape[-2]
    if group_size and k % group_size == 0 and k > group_size:
        g = group_size
        lead = w.shape[:-2]
        wg = w.reshape(lead + (k // g, g, w.shape[-1]))
        scale = jnp.maximum(jnp.max(jnp.abs(wg), axis=-2), 1e-8) * (1.0 / 7.0)
        q = jnp.clip(jnp.round(wg / scale[..., None, :]), -7.0, 7.0)
        q = q.astype(jnp.int8).reshape(w.shape)
    else:
        scale = jnp.maximum(jnp.max(jnp.abs(w), axis=-2), 1e-8) * (1.0 / 7.0)
        q = jnp.clip(jnp.round(w / scale[..., None, :]), -7.0, 7.0).astype(jnp.int8)
    out = {"kernel_q4": q, "scale": scale}
    if "bias" in p:
        out["bias"] = p["bias"]
    return out


def thaw_w4(params: Dict) -> Dict:
    """Convert int8-stored w4 kernels to real int4 — INSIDE a traced program.

    Call this once at the top of a jitted decode entry (gptneo/gptj cached
    decoders): the int8->int4 convert then sits ABOVE the token loop, XLA
    materializes the packed S4 tensor once per program call, and every
    decode step reads 0.5 bytes/weight from HBM. The S4 tensor never
    crosses a program boundary (see quantize_linear_params_w4: jit-output
    S4 arrays are radioactive on this backend). No-op for unquantized /
    int8-W8A8 trees.
    """
    def walk(node):
        if not isinstance(node, dict):
            return node
        out = {}
        for name, child in node.items():
            if name == "kernel_q4" and getattr(child, "dtype", None) == jnp.int8:
                out[name] = child.astype(jnp.int4)
            else:
                out[name] = walk(child)
        return out

    return walk(params)


def linear_w4(p: Dict, x: jax.Array) -> jax.Array:
    """Weight-only int4 matmul: dot-then-scale.

    The int4 weight is CONVERTED (not dequantized with its scale) to the
    activation dtype and fed straight to the MXU — int4 values are exact in
    bf16, the convert is a fusable elementwise op on the dot's operand
    stream, and the scales fold into the f32 accumulator AFTER the dots.
    This keeps the only HBM weight traffic at 0.5 bytes per weight; a
    dequantize-then-dot formulation would tempt XLA into materializing a
    full bf16 copy.

    Grouped scales (scale (G, out) for kernel (K, out), G = K/group) split
    the contraction into G batched dots of width K/G (>= 128, a full MXU
    tile) whose partial sums are scale-weighted then reduced — numerically
    the exact grouped dequantization, with no dequantized weight tensor.
    """
    q = p["kernel_q4"]
    if q.dtype == jnp.int8:
        # int8-at-rest tree used without an entry thaw (single-shot eval
        # forwards): convert at the use site. Inside a decode loop this
        # would read int8/step — decode entries call thaw_w4 instead.
        q = q.astype(jnp.int4)
    scale = p["scale"]
    # XLA:CPU's DotThunk can't execute a convert-fed bf16 x bf16 -> f32 dot
    # (tests and dryruns run there); TPU is the real target and keeps bf16
    # MXU operands. Trace-time constant — no runtime branch.
    cdt = x.dtype
    if jax.default_backend() == "cpu" and x.dtype == jnp.bfloat16:
        cdt = jnp.float32
    xc = x.astype(cdt)
    if scale.ndim == q.ndim:  # grouped: (G, out) alongside (K, out)
        gcount = scale.shape[-2]
        k, out_dim = q.shape[-2], q.shape[-1]
        xg = xc.reshape(x.shape[:-1] + (gcount, k // gcount))
        qg = q.reshape((gcount, k // gcount, out_dim)).astype(cdt)
        # (..., G, g) x (G, g, out) -> (..., G, out), f32 accumulation
        t = jnp.einsum("...gk,gko->...go", xg, qg,
                       preferred_element_type=jnp.float32)
        y = jnp.einsum("...go,go->...o", t, scale)
    else:
        acc = jax.lax.dot_general(
            xc, q.astype(cdt),
            dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        y = acc * scale
    if "bias" in p:
        y = y + p["bias"]
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# Int8 KV cache (decode): at long contexts the per-step HBM traffic is
# KV-dominated (bytes/step = weights + 2*L*h per layer), so quantizing the
# cache halves that term the way w4 quarters the weight term. Per-vector
# scales (one f32 scalar per cached (batch, head, position) K or V vector,
# amax/127 over head_dim) keep the error ~0.4% RMS. Both attention
# contractions stay EXACT dequantizations with the scale folded outside the
# dot: QK^T multiplies per-key scales into the score row, probs@V folds
# per-key scales into the probabilities before the contraction.
# ---------------------------------------------------------------------------


def kv_quantize(kv: jax.Array):
    """(..., L, head_dim) float cache -> {"q": int8 same shape,
    "s": (..., L) f32 per-vector scales}. Zero vectors (padding) get the
    1e-8 floor and quantize to all-zeros."""
    s = jnp.maximum(jnp.max(jnp.abs(kv.astype(jnp.float32)), -1), 1e-8) * (
        1.0 / 127.0)
    q = jnp.clip(jnp.round(kv.astype(jnp.float32) / s[..., None]),
                 -127.0, 127.0).astype(jnp.int8)
    return {"q": q, "s": s}


def kv_write(cache: Dict, new: jax.Array, t) -> Dict:
    """Quantize one new (B, nh, head_dim) vector batch and write it at
    cache position t (the decode-step dynamic_update_slice)."""
    s = jnp.maximum(jnp.max(jnp.abs(new.astype(jnp.float32)), -1),
                    1e-8) * (1.0 / 127.0)
    q = jnp.clip(jnp.round(new.astype(jnp.float32) / s[..., None]),
                 -127.0, 127.0).astype(jnp.int8)
    return {
        "q": jax.lax.dynamic_update_slice(cache["q"], q[:, :, None, :],
                                          (0, 0, t, 0)),
        "s": jax.lax.dynamic_update_slice(cache["s"], s[:, :, None],
                                          (0, 0, t)),
    }


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


def _quantizable(name, child, t_child, min_features: int) -> bool:
    """Shared predicate: frozen linear dicts with a big-enough kernel."""
    return (
        isinstance(child, dict)
        and name not in QUANT_EXCLUDE_NAMES
        and "kernel" in child
        and hasattr(child["kernel"], "ndim")
        and child["kernel"].ndim >= 2
        and child["kernel"].shape[-2] >= min_features
        and not (isinstance(t_child, dict) and any(
            bool(v) for v in jax.tree.leaves(t_child)))
    )


def quantize_tree(params: Dict, trainable: Dict | None = None,
                  min_features: int = 64, mode: str = "w8a8") -> Dict:
    """Replace frozen linear kernels in a nested param dict with quantized
    forms: int8 W8A8 (mode="w8a8") or weight-only int4 (mode="w4").

    trainable: optional same-structure boolean tree (train.partition
    .trainable_mask); leaves marked trainable keep full precision. Kernels
    with a contraction dim < min_features are skipped — sub-tile matmuls
    (e.g. toy-scale tests, tiny adapters) gain nothing on the MXU and lose
    the most precision.
    """
    quant_one = {"w8a8": quantize_linear_params,
                 "w4": quantize_linear_params_w4}[mode]

    def walk(node, train_node):
        if not isinstance(node, dict):
            return node
        out = {}
        for name, child in node.items():
            t_child = None if train_node is None else train_node.get(name)
            if _quantizable(name, child, t_child, min_features):
                out[name] = quant_one(child)
            else:
                out[name] = walk(child, t_child)
        return out

    return walk(params, trainable)


def quantize_tree_lowmem(params: Dict, trainable: Dict | None = None,
                         min_features: int = 64, mode: str = "w8a8") -> Dict:
    """quantize_tree with a BOUNDED HBM peak, for trees near the chip limit.

    The one-jit quantize upcasts each kernel to f32 inside the program
    (quantize_linear_params); at GPT-J-6B that schedules multi-GB f32
    temps next to the 11.3 GB bf16 source tree and exceeds a 16 GB v5e —
    the serve_load generate6b_int8 leg OOM'd exactly there (the failure
    surfaced asynchronously at the NEXT dispatch, as a RESOURCE_EXHAUSTED
    during an unrelated constant transfer: diag_6b_probe.py shows this
    backend sticks in the error state). bench.py's 6B int8 legs never hit
    this because they build random int8 trees directly (bench.py:542).

    Strategy: one jitted call PER quantizable kernel, donating that kernel
    so its bf16 buffer dies as its int8 twin appears, and — for
    scan-stacked (L, in, out) kernels — lax.map over the layer axis inside
    the jit, so the f32 temps stay one layer big. Peak = live tree + one
    LAYER slice instead of live tree + the whole tree in f32. The math is
    identical per (layer, out_channel), so results are bit-identical to
    quantize_tree; the cost is ~10 small dispatches instead of one
    (startup-only; per-leaf eager dispatch is the thing CLAUDE.md warns
    about and this is NOT that — it's per-KERNEL, a handful of calls).

    Call this eagerly (NOT under jit): each inner jit must dispatch and
    free before the next starts.
    """
    quant_one = {"w8a8": quantize_linear_params,
                 "w4": quantize_linear_params_w4}[mode]
    jitted: Dict = {}  # (shape, dtype) -> compiled fn, shared across layers

    def q_dict(child):
        k = child["kernel"]

        def fn(kk):
            if kk.ndim == 3:
                return jax.lax.map(lambda w: quant_one({"kernel": w}), kk)
            return quant_one({"kernel": kk})

        sig = (tuple(k.shape), str(getattr(k, "dtype", "np")))
        if sig not in jitted:
            jitted[sig] = jax.jit(fn, donate_argnums=(0,))
        out = dict(jitted[sig](k))
        if "bias" in child:
            out["bias"] = child["bias"]
        return out

    def walk(node, train_node):
        if not isinstance(node, dict):
            return node
        out = {}
        for name, child in node.items():
            t_child = None if train_node is None else train_node.get(name)
            if _quantizable(name, child, t_child, min_features):
                out[name] = q_dict(child)
            else:
                out[name] = walk(child, t_child)
        return out

    return walk(params, trainable)


def is_quantized(params: Dict) -> bool:
    def has_q(node):
        if isinstance(node, dict):
            return ("kernel_q" in node or "kernel_q4" in node
                    or any(has_q(v) for v in node.values()))
        return False

    return has_q(params)
