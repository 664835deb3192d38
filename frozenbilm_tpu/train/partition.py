"""Frozen/trainable parameter partition.

The reference freezes parameters by mutating requires_grad
(deberta.py:1152-1158 for the backbone, :1334-1339 for the MLM head,
:1348-1350 for the answer module; bert.py:547-553, 750-752, 758-762).
TPU-first equivalent: split the parameter pytree into two trees by path
predicate — the optimizer state exists only for the trainable tree, and the
frozen tree is a donated constant input to the jitted step.

Trainable when freeze_lm (the FrozenBiLM regime):
  - embeddings.linear_video.*          (visual projection)
  - *.adapter.*                        (bottleneck adapters)
  - any *LayerNorm* leaf, iff ft_ln    (includes lm_head LayerNorm)
  - answers.*, iff not freeze_last
Whole groups unfreeze with ft_lm / ft_mlm (freeze_lm/freeze_mlm False).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax

from frozenbilm_tpu.config import VideoTextConfig


def _path_names(path) -> Tuple[str, ...]:
    names = []
    for k in path:
        if hasattr(k, "key"):
            names.append(str(k.key))
        elif hasattr(k, "idx"):
            names.append(str(k.idx))
        else:
            names.append(str(k))
    return tuple(names)


def _is_layer_norm(names: Tuple[str, ...]) -> bool:
    # DeBERTa/BERT use 'LayerNorm'; GPT-Neo/J use 'ln_1'/'ln_2'/'ln_f'
    # (reference unfreezes params with 'ln' in the name, gptj.py:406-412)
    return any(n == "LayerNorm" or n in ("ln_1", "ln_2", "ln_f") for n in names)


def _is_trainable(names: Tuple[str, ...], vt: VideoTextConfig) -> bool:
    joined = "/".join(names)
    if names and names[0] == "answers":
        return not vt.freeze_last
    if "linear_video" in names:
        return True
    if "adapter" in joined:
        return True
    in_mlm_head = names and names[0] == "lm_head"
    if in_mlm_head:
        if not vt.freeze_mlm:
            return True
        return vt.ft_ln and _is_layer_norm(names)
    if not vt.freeze_lm:
        return True
    return vt.ft_ln and _is_layer_norm(names)


def trainable_mask(params: Dict, vt: VideoTextConfig) -> Dict:
    """Boolean pytree: True where the leaf is trainable."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: _is_trainable(_path_names(path), vt), params
    )


def partition_params(params: Dict, vt: VideoTextConfig):
    """Split params into (trainable, frozen) trees with disjoint leaves.

    Both trees keep the full nested structure; non-member leaves are None
    (pruned from tree operations by treedef-aware maps below).
    """
    mask = trainable_mask(params, vt)
    trainable = jax.tree.map(lambda p, m: p if m else None, params, mask)
    frozen = jax.tree.map(lambda p, m: None if m else p, params, mask)
    return trainable, frozen


def merge_params(trainable: Dict, frozen: Dict) -> Dict:
    """Inverse of partition_params (leaf-wise: exactly one side is non-None)."""
    return jax.tree.map(
        lambda t, f: t if t is not None else f,
        trainable,
        frozen,
        is_leaf=lambda x: x is None,
    )


def count_params(tree) -> int:
    return sum(x.size for x in jax.tree.leaves(tree) if x is not None)


def apply_param_dtype(params: Dict, vt: VideoTextConfig, dtype_name: str) -> Dict:
    """Cast FROZEN float leaves to the deployment dtype (--param_dtype).

    Trainable leaves stay float32 (optimizer precision); bfloat16 frozen
    weights halve HBM for the 0.9B backbone and feed the MXU natively.
    """
    import jax.numpy as jnp

    if dtype_name in ("", "float32"):
        return params
    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.dtype(dtype_name)
    mask = trainable_mask(params, vt)

    def cast(p, m):
        if not m and hasattr(p, "dtype") and p.dtype == jnp.float32:
            return p.astype(dtype)
        return p

    return jax.tree.map(cast, params, mask)


def apply_quantization(params: Dict, vt: VideoTextConfig, mode: str,
                       calibrates: bool = False,
                       donate: bool = False) -> Dict:
    """--quantize hook: int8-quantize the frozen linear kernels (eval only).

    Runs the whole tree transform in ONE jit call — per-leaf dispatch over
    the remote-TPU tunnel is minutes-slow for the 0.9B tree (CLAUDE.md).

    w8a8_static quantizes identically; the caller must then run activation
    calibration (ops/quant.calibration + apply_act_scales) over real
    batches — drivers without a calibration hook pass calibrates=False and
    get an explicit error instead of silently running dynamic quant.
    """
    if mode in ("", "none"):
        return params
    if mode == "w8a8_static" and not calibrates:
        raise ValueError(
            "--quantize w8a8_static needs an activation-calibration pass; "
            "this driver has none — use the videoqa driver (calibrates on "
            "the first val batches) or --quantize w8a8 (dynamic scales)")
    if mode not in ("w8a8", "w8a8_static", "w4"):
        raise ValueError(f"unknown --quantize mode {mode!r}")
    import jax

    from frozenbilm_tpu.ops.quant import quantize_tree, quantize_tree_lowmem

    quant_mode = "w4" if mode == "w4" else "w8a8"
    mask = trainable_mask(params, vt)
    if donate:
        # donation lets the bf16 source die as its int8 twin is built
        # (a caller that drops its reference, e.g. serving): without it
        # the bf16 + int8 trees coexist — 12 + 6 GB for GPT-J-6B, an OOM.
        # Near the chip limit even the ONE-JIT quantize OOMs: its f32
        # upcast temps schedule next to the whole source tree (measured:
        # serve_load r4/r5 generate6b_int8 legs died there, asynchronously
        # — see ops/quant.quantize_tree_lowmem). Per-kernel donated jits
        # with lax.map over stacked layers bound the peak; bit-identical.
        total = sum(
            getattr(l, "nbytes", 0) for l in jax.tree.leaves(params))
        if total > 4e9:
            return quantize_tree_lowmem(params, mask, mode=quant_mode)
        return jax.jit(lambda p: quantize_tree(p, mask, mode=quant_mode),
                       donate_argnums=(0,))(params)
    return jax.jit(lambda p: quantize_tree(p, mask, mode=quant_mode))(params)


def reject_quantized_for_training(params: Dict, eval_mode: bool) -> None:
    """Pre-quantized checkpoints (scripts/convert.py --quantize) are
    eval-only: int8 round/clip has a zero VJP, so training through them
    would silently produce zero gradients for every upstream adapter."""
    if eval_mode:
        return
    from frozenbilm_tpu.ops.quant import is_quantized

    if is_quantized(params):
        raise ValueError(
            "loaded checkpoint contains W8A8 int8 kernels (eval-only); "
            "re-export without --quantize to train")
